package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `top_k_rows(struct(ord, id), k)`: the k best (ord DESC, id ASC)
  * pairs per group, in rank order — per-key top-k as a bounded-state
  * aggregate instead of a window.
  *
  * The window formulation (`row_number() OVER (PARTITION BY key ORDER
  * BY ord DESC) <= k`) shuffles EVERY row to its key's partition and
  * sorts there; at 100 TB the shuffle is the whole job. This aggregate
  * keeps a ≤ k-pair heap per (partition, key) map-side, so the shuffle
  * carries at most k pairs per partition per key — the same partial-
  * aggregation shape as a sum, with the window's output. The (id ASC)
  * tiebreak makes the result deterministic and oracle-replayable.
  */
case class TopKRows(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  private val inputType = StructType(Seq(
    StructField("ord", DoubleType), StructField("id", LongType)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case s: StructType if s.length == 2 &&
        s(0).dataType == DoubleType && s(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k_rows needs struct<ord:double,id:bigint>, got ${other.sql}")
    }
  override def dataType: DataType =
    ArrayType(inputType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_rows"

  // "best first": higher ord, then lower id
  private implicit val ord: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def trim(buf: java.util.TreeSet[(Double, Long)]): Unit =
    while (buf.size > k) buf.pollLast()

  override def update(buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val cand = (row.getDouble(0), row.getLong(1))
        if (buf.size < k || ord.lt(cand, buf.last())) {
          buf.add(cand)
          trim(buf)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[(Double, Long)],
      b2: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    b1.addAll(b2)
    trim(b1)
    b1
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator() // best-first
    var i = 0
    while (it.hasNext) {
      val (o, id) = it.next()
      out(i) = new GenericInternalRow(Array[Any](o, id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 16)
    val it = buf.iterator()
    while (it.hasNext) {
      val (o, id) = it.next()
      bb.putDouble(o); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add((bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): TopKRows =
    copy(child = c)
}

object TopKFunctions {
  /** Aggregate column: top `k` (ord DESC, id ASC) pairs per group as
    * array<struct<ord,id>> in rank order. */
  def topKRows(ordCol: Column, idCol: Column, k: Int): Column =
    ColumnBridge.column(
      TopKRows(ColumnBridge.expression(struct(ordCol.as("ord"),
        idCol.as("id"))), k).toAggregateExpression())
}
