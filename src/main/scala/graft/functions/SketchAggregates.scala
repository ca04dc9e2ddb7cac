package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** `bottom_k(h, k)`: the k smallest DISTINCT int64 values per group,
  * ascending — a KMV (k-minimum-values) distinct-count sketch
  * (Bar-Yossef et al. 2002) as a custom Catalyst
  * TypedImperativeAggregate.
  *
  * Unlike the HLL sketch behind approx_count_distinct, KMV over a
  * portable hash is fully DETERMINISTIC: the sketch is a pure function
  * of the input set, so a SQL oracle can replay both the sketch and
  * the estimate bit-for-bit — an approximate-distinct path that still
  * hash-matches cross-engine.
  *
  * Scale design: aggregation state is a bounded TreeSet (≤ k longs ≈
  * k·8 bytes); partial aggregation runs map-side, so the shuffle
  * carries at most k longs per (partition, group) instead of the raw
  * values — the same one-shuffle shape as any sum/count rollup.
  */
case class BottomK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k needs a BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(buf: java.util.TreeSet[java.lang.Long]): Unit =
    while (buf.size > k) buf.pollLast()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // only insert values that could make the bottom k (avoids
      // churning the tree on the long tail)
      if (buf.size < k || l < buf.last()) {
        buf.add(l)
        trim(buf)
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    trim(b1)
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BottomK =
    copy(child = c)
}

/** `cms_sketch(positions, d, w)`: a Count-Min sketch (Cormode &
  * Muthukrishnan 2005) as a custom TypedImperativeAggregate. The child
  * is the row's precomputed array of d cell indices (one per sketch
  * row, from a portable hash family), so the aggregate itself is pure
  * counting: state is a flat d·w Long matrix, update increments one
  * cell per row, merge is element-wise add.
  *
  * Over a deterministic hash family the whole sketch is a pure
  * function of the input multiset — counter[r][c] is just the count of
  * rows hashing to that cell — so a SQL oracle replays every counter
  * AND every point estimate (min over rows of the probed cells)
  * exactly, unlike an engine-internal frequency sketch.
  *
  * Scale design: state is d·w·8 bytes (8 KB at 4×256) regardless of
  * input size; partial aggregation runs map-side, so the shuffle
  * carries one small matrix per partition — frequency estimation over
  * 100 TB in one pass with bounded memory.
  */
case class CmsSketch(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch needs ARRAY<BIGINT> cell indices, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == depth,
        s"expected $depth cell indices, got ${arr.numElements()}")
      var r = 0
      while (r < depth) {
        buf(r * width + arr.getLong(r).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (bb.hasRemaining) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): CmsSketch =
    copy(child = c)
}

/** `hll_registers(h)`: HyperLogLog register vector (b = 8 → m = 256)
  * over a 48-bit non-negative hash column — the NATIVE mergeable form
  * of the X211 groupBy-register sketch (Flajolet et al. 2007), as a
  * TypedImperativeAggregate so ONE operator serves batch rollups,
  * partial/merge map-side combine, AND streaming complete-mode
  * aggregation (the X141 KMV discipline: merge ≡ element-wise max,
  * which is exactly this aggregate's merge).
  *
  * Register math matches WarehouseQueries.hllDistinct bit for bit:
  * idx = top 8 hash bits, ρ = 41 − bitlength(low 40 bits) (41 when
  * zero) — so the register vector this aggregate produces is
  * IDENTICAL to the groupBy-MAX formulation's and one oracle serves
  * both. State is a fixed 256-byte array per group. */
case class HllRegisters(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers needs a BIGINT 48-bit hash, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](256)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> 40).toInt & 0xff
      val rem = h & ((1L << 40) - 1)
      val rho =
        if (rem == 0L) 41
        else 41 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 256) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): HllRegisters =
    copy(child = c)
}

/** `bottom_k_pairs(struct(h, v), k)`: the (h, v) pairs with the k
  * smallest DISTINCT int64 hashes per group, ascending by h — the
  * VALUE-CARRYING form of [[BottomK]]: where KMV keeps only the hash
  * frontier (enough for distinct counts), this keeps each sampled
  * key's payload, turning the bottom-k frontier into a uniform
  * without-replacement SAMPLE of the distinct-key population
  * (bottom-k sampling, Cohen & Kaplan 2007) from which order
  * statistics — quantiles — can be read off directly.
  *
  * Determinism contract: the sketch is a pure function of the input
  * SET. Rows sharing a hash (the same key seen twice, possibly with
  * different payloads across retries) collapse to the MINIMUM v, so
  * update/merge order cannot leak into the result and a SQL oracle
  * replays the sample exactly (GROUP BY h, MIN(v), rank by h ≤ k).
  *
  * Scale design: state is a bounded TreeMap (≤ k (long, double)
  * entries ≈ 16k bytes); partial aggregation runs map-side, and merge
  * is the same keep-min/trim fold — one mergeable operator serves
  * batch rollups AND streaming complete-mode aggregation. */
case class BottomKPairs(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  private val pairType = StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == LongType && b.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bottom_k_pairs needs STRUCT<BIGINT, DOUBLE>, got ${t.sql}")
  }
  override def dataType: DataType =
    ArrayType(pairType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_pairs"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def trim(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Unit =
    while (buf.size > k) buf.pollLastEntry()

  private def offer(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      h: Long, v: Double): Unit = {
    if (buf.size < k || h <= buf.lastKey()) {
      val prev = buf.get(h)
      if (prev == null || v < prev) buf.put(h, v)
      trim(buf)
    }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val s = child.eval(input)
    if (s != null) {
      val row = s.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        offer(buf, row.getLong(0), row.getDouble(1))
    }
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
      b2: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(b1, e.getKey, e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.doubleValue())
      i += 1
    }
    new GenericArrayData(out) // TreeMap iterates ascending by h
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 16)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.put(bb.getLong, bb.getDouble)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BottomKPairs =
    copy(child = c)
}

object SketchFunctions {

  /** HLL register vector (length 256, ints) of a 48-bit hash column. */
  def hllRegisters(e: Column): Column =
    ColumnBridge.column(
      HllRegisters(ColumnBridge.expression(e)).toAggregateExpression())

  /** Bottom-k distinct values of a long column, ascending. */
  def bottomK(e: Column, k: Int): Column =
    ColumnBridge.column(
      BottomK(ColumnBridge.expression(e), k).toAggregateExpression())

  /** Bottom-k-by-hash (h, v) sample pairs of a struct<h:long, v:double>
    * column, ascending by h; hash collisions keep the minimum v. */
  def bottomKPairs(e: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKPairs(ColumnBridge.expression(e), k).toAggregateExpression())

  /** Count-Min sketch from per-row cell indices (length-`depth`
    * array<long>, each in [0, width)); returns the flat d·w counter
    * matrix, row-major. */
  def cmsSketch(cells: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsSketch(ColumnBridge.expression(cells), depth, width)
        .toAggregateExpression())

  /** KMV estimate from a bottom-k sketch over a `hashBits`-bit
    * non-negative hash: exact size while the sketch is unsaturated,
    * else (k−1)/u_k with u_k = h_k / 2^hashBits — every step one IEEE
    * operation, so the estimate replays exactly in SQL. */
  def kmvEstimate(sketch: Column, k: Int, hashBits: Int = 60): Column = {
    val unit = element_at(sketch, k).cast("double") /
      lit(math.pow(2.0, hashBits))
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / unit)
  }
}
