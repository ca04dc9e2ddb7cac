package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass winnowing selection (Schleimer et al. 2003) over a
  * positional key array: for every `w`-window of consecutive keys,
  * select the window MINIMUM with ties broken RIGHTMOST, and emit the
  * distinct (h, p) selections in window order.
  *
  * This is the O(n) monotonic-deque formulation of the selection the
  * HOF form (`transform(starts, s -> aggregate(slice(...)))`) computes
  * in O(n·w) with per-window array copies — the winnowing analogue of
  * the repo's other fused kernels (SpanDedupStats, StripHtml): same
  * output bit-for-bit (WinnowSpec's brute-force reference pins it),
  * ~order-of-magnitude less work per row at w = 8.
  *
  * Deque invariant: indices in increasing order, values strictly
  * increasing front→back; a new key pops every back ≥ itself (`>=`,
  * not `>` — a later equal key replaces the earlier, which IS the
  * rightmost-tie rule), so the front of a completed window is its
  * rightmost minimum. Selected positions are non-decreasing across
  * windows, so "distinct selections" = collapse consecutive repeats.
  *
  * Input: array<long> (positional k-gram keys, duplicates kept).
  * Output: array<struct<h: long, p: long>> — p is the 1-based key
  * position. Fewer keys than `w` yield the single whole-array window;
  * an empty input yields an empty array.
  */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "window must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType), StructField("p", LongType))),
    containsNull = false)
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowSelect.compute($c, $w);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowSelect {
  def compute(keys: ArrayData, w: Int): GenericArrayData = {
    val n = keys.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val wEff = math.min(w, n)
    // deque of indices; values strictly increasing front -> back
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      2 * n / (w + 1) + 2)
    var lastSel = -1
    var j = 0
    while (j < n) {
      val hj = keys.getLong(j)
      while (tail > head && keys.getLong(dq(tail - 1)) >= hj) tail -= 1
      dq(tail) = j
      tail += 1
      if (j >= wEff - 1) {
        val lo = j - wEff + 1
        while (dq(head) < lo) head += 1
        val sel = dq(head)
        if (sel != lastSel) {
          val row = new GenericInternalRow(2)
          row.update(0, keys.getLong(sel))
          row.update(1, (sel + 1).toLong)
          out += row
          lastSel = sel
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object WinnowFunctions {
  /** Column form of [[WinnowSelect]]. */
  def winnowSelect(keys: Column, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(keys), w))
}
