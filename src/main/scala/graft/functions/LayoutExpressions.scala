package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving of two non-negative longs: bit i
  * of `left` lands at z-bit 2i, bit i of `right` at 2i+1, for the low
  * `bits` bits of each (z fits in 2·bits ≤ 62 bits, always
  * non-negative). Sorting or range-partitioning on the z-value
  * co-locates rows that are close in BOTH dimensions, so per-file
  * min/max stats bound both columns and scans on either predicate can
  * skip files — the standard multi-dimensional clustering recipe
  * (Morton 1966; the technique behind OPTIMIZE ZORDER BY in public
  * lakehouse engines).
  *
  * Pure bit arithmetic — deterministic and exactly replayable as a
  * sum of shift/mask terms in any SQL dialect, so layouts built on it
  * are oracle-checkable. */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.valueOf(ZValue.compute(l.asInstanceOf[Long],
      r.asInstanceOf[Long], bits))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZValue.compute($a, $b, $bits);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object ZValue {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

object LayoutFunctions {
  def zValue(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(ZValue(ColumnBridge.expression(a),
      ColumnBridge.expression(b), bits))
}
