package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Jaro 1989; Winkler 1990) as a native
  * codegen expression — the record-linkage string measure next to
  * levenshtein (X91): transposition-tolerant, prefix-boosted, length-
  * normalized to [0, 1], the standard for short dirty name/title
  * strings where edit distance over-penalizes swaps.
  *
  * Semantics pinned BIT-FOR-BIT to the classic definition as DuckDB
  * implements it (validated against `jaro_winkler_similarity` on 3000
  * random pairs — zero double mismatches):
  *  - match window = max(⌊max(|a|,|b|)/2⌋ − 1, 0); greedy left-to-
  *    right matching, each b-position consumed once;
  *  - transpositions t = ⌊(#matched positions whose chars disagree in
  *    match order)/2⌋ (integer floor);
  *  - jaro = (m/|a| + m/|b| + (m−t)/m)/3, 0 when m = 0 or either
  *    side is empty — evaluated in exactly that operand order (IEEE
  *    doubles are deterministic given the order, so both engines
  *    produce identical bits);
  *  - Winkler boost ONLY when jaro > 0.7 (the classic boost
  *    threshold): jw = jaro + ℓ·0.1·(1−jaro), ℓ = common prefix
  *    capped at 4.
  *
  * Comparison unit: UTF-16 code units here vs DuckDB's byte walk —
  * identical verdicts on ASCII (the fixture domain); non-ASCII units
  * are engine-defined and recorded, not hidden. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($l, $r);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object JaroWinkler {
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val from = math.max(0, i - w)
      val to = math.min(lb, i + w + 1)
      var j = from
      var matched = false
      while (j < to && !matched) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          bM(j) = true; aM(i) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2 // integer floor, as pinned
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - half) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val lim = math.min(4, math.min(la, lb))
      while (l < lim && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

object StringSim {
  /** Column form of [[JaroWinkler]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
