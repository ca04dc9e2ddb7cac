package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** UNRESTRICTED Damerau–Levenshtein distance (Damerau 1964; the
  * Lowrance–Wagner 1975 alphabet-indexed DP) as a native codegen
  * expression — the transposition edit metric next to the built-in
  * levenshtein (X91) and the normalized Jaro–Winkler kernel (X150).
  *
  * This is the FULL metric, not the OSA restriction: a transposed
  * pair may be edited again afterwards, so dl("ca","abc") = 2
  * (transpose + insert) where OSA says 3 — pinned to DuckDB's
  * `damerau_levenshtein`, which implements the same unrestricted
  * form (probe: ('abcd','acbd') → 1, ('ca','abc') → 2; DamerauSpec
  * pins both plus the OSA-divergent family). Distance lanes are
  * exact integers — they hash RAW cross-engine.
  *
  * Comparison unit: UTF-16 code units here vs DuckDB's byte walk —
  * identical verdicts on ASCII (the fixture domain; the X162
  * recorded-contract style). O(|a|·|b|) time, O(|a|·|b|) ints of
  * scratch per row — fine for the short-string record-linkage tier
  * this family serves (names/titles), not for documents. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.compute($l, $r);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object DamerauLevenshtein {
  def compute(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2), offset indexing per Lowrance–Wagner
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // last row index (1-based) where each char of the alphabet occurred in a
    val da = new java.util.HashMap[Char, Integer]()
    i = 1
    while (i <= la) {
      var db = 0 // last column (1-based) in this row where a(i-1) == b(j-1)
      j = 1
      while (j <= lb) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 }
          else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - 1 - k) + 1 + (j - 1 - l)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

object StringKernels {
  def damerauLevenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
