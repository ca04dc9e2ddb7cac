package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE encoding (Sennrich et al. 2016) against a trained
  * merge list — the scale form of "apply the tokenizer corpus-wide".
  *
  * The composed alternative (one `replace` expression per merge)
  * builds a plan whose DEPTH is the merge count: fine at a 3-merge
  * fixture, dead at a production 30k-merge vocabulary (Catalyst
  * analysis, codegen method splitting, and per-row work all scale with
  * plan size). Here the merge list rides into ONE expression as a
  * rank table, and each word is encoded by the standard greedy
  * algorithm — repeatedly merge the lowest-rank adjacent pair — whose
  * cost is bounded by the word length, independent of vocabulary size.
  *
  * Equivalence contract: for a TRAINED merge list (each merge's
  * symbols exist before it is learned — true of any list produced by
  * BPE training, where a pair can only be counted after its parts were
  * created) the greedy-by-rank loop produces exactly the sequential
  * left-to-right replace chain's output: applying a later merge can
  * never create an earlier merge's pair, because that earlier pair's
  * symbols all predate the later merge's new symbol. BpeSpec pins
  * kernel ≡ replace-chain on randomly trained corpora.
  */
final class BpeMergeTable(val pairs: Array[(String, String)])
    extends Serializable {
  /** rank by (left NUL right) — the NUL join cannot collide for
    * distinct pairs unless a symbol itself contains NUL, which no
    * tokenizer alphabet does. */
  @transient lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      val key = pairs(i)._1 + "\u0000" + pairs(i)._2
      if (!m.containsKey(key)) m.put(key, i)
      i += 1
    }
    m
  }
}

/** word string → array<string> of BPE tokens under the trained merge
  * list (greedy lowest-rank-first, all occurrences merged left-to-right
  * non-overlapping per round). Null input → null; empty → empty. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  override def nullable: Boolean = true

  @transient private lazy val table: BpeMergeTable =
    new BpeMergeTable(merges.toArray)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BpeEncode.compute($c, $ref);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncode {
  /** Static kernel called from generated code. */
  def compute(s: UTF8String, t: BpeMergeTable): GenericArrayData = {
    val word = s.toString
    // initial symbols: one per code point
    var syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var n = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms(n) = new String(Character.toChars(cp))
      n += 1
      i += Character.charCount(cp)
    }
    val rank = t.rank
    var done = n <= 1
    while (!done) {
      // lowest-rank adjacent pair present
      var best = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val r = rank.get(syms(j) + "\u0000" + syms(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge every occurrence, left-to-right non-overlapping
        val (l, r) = t.pairs(best)
        val merged = l + r
        var w = 0
        j = 0
        while (j < n) {
          if (j < n - 1 && syms(j) == l && syms(j + 1) == r) {
            syms(w) = merged; j += 2
          } else {
            syms(w) = syms(j); j += 1
          }
          w += 1
        }
        n = w
        done = n <= 1
      }
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }
}

object BpeFunctions {
  /** BPE-encode `c` (a word) under `merges` (rank order). */
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c), merges))
}
