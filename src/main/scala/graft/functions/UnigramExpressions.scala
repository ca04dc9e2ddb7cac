package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation (X319 — Kudo ACL 2018, the
  * SentencePiece model: tokenize a word into the vocabulary sequence
  * MINIMIZING total negative log-likelihood, i.e. the single best
  * segmentation under a unigram language model over pieces). This is
  * the E-step kernel of hard-EM training and the serving tokenizer;
  * the fourth subword family next to frequency-greedy BPE (X31),
  * byte-level BPE (X294) and PMI-greedy WordPiece (X312/X316), which
  * differ in how the vocabulary is CHOSEN — unigram-LM starts BIG and
  * prunes — and in the segmentation rule: WordPiece is greedy
  * longest-match; unigram is a global optimum via DP.
  *
  * Costs are INTEGER-quantized nll values (FLOOR(-ln(p)·10⁶ + 0.5),
  * computed once per vocab entry) so the DP compares exact integers —
  * the oracle's relational DP replays bit-for-bit with zero
  * float-order hazards. Tie-break: equal total cost prefers the
  * LONGER token at the earlier position (then the token string, which
  * cannot tie — two same-length matches at one position are the same
  * substring). Same scale shape as [[BpeEncode]]: the vocabulary
  * rides into ONE expression, per-word cost O(len · maxTokenLen),
  * whole-stage codegen, zero shuffles.
  *
  * Totality: a position covered by no vocabulary entry (impossible
  * when the vocab carries the corpus alphabet, as the X319 seed does
  * by construction) falls back to the single code point at a large
  * fixed penalty — arbitrary input always segments and round-trips.
  */
final class UnigramVocab(val toks: Array[String], val nlls: Array[Long])
    extends Serializable {
  @transient lazy val nll: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      if (!m.containsKey(toks(i))) m.put(toks(i), nlls(i))
      i += 1
    }
    m
  }
  @transient lazy val maxLen: Int =
    if (toks.isEmpty) 1 else toks.map(_.length).max
}

/** word string → array<string> of min-cost unigram-LM tokens. Null
  * input → null; empty → empty. */
case class UnigramViterbi(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi"
  override def nullable: Boolean = true

  @transient private lazy val table: UnigramVocab =
    new UnigramVocab(vocab.map(_._1).toArray, vocab.map(_._2).toArray)

  override def nullSafeEval(input: Any): Any =
    UnigramViterbi.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocab", table,
      classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UnigramViterbi.compute($c, $ref);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnigramViterbi {
  /** OOV single-char penalty — far above any real vocab nll (ln of a
    * 10⁻⁶-quantized probability caps near 2³⁵ here). */
  final val FallbackNll: Long = Long.MaxValue >> 20

  /** Path-cost ceiling (ADVICE r17): all DP sums saturate here
    * instead of wrapping, so an all-OOV input of ANY length (the
    * naive sum overflows Long past ~2²⁰ code points) keeps every
    * comparison ordered — saturated paths tie at the cap and the
    * deterministic longest-token tie-break still picks one
    * segmentation. Below Long.MaxValue, which stays the exclusive
    * "no path" sentinel. */
  final val CostCap: Long = Long.MaxValue >> 1

  /** a + b clamped to [[CostCap]] (a, b ≥ 0 by construction). */
  @inline private def satAdd(a: Long, b: Long): Long =
    if (a >= CostCap - b) CostCap else a + b

  /** Static kernel called from generated code. */
  def compute(s: UTF8String, v: UnigramVocab): GenericArrayData = {
    val word = s.toString
    val n = word.length
    val nll = v.nll
    // suffix DP: best(i) = min cost to segment word[i..n)
    val best = new Array[Long](n + 1)
    var i = n - 1
    while (i >= 0) {
      var b = Long.MaxValue
      var l = math.min(v.maxLen, n - i)
      while (l >= 1) {
        val c = nll.get(word.substring(i, i + l))
        if (c != null) {
          val t = satAdd(c.longValue(), best(i + l))
          if (t < b) b = t
        }
        l -= 1
      }
      if (b == Long.MaxValue) // OOV fallback: one code point
        b = satAdd(FallbackNll,
          best(i + Character.charCount(word.codePointAt(i))))
      best(i) = b
      i -= 1
    }
    // forward walk: argmin (cost asc, token length desc) per position
    val out = new java.util.ArrayList[Any]()
    var pos = 0
    while (pos < n) {
      var chosenLen = 0
      var chosenCost = Long.MaxValue
      var l = math.min(v.maxLen, n - pos)
      while (l >= 1) {
        val c = nll.get(word.substring(pos, pos + l))
        if (c != null) {
          val t = satAdd(c.longValue(), best(pos + l))
          // scanning l downward: strict < keeps the LONGEST on ties
          if (t < chosenCost) { chosenCost = t; chosenLen = l }
        }
        l -= 1
      }
      if (chosenLen == 0)
        chosenLen = Character.charCount(word.codePointAt(pos))
      out.add(UTF8String.fromString(word.substring(pos, pos + chosenLen)))
      pos += chosenLen
    }
    new GenericArrayData(out.toArray)
  }
}

object UnigramFunctions {
  /** Viterbi-segment `c` (a word) under `vocab` = (token, integer
    * nll) pairs. */
  def unigramViterbi(c: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(UnigramViterbi(ColumnBridge.expression(c), vocab))
}
