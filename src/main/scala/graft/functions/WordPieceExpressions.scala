package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass WordPiece ENCODING (X316 — BERT's runtime tokenizer:
  * Devlin et al. 2019 §A / Schuster & Nakajima 2012): greedy LONGEST
  * prefix match against the trained vocabulary, continuation pieces
  * marked `##`. Unlike BPE's merge replay, WordPiece re-tokenizes
  * each word from scratch at serving time — which is why the encode
  * kernel is a separate operator from the X312 trainer.
  *
  * Same scale argument as [[BpeEncode]]: the vocabulary rides into
  * ONE expression as a hash set, so plan depth is constant in vocab
  * size (a production 30k-entry vocabulary costs the same plan as a
  * 30-entry fixture), per-word cost is O(len · maxTokenLen), and the
  * whole encode stays inside whole-stage codegen.
  *
  * OOV totality: when no vocabulary entry matches at a position, the
  * kernel emits the single code point itself (##-marked when not
  * word-initial) and advances — every input round-trips (strip `##`,
  * concatenate, recover the word), there is no [UNK] black hole to
  * lose training text into. Matching is over vocab ∪ single code
  * points, so a length-1 vocab entry and the fallback emit the same
  * token — the oracle exploits exactly this identity.
  */
final class WordPieceVocab(val syms: Array[String]) extends Serializable {
  @transient lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](syms.length * 2)
    syms.foreach(s.add)
    s
  }
  @transient lazy val maxLen: Int =
    if (syms.isEmpty) 1 else syms.map(_.length).max
}

/** word string → array<string> of WordPiece tokens (greedy longest
  * match, `##` continuation marks, per-code-point OOV fallback).
  * Null input → null; empty → empty. */
case class WordPieceEncode(child: Expression, syms: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"
  override def nullable: Boolean = true

  @transient private lazy val table: WordPieceVocab =
    new WordPieceVocab(syms.toArray)

  override def nullSafeEval(input: Any): Any =
    WordPieceEncode.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", table,
      classOf[WordPieceVocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WordPieceEncode.compute($c, $ref);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordPieceEncode {
  /** Static kernel called from generated code. */
  def compute(s: UTF8String, v: WordPieceVocab): GenericArrayData = {
    val word = s.toString
    val out = new java.util.ArrayList[Any]()
    val set = v.set
    var pos = 0
    while (pos < word.length) {
      // longest vocabulary match at pos
      var l = math.min(v.maxLen, word.length - pos)
      var found = 0
      while (l >= 1 && found == 0) {
        if (set.contains(word.substring(pos, pos + l))) found = l
        l -= 1
      }
      // OOV fallback: one code point (never split a surrogate pair)
      val tokLen =
        if (found > 0) found
        else Character.charCount(word.codePointAt(pos))
      val raw = word.substring(pos, pos + tokLen)
      out.add(UTF8String.fromString(
        if (pos == 0) raw else "##" + raw))
      pos += tokLen
    }
    new GenericArrayData(out.toArray)
  }
}

object WordPieceFunctions {
  /** WordPiece-encode `c` (a word) against vocabulary symbols `syms`
    * (unmarked — the kernel derives the `##` continuation forms). */
  def wordpieceEncode(c: Column, syms: Seq[String]): Column =
    ColumnBridge.column(WordPieceEncode(ColumnBridge.expression(c), syms))
}
