package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenize → k-gram → 64-bit hash over a text column.
  *
  * Replaces the interpreted `transform(sequence…, array_join(slice…))`
  * + `xxhash64` pipeline, which materializes every shingle as a string
  * before hashing — at 100 TB those intermediate strings are the
  * dominant allocation. Here each whitespace token is hashed from the
  * UTF-8 bytes directly and shingle hashes are a positional mix of the
  * k token hashes; no intermediate arrays or strings exist.
  *
  * The hash values differ from xxhash64-of-string — by design these
  * sets feed MinHash/SimHash/Jaccard, where any fixed 64-bit hash is
  * equivalent (set relations are preserved modulo ~2^-64 collisions).
  *
  * Semantics mirror Text.wordShingles: tokens split on whitespace,
  * shorter-than-k docs produce one whole-doc shingle, `distinct`
  * dedups (set semantics for Jaccard/MinHash; keep duplicates for
  * SimHash weighting).
  */
case class ShingleHashes(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $k, $distinct);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleHashes {

  private def hashBytes(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0x9e3779b97f4a7c15L
    var i = from
    while (i < until) {
      h = Mix64.mix(h ^ (b(i) & 0xFFL))
      i += 1
    }
    h
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' ||
      b == 0x0b

  @inline private def combine(toks: scala.collection.mutable.ArrayBuffer[Long],
      from: Int, until: Int): Long = {
    var h = 0x51afd7ed558ccd89L
    var i = from
    while (i < until) {
      h = Mix64.mix(h + toks(i)) // position-sensitive chain
      i += 1
    }
    h
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String, k: Int, distinct: Boolean): GenericArrayData = {
    val bytes = input.getBytes
    // token spans over raw UTF-8 bytes (whitespace = ASCII ws, matching
    // the \s+ split for this data; multi-byte chars never match ASCII)
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) tokHashes += hashBytes(bytes, start, i)
    }
    val m = tokHashes.length
    val out =
      if (m == 0) Array.empty[Long]
      else if (m < k) {
        // whole-doc fallback: positional mix over all tokens
        Array(combine(tokHashes, 0, m))
      } else {
        val arr = new Array[Long](m - k + 1)
        var j = 0
        while (j <= m - k) {
          arr(j) = combine(tokHashes, j, j + k)
          j += 1
        }
        arr
      }
    val res =
      if (!distinct || out.length <= 1) out
      else {
        // sort-then-dedup: set consumers (MinHash, Jaccard, banding)
        // are order-independent, and ASCENDING order lets JaccardSim
        // take its zero-allocation merge path per pair — the sort is
        // paid once per document, the merge saves on every pair.
        java.util.Arrays.sort(out)
        var w = 1
        var j = 1
        while (j < out.length) {
          if (out(j) != out(w - 1)) { out(w) = out(j); w += 1 }
          j += 1
        }
        if (w == out.length) out else java.util.Arrays.copyOf(out, w)
      }
    new GenericArrayData(res)
  }
}

object ShingleFunctions {
  /** Distinct k-shingle hash set (MinHash / Jaccard input). */
  def shingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k,
      distinct = true))

  /** Token hash multiset (SimHash input — repeats keep their weight). */
  def tokenHashes(text: Column): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), 1,
      distinct = false))
}
