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

/** PORTABLE one-pass shingle keys: word k-shingles → md5 → first 15
  * hex chars as a 60-bit long, exactly equal to
  * `conv(substring(md5(shingle), 1, 15), 16, 10)` over
  * `explode(Text.wordShingles(text, k))` — but with no intermediate
  * shingle strings, no string md5 input (the digest is fed token byte
  * spans + single spaces directly), and no interpreted higher-order
  * functions. Used where a SQL oracle must reproduce the exact keys
  * (contamination checks); the non-portable ShingleHashes stays the
  * MinHash/Jaccard workhorse.
  *
  * Semantics mirror Text.wordShingles: whitespace tokens, joined with
  * single spaces, whole-doc fallback for <k tokens (token-less text →
  * the md5 of ""), value-distinct (md5-collision merging is ~2⁻⁶⁰ per
  * in-doc pair). */
case class Md5ShingleKeys(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_shingle_keys"

  override def nullSafeEval(input: Any): Any =
    Md5ShingleKeys.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5ShingleKeys.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5ShingleKeys {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val SpaceByte = ' '.toByte

  private[functions] def digest(): java.security.MessageDigest =
    digests.get()

  /** First 60 bits of an md5 digest == parsing its first 15 hex chars
    * as a base-16 number. */
  @inline private[functions] def head60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }

  def compute(input: UTF8String, k: Int): GenericArrayData = {
    val bytes = input.getBytes
    val md = digests.get()
    // token spans (same whitespace class as ShingleHashes)
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWsByte(bytes(i))) i += 1
      val s = i
      while (i < n && !isWsByte(bytes(i))) i += 1
      if (i > s) { starts += s; ends += i }
    }
    val m = starts.length
    @inline def keyOf(from: Int, until: Int): Long = {
      md.reset()
      var j = from
      while (j < until) {
        if (j > from) md.update(SpaceByte)
        md.update(bytes, starts(j), ends(j) - starts(j))
        j += 1
      }
      head60(md.digest())
    }
    val out =
      if (m < k) Array(keyOf(0, m)) // whole-doc fallback ('' when m=0)
      else {
        val seen = new java.util.HashSet[java.lang.Long](2 * (m - k + 1))
        val buf = new scala.collection.mutable.ArrayBuffer[Long](m - k + 1)
        var j = 0
        while (j <= m - k) {
          val key = keyOf(j, j + k)
          if (seen.add(key)) buf += key
          j += 1
        }
        buf.toArray
      }
    new GenericArrayData(out)
  }

  @inline private[functions] def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' ||
      b == 0x0b
}

/** POSITIONAL variant of [[Md5ShingleKeys]]: one 60-bit key per
  * k-token window, in window order, duplicates KEPT — element i (0-
  * based) is the key of the window starting at token i+1. Documents
  * with fewer than k tokens yield an EMPTY array (zero windows — the
  * SpanDedup convention), not the whole-doc fallback: this feeds
  * positional span accounting (cross-document exact-substring dedup),
  * where a fallback key would misalign positions. */
case class Md5ShingleKeysAll(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_shingle_keys_all"

  override def nullSafeEval(input: Any): Any =
    Md5ShingleKeysAll.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5ShingleKeysAll.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5ShingleKeysAll {
  def compute(input: UTF8String, k: Int): GenericArrayData = {
    val bytes = input.getBytes
    val md = Md5ShingleKeys.digest()
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && Md5ShingleKeys.isWsByte(bytes(i))) i += 1
      val s = i
      while (i < n && !Md5ShingleKeys.isWsByte(bytes(i))) i += 1
      if (i > s) { starts += s; ends += i }
    }
    val m = starts.length
    if (m < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - k + 1)
    var j = 0
    while (j <= m - k) {
      md.reset()
      var t = j
      while (t < j + k) {
        if (t > j) md.update(' '.toByte)
        md.update(bytes, starts(t), ends(t) - starts(t))
        t += 1
      }
      out(j) = Md5ShingleKeys.head60(md.digest())
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** PORTABLE one-pass simhash: whitespace tokens → md5-derived 60-bit
  * token keys (same construction as [[Md5ShingleKeys]] with k=1) →
  * per-bit ±1 majority vote → 60-bit signature. Value-identical to the
  * explode + 60-way conditional-sum aggregate formulation a SQL engine
  * runs (cross-validated), but one expression evaluation per document:
  * no token explosion, no 60-column aggregate state through a shuffle.
  * Token-less text → 0 votes everywhere → signature 0 (matches the
  * SQL SUM-over-empty semantics of emitting no row — callers filter).
  * Nullable=false; returns the signature as a long. */
case class Md5SimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 60, "15 hex chars carry 60 bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Md5SimHash.compute(input.asInstanceOf[UTF8String], bits))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5SimHash.compute($c, $bits);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5SimHash {
  def compute(input: UTF8String, bits: Int): Long = {
    val bytes = input.getBytes
    val md = Md5ShingleKeys.digest()
    val votes = new Array[Int](bits)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && Md5ShingleKeys.isWsByte(bytes(i))) i += 1
      val start = i
      while (i < n && !Md5ShingleKeys.isWsByte(bytes(i))) i += 1
      if (i > start) {
        md.reset()
        md.update(bytes, start, i - start)
        val h = Md5ShingleKeys.head60(md.digest())
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
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

  /** Portable (SQL-reproducible) md5-derived 60-bit shingle keys. */
  def md5ShingleKeys(text: Column, k: Int): Column =
    ColumnBridge.column(Md5ShingleKeys(ColumnBridge.expression(text), k))

  /** Positional md5 window keys (duplicates kept, window order). */
  def md5ShingleKeysAll(text: Column, k: Int): Column =
    ColumnBridge.column(Md5ShingleKeysAll(ColumnBridge.expression(text), k))

  /** Portable (SQL-reproducible) md5-derived simhash signature. */
  def md5SimHash(text: Column, bits: Int = 60): Column =
    ColumnBridge.column(Md5SimHash(ColumnBridge.expression(text), bits))
}
