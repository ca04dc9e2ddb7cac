package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expressions for the near-dup operators (SURVEY §7
  * extension surface; public MinHash/SimHash constructions per Broder
  * 1997 / Charikar 2002).
  *
  * Why custom expressions and not built-in higher-order functions: a
  * 128-permutation MinHash via `transform`+`array_min` builds 128
  * array-valued intermediates per row; these expressions make ONE pass
  * over the input hashes with a fixed-size accumulator — the dominant
  * cost at 100 TB is exactly this per-row loop. Each expression
  * generates a static-kernel call, so the surrounding projection stays
  * inside whole-stage codegen.
  */

/** 64-bit mix finalizer (splitmix64 constants — public domain). */
object Mix64 {
  @inline def mix(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** MinHash signature: input array<long> of element hashes → array<long>
  * of `numHashes` minima under seeded universal permutations
  * h_j(x) = mix(a_j*x + b_j). Empty/null input → null signature. */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullable: Boolean = true

  // (multiplier, offset) pairs flattened: [a0,b0,a1,b1,...]
  @transient private lazy val params: Array[Long] =
    MinHashSignature.params(numHashes, seed)

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], params)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashParams", params, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSignature.compute($c, $ref);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {
  def params(numHashes: Int, seed: Long): Array[Long] = {
    val rnd = new java.util.Random(seed)
    val out = new Array[Long](numHashes * 2)
    var j = 0
    while (j < numHashes) {
      out(2 * j) = rnd.nextLong() | 1L
      out(2 * j + 1) = rnd.nextLong()
      j += 1
    }
    out
  }

  /** Static kernel; null on empty input (no shingles → no signature). */
  def compute(arr: ArrayData, params: Array[Long]): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val numHashes = params.length / 2
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = Mix64.mix(params(2 * j) * x + params(2 * j + 1))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** LSH band buckets: input array<long> of element hashes → array<long>
  * of `bands` bucket ids, where bucket b is a 64-bit combine of that
  * band's `rows` MinHash minima (same permutations as MinHashSignature
  * with numHashes = bands*rows). One pass over the input with a
  * fixed-size accumulator — replaces materializing the full signature
  * array and re-hashing string-concatenated slices per band, which at
  * 100 TB is pure wasted width on the hot path. Empty/null input →
  * null (no shingles → no buckets). */
case class MinHashBandBuckets(child: Expression, bands: Int, rows: Int,
    seed: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_buckets"
  override def nullable: Boolean = true

  @transient private lazy val params: Array[Long] =
    MinHashSignature.params(bands * rows, seed)

  override def nullSafeEval(input: Any): Any =
    MinHashBandBuckets.compute(input.asInstanceOf[ArrayData], params, rows)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashParams", params, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashBandBuckets.compute($c, $ref, $rows);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashBandBuckets {
  /** Static kernel: MinHash minima then a mix-chain combine per band.
    * Band index is folded into the combine so identical minima in
    * different bands land in distinct buckets. */
  def compute(arr: ArrayData, params: Array[Long], rows: Int): GenericArrayData = {
    val sig = MinHashSignature.compute(arr, params)
    if (sig == null) return null
    val numHashes = params.length / 2
    val bands = numHashes / rows
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Mix64.mix(b.toLong + 0x9e3779b97f4a7c15L)
      var j = b * rows
      val end = j + rows
      while (j < end) {
        h = Mix64.mix(h ^ sig.getLong(j))
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** SimHash: input array<long> of token hashes → 64-bit signature
  * (per-bit majority vote). Empty input → 0L. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = Mix64.mix(arr.getLong(i)) // decorrelate input bits
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Fused multi-table random-hyperplane bucketing: input array<float|
  * double> vector → array<long> of `tables` bucket ids, where table
  * t's `planes`-bit bucket packs the sign bits of the dot products
  * against deterministic splitmix64-derived planes (seed + t·7919, the
  * [[graft.ops.Similarity.hyperplaneBucket]] construction — results
  * are bit-identical, pinned in SimilaritySpec).
  *
  * Why fused: the composed form evaluates tables×planes separate
  * ArrayDot expressions, re-reading the vector 72× per row (the
  * dominant cost of embedding LSH at 100 TB). This kernel makes ONE
  * pass over the vector, updating all accumulators per element, and
  * generates a static call so the projection stays in whole-stage
  * codegen. */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int,
    seed: Long, dims: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 63 && tables >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  @transient private lazy val matrix: Array[Double] =
    HyperplaneBuckets.planeMatrix(planes, tables, seed, dims)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], planes,
      tables, dims, matrix, isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneMatrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HyperplaneBuckets.compute($c, $planes,
        $tables, $dims, $ref, $isFloat);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneBuckets {
  /** Flat [t][p][i] plane matrix — same derivation as
    * Similarity.hyperplaneBucket: mix(seedT + p·1000003 + i) mapped to
    * [-1, 1). */
  def planeMatrix(planes: Int, tables: Int, seed: Long,
      dims: Int): Array[Double] = {
    val m = new Array[Double](tables * planes * dims)
    var t = 0
    while (t < tables) {
      val seedT = seed + t * 7919L
      var p = 0
      while (p < planes) {
        var i = 0
        while (i < dims) {
          m((t * planes + p) * dims + i) =
            Mix64.mix(seedT + p * 1000003L + i).toDouble /
              Long.MaxValue.toDouble
          i += 1
        }
        p += 1
      }
      t += 1
    }
    m
  }

  /** Static kernel: one pass over the vector, all accumulators updated
    * per element — accumulation order per plane matches ArrayDot
    * (sequential over i), so the dot products are bit-identical. */
  def compute(a: ArrayData, planes: Int, tables: Int, dims: Int,
      m: Array[Double], isFloat: Boolean): GenericArrayData = {
    val n = math.min(a.numElements(), dims)
    val nAcc = tables * planes
    val acc = new Array[Double](nAcc)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      var j = 0
      while (j < nAcc) {
        acc(j) += x * m(j * dims + i)
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        if (acc(t * planes + p) >= 0) bucket += 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-API wrappers. */
object HashFunctions {
  def minhashSignature(c: Column, numHashes: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(c), numHashes, seed))

  def minhashBandBuckets(c: Column, bands: Int, rows: Int,
      seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashBandBuckets(ColumnBridge.expression(c), bands, rows, seed))

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  def hyperplaneBuckets(c: Column, planes: Int, tables: Int,
      seed: Long = 42L, dims: Int = 64): Column =
    ColumnBridge.column(HyperplaneBuckets(ColumnBridge.expression(c),
      planes, tables, seed, dims))
}
