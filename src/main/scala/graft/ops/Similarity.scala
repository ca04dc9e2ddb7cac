package graft.ops

import graft.functions.ArrayFunctions.arrayDot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY §7 extensions). Vectors are `array<float>`; math is done in
  * double via the ArrayDot expression (tight one-pass loop,
  * bit-identical to the zip_with/aggregate formulation and to DuckDB's
  * list_reduce — the exact variants stay oracle-checkable).
  *
  * Scale design (100 TB of vectors):
  *  - norms are computed ONCE per row before any pairing (never per
  *    pair);
  *  - brute force: broadcast the (small) query set; one scan of the
  *    corpus, per-query top-k — no corpus shuffle at all;
  *  - LSH path: random-hyperplane buckets (Charikar'02) from a seeded
  *    deterministic plane set; candidate generation is an equi-join on
  *    bucket id.
  */
object Similarity {

  /** Σ aᵢbᵢ in double, left-to-right (deterministic). */
  def dot(a: Column, b: Column): Column = arrayDot(a, b)

  /** Driver-side vector extraction tolerant of float or double arrays
    * (synthetic corpora built from Column arithmetic come back as
    * array<double>; the real tables ship array<float>). Exact either
    * way — floats widen losslessly. */
  private def vecDoubles(r: org.apache.spark.sql.Row, i: Int): Array[Double] =
    r.getSeq[Number](i).map(_.doubleValue()).toArray

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine from scratch — for one-off use; hot paths precompute norms
    * and use `cosineWithNorms`. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Cosine given per-row precomputed norms (bit-identical to `cosine`:
    * same dot, same norm values, same multiply/divide). */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / nullif(na * nb, lit(0.0))

  /** Deterministic pseudo-random hyperplanes: plane p, component i
    * derived from mix(seed, p, i) mapped to [-1, 1). The bucket id
    * packs sign bits of the dot products. Planes are array literals —
    * constant-folded, not rebuilt per row. */
  def hyperplaneBucket(vec: Column, planes: Int, seed: Long,
      dims: Int = 64): Column = {
    val bits = (0 until planes).map { p =>
      val plane = Array.tabulate(dims) { i =>
        val h = graft.functions.Mix64.mix(seed + p * 1000003L + i)
        h.toDouble / Long.MaxValue.toDouble
      }
      val d = dot(vec, typedLit(plane.toSeq))
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }


  /** Shared tail: rank scored (query_id, neighbor_id, cosine) rows and
    * keep the per-query top k (ties broken on neighbor id). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); `corpus` is
    * scanned once. Ties break on neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"), norm(col(queryVec)).as("qnorm")))
    // r19 (guide §2.5/§2.6 — stragglers): the |corpus|·|queries|
    // cosine product is the ONE heavy compute stage of every declared
    // brute-force lane, and at eval sizes the corpus side is a single
    // tiny parquet split (or a 1-partition checkpoint), so the whole
    // product ran as ONE task — serial on a 32-core box. Widen-ONLY
    // round-robin repartition to the session parallelism before the
    // BNLJ: a corpus-scale input already has ≥ parallelism splits
    // (no-op, never a coalesce), and the per-pair cosine + the
    // top-k window (total order: cosine DESC, neighbor_id) are
    // partitioning-independent.
    val c0 = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("cvec"), norm(col(corpusVec)).as("cnorm"))
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = if (c0.rdd.getNumPartitions < par) c0.repartition(par) else c0
    val scored = c
      .join(q, col("neighbor_id") =!= col("query_id")) // all pairs, no self
      .withColumn("cosine", cosineWithNorms(col("qvec"), col("cvec"),
        col("qnorm"), col("cnorm")))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) index: corpus rows assigned to their nearest
    * centroid; queries probe the `nprobe` nearest lists. Centroids are
    * fit with Lloyd iterations over a deterministic sample collected to
    * the driver (standard IVF practice — the index trains on a sample,
    * assignment runs distributed). At 100 TB: assignment is one
    * broadcast-centroids scan; the per-list search is an equi-join on
    * centroid id.
    */
  final case class IvfIndex(centroids: Array[Array[Double]]) {
    // fused codegen kernel: the row vector is copied once and scanned
    // against the whole centroid matrix — vs the composed form below,
    // which re-reads the vector per centroid and materializes a dots
    // array per row. Bit-identical (SimilaritySpec pins it).
    def assignExpr(vec: Column): Column =
      graft.functions.ArrayFunctions.nearestCentroid(vec, centroids)
    def probeLists(q: Array[Double], nprobe: Int): Seq[Int] =
      centroids.indices.sortBy { c =>
        -centroids(c).zip(q).map { case (a, b) => a * b }.sum
      }.take(nprobe)
  }

  /** argmax_c  dot(vec, centroid_c)  (cosine order on normalized
    * centroids) in composed form: C dot products per row, first-max
    * tie-break via array_position — linear expression size (a
    * when-chain fold that re-nests the accumulator is exponential and
    * OOMs the analyzer). Kept as the reference formulation the fused
    * NearestCentroid kernel is cross-validated against. */
  private[ops] def nearestCentroidComposed(centroids: Array[Array[Double]],
      vec: Column): Column = {
    val dotsArr = array(centroids.map(c => dot(vec, typedLit(c.toSeq))): _*)
    (array_position(dotsArr, array_max(dotsArr)) - 1).cast("int")
  }

  /** Fit IVF centroids: deterministic sample → Lloyd iterations on the
    * driver → L2-normalized centroids (so dot = cosine order). */
  def fitIvf(corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int, sampleSize: Int = 2048, iters: Int = 5): IvfIndex = {
    val sample = corpus.orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol)).collect()
      .map(r => vecDoubles(r, 0))
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    var cents = sample.take(nlist).map(normalize)
    for (_ <- 0 until iters) {
      val assigned = sample.groupBy { v =>
        cents.indices.maxBy(c => cents(c).zip(v)
          .map { case (a, b) => a * b }.sum)
      }
      cents = cents.indices.map { c =>
        assigned.get(c) match {
          case Some(vs) =>
            val dim = vs.head.length
            val mean = Array.tabulate(dim)(i => vs.map(_(i)).sum / vs.length)
            normalize(mean)
          case None => cents(c) // empty list keeps its centroid
        }
      }.toArray
    }
    IvfIndex(cents)
  }

  /** IVF approximate top-k: nprobe lists per query, exact rescoring
    * within the probed lists. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int,
      index: IvfIndex, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("cvec"), norm(col(corpusVec)).as("cnorm"),
      index.assignExpr(col(corpusVec)).as("list_id"))
    // probe lists per query computed on the driver (queries are small)
    val qRows = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec")).collect()
    val probes = qRows.flatMap { r =>
      val q = vecDoubles(r, 1)
      index.probeLists(q, nprobe).map(l => (r.getLong(0), l))
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val probeDf = broadcast(probes.toSeq.toDF("query_id", "list_id"))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"), norm(col(queryVec)).as("qnorm")))
    val scored = c.join(probeDf, Seq("list_id"))
      .join(q, Seq("query_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineWithNorms(col("qvec"), col("cvec"),
        col("qnorm"), col("cnorm")))
    rankTopK(scored, k)
  }

  /** Int8-quantized brute-force top-k: both sides are symmetric-int8
    * quantized (Int8Quantize — scale = max|v|/127, half-up rounding)
    * and ranked by QUANTIZED cosine. The per-vector scale cancels out
    * of cosine, so ranking runs entirely on integer dots + one double
    * divide — no dequantization, and (unlike float-math ANN rescoring
    * shortcuts) every value stays cross-engine exact, so the whole
    * approximate path is oracle-checkable.
    *
    * Scale design: the corpus scan is the cost at 100 TB; int8 codes
    * cut scan bytes ~4× and the dot kernel (IntArrayDot) runs on ints.
    * Same shape as bruteForceTopK: queries broadcast, corpus never
    * shuffles, quantization + norms happen once per row. */
  def int8TopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int): DataFrame = {
    import graft.functions.ArrayFunctions.{int8Quantize, intArrayDot}
    def qnorm(v: Column): Column = sqrt(intArrayDot(v, v).cast("double"))
    val q = broadcast(queries
      .select(col(queryId).as("query_id"),
        int8Quantize(col(queryVec)).as("qvec8"))
      .withColumn("qnorm", qnorm(col("qvec8"))))
    val c = corpus
      .select(col(corpusId).as("neighbor_id"),
        int8Quantize(col(corpusVec)).as("cvec8"))
      .withColumn("cnorm", qnorm(col("cvec8")))
    val scored = c
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", intArrayDot(col("qvec8"), col("cvec8"))
        .cast("double") / nullif(col("qnorm") * col("cnorm"), lit(0.0)))
    rankTopK(scored, k)
  }

  /** Sign-bit binary quantization (X283 — the 1-bit tier below X24's
    * int8 and X236's PQ: a 64-dim float vector becomes ONE 64-bit
    * code, bit i set iff v[i] > 0, and similarity becomes
    * popcount(xor) — 32× fewer bytes than float and the distance is
    * pure integer ALU). Static unrolled shifts, i = 0..63 left-fold —
    * the i = 63 term is Long.MinValue and the fold order keeps every
    * intermediate in range on both engines (no BIGINT overflow). */
  def signPack64(v: Column): Column =
    (0 until 64).map { i =>
      when(element_at(v, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduceLeft(_ + _)

  /** Binary-code approximate top-k: Hamming ranking over the packed
    * codes (ASC, neighbor-id tie-break — Hamming ties are COMMON at
    * 64 bits, so the tie-break is load-bearing for determinism).
    * Same broadcast-query full-scan contract as [[int8TopK]] —
    * declared BNLJ-by-design in PlanSpec; the scale path buckets by
    * code prefix exactly like LSH. */
  def binaryTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      signPack64(col(queryVec)).as("qcode")))
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      signPack64(col(corpusVec)).as("ccode"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming",
        call_function("bit_count",
          col("qcode").bitwiseXOR(col("ccode"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "hamming")
  }

  /** The multiprobe mask set: every XOR mask over `planes` sign bits
    * with popcount ≤ maxFlips, ascending. maxFlips=0 → Seq(0L)
    * (classic single-probe). */
  def probeMasks(planes: Int, maxFlips: Int): Seq[Long] =
    (0L until (1L << planes))
      .filter(m => java.lang.Long.bitCount(m) <= maxFlips)

  /** LSH-bucketed approximate top-k: exact rescoring within the probed
    * buckets. Single-probe (maxFlips=0) trades recall for a candidate
    * set ~corpus/2^planes per query; multiprobe (Lv et al., VLDB'07)
    * additionally probes every bucket within Hamming distance
    * `maxFlips` of the query's own signature — near neighbors that
    * land just across a hyperplane differ in exactly the sign bits of
    * their smallest-margin planes, so flipping 1-2 bits recovers most
    * of the recall lost to quantization without touching the (large)
    * corpus side: the index stays one bucket per corpus row, and only
    * the broadcast query side fans out ×|masks|. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int,
      planes: Int = 8, seed: Long = 42L, maxFlips: Int = 0): DataFrame = {
    // fused single-table kernel (one vector pass; bit-identical to the
    // composed hyperplaneBucket — SimilaritySpec pins equality)
    def bucketOf(vec: Column): Column = element_at(
      graft.functions.HashFunctions.hyperplaneBuckets(vec, planes,
        tables = 1, seed), 1)
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("cvec"), norm(col(corpusVec)).as("cnorm"),
      bucketOf(col(corpusVec)).as("bucket"))
    val masks = probeMasks(planes, maxFlips)
    // each corpus row matches at most one probe per query (the mask is
    // determined by the pair's signature XOR), so no dedup is needed
    val q = broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("qvec"), norm(col(queryVec)).as("qnorm"),
        bucketOf(col(queryVec)).as("bucket0"))
      .select(col("query_id"), col("qvec"), col("qnorm"),
        explode(array(masks.map(m =>
          col("bucket0").bitwiseXOR(lit(m))): _*)).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineWithNorms(col("qvec"), col("cvec"),
        col("qnorm"), col("cnorm")))
    rankTopK(scored, k)
  }
}
