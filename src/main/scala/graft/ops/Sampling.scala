package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seeded per-partition: the kept set changes with
  * partitioning, cluster size, and row order — useless for reproducible
  * corpus splits. Hash sampling decides per ROW from a content key:
  * keep iff uniform(hash(salt, key)) < p. The same (salt, key) is kept
  * or dropped identically on any cluster, any partitioning, any engine
  * (md5 is the portable hash, so a SQL oracle reproduces the exact
  * kept set), and disjoint salts give independent samples — the
  * standard train/validation/test split device at corpus scale.
  */
object Sampling {

  /** 32-bit uniform value derived from md5(salt || key) — the first 8
    * hex chars as an integer in [0, 2^32). */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** Keep rows where the key's hash bucket falls under `p`. */
  def hashSample(df: DataFrame, keyCol: String, p: Double,
      salt: String): DataFrame = {
    require(p >= 0 && p <= 1, "p must be in [0,1]")
    val threshold = (p * 4294967296L).toLong
    df.filter(hashBucket(col(keyCol), salt) < lit(threshold))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006
    * A-ES, equivalently Gumbel top-k): each row draws an exponential
    * race key ln(u)/w from a DETERMINISTIC md5 uniform (the
    * [[Dsir.hashUniform]] (2h+1)/2⁵³ device) and the k LARGEST keys
    * win — the textbook distributed device for "sample 1M docs
    * proportionally to token count" because it needs no global RNG
    * state, no sequential reservoir, and no second pass over the
    * weights.
    *
    * At 100 TB this is a `TakeOrderedAndProject`: every partition
    * keeps its local top-k (a bounded heap), the driver merges P·k
    * candidate rows — no global sort, no single-partition window, no
    * shuffle of the corpus.
    *
    * Float discipline: u is bit-identical cross-engine, but ln is a
    * libm call (≤1 ulp, not correctly-rounded everywhere), so the key
    * is canonicalized with qround(6) and ties break on the id — the
    * q_ccnet_buckets rank discipline.
    */
  def weightedSampleKey(key: Column, weight: Column,
      salt: String): Column =
    graft.functions.Num.qround(
      log(Dsir.hashUniform(key, salt)) / weight.cast("double"), 6)

  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("skey",
        weightedSampleKey(col(keyCol), col(weightCol), salt))
      .orderBy(col("skey").desc, col(keyCol))
      .limit(k)
  }

  /** Stratified variant: per-stratum keep rates (corpus mixing — e.g.
    * downsample a crawl source to 10% while keeping curated sources
    * whole). Same per-row hash decision, so strata stay reproducible
    * and a stratum's sample at rate p nests inside its sample at any
    * higher rate under the same salt. */
  def stratifiedHashSample(df: DataFrame, keyCol: String,
      strataCol: String, rates: Map[String, Double], defaultP: Double,
      salt: String): DataFrame = {
    require((rates.values ++ Seq(defaultP)).forall(p => p >= 0 && p <= 1))
    def th(p: Double): Long = (p * 4294967296L).toLong
    val threshold = rates.foldLeft(lit(th(defaultP))) {
      case (acc, (stratum, p)) =>
        when(col(strataCol) === stratum, lit(th(p))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < threshold)
  }
}
