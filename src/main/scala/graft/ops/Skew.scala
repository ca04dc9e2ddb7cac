package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-handling for shuffle joins (SURVEY §4 / the 100 TB
  * design list). AQE's skew-join split handles most cases at runtime;
  * salting is the static fallback when one side has pathological hot
  * keys (a handful of keys owning a large share of rows) and the other
  * side is small enough to replicate per salt but too big to
  * broadcast.
  */
object Skew {

  /** Widen-ONLY round-robin repartition to the session default
    * parallelism (r20 — the r19 `Similarity.bruteForceTopK` device
    * factored out; guide §2.5/§2.6 stragglers/idle capacity): a heavy
    * per-row compute stage at eval scale often hangs off ONE tiny
    * parquet split or a 1-partition checkpoint and runs serial on a
    * 32-core box. At corpus scale the input already carries
    * ≥ parallelism partitions, so this is a no-op — never a coalesce.
    * Round-robin repartition is row-preserving; use only above
    * partitioning-independent computations (per-row projections,
    * total-order windows, keyed aggregations). */
  def widen(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** Pin a COMPUTE-DENSE stage's parallelism to the session's core
    * count (r20 — guide §2.6): AQE sizes post-shuffle partitions by
    * BYTES, so a stage whose input is kilobytes but whose per-row
    * work is heavy (set-intersection verification, cosine products)
    * coalesces to one task and runs serial. An explicit
    * `repartition(n)` survives AQE (user-specified counts are never
    * re-coalesced), so the stage downstream of it runs cluster-wide.
    * `defaultParallelism` is the cluster's core count — a
    * scale-adaptive width for compute-bound work (the advisory-bytes
    * knob is the right sizing only for byte-bound work). Row-
    * preserving; use only above partitioning-independent compute. */
  def widenExec(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Inner equi-join with the LEFT side's hot keys salted.
    *
    * Left rows get a deterministic salt in [0, salts) derived from a
    * unique column (no rand(): deterministic retries/replays); right
    * rows are replicated once per salt. Result equals the plain join
    * exactly — the salt only widens the shuffle key space so one hot
    * key spreads over `salts` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftUniqueCol: String, salts: Int): DataFrame = {
    require(salts > 1)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(s"`$leftUniqueCol`")), lit(salts.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
