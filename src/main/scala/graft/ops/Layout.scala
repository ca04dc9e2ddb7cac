package graft.ops

import graft.functions.LayoutFunctions.zValue
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order data layout: bin each dimension into 2^bits dense ranks
  * from its global bounds, Morton-interleave the bins, and sort/
  * partition on the z-key — rows close in BOTH dimensions land in the
  * same file, so per-file min/max stats prune scans on either
  * predicate (the multi-dimensional generalization of sorting by one
  * column, after public lakehouse OPTIMIZE ZORDER designs).
  *
  * The bounds are a single min/max aggregation collected to the
  * driver — metadata-sized by contract (4 longs), the same pattern as
  * the dictionary rows and IVF training sample. Binning from fixed
  * bounds keeps the key a pure per-row function: deterministic,
  * oracle-replayable, and shuffle-free to compute.
  */
object Layout {

  final case class Bounds(aLo: Long, aHi: Long, bLo: Long, bHi: Long)

  /** One tiny reduction: global min/max of both layout dimensions. */
  def bounds(df: DataFrame, colA: String, colB: String): Bounds = {
    val r = df.agg(min(col(colA)), max(col(colA)),
      min(col(colB)), max(col(colB))).collect().head
    Bounds(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** floor((v − lo) · 2^bits / (hi − lo + 1)) — dense rank bins in
    * [0, 2^bits); exact-integer numerator, one IEEE divide + floor,
    * so any engine reproduces the bin. */
  private def bin(c: Column, lo: Long, hi: Long, bits: Int): Column =
    floor(((c - lit(lo)) * lit(1L << bits)).cast("double") /
      lit((hi - lo + 1).toDouble)).cast("long")

  /** The z-key column for fixed bounds (use with sortWithinPartitions
    * / repartitionByRange when writing). */
  def zKey(colA: Column, colB: Column, b: Bounds, bits: Int): Column =
    zValue(bin(colA, b.aLo, b.aHi, bits), bin(colB, b.bLo, b.bHi, bits),
      bits)

  /** Write `df` hash-bucketed AND per-bucket-sorted on `key` as an
    * external parquet table, and return the re-read table. Joining two
    * tables bucketed on their join keys with the SAME bucket count
    * plans a SortMergeJoin with ZERO exchanges — the co-location was
    * paid once at write time, so at 100 TB every subsequent join /
    * aggregation on the key is shuffle-free. The `repartition` on the
    * key uses the same Murmur3-pmod hash as the bucketing layer, so
    * each task holds exactly one bucket's rows → one file per bucket.
    * (Stock Spark only trusts the per-bucket sort under
    * `spark.sql.legacy.bucketedTableScan.outputOrdering`, so a LOCAL
    * per-bucket Sort remains in the join plan — already-sorted input,
    * no exchange; the cross-partition shuffle is what's eliminated.) */
  def bucketed(df: DataFrame, table: String, dir: String, key: String,
      buckets: Int): DataFrame = {
    val s = df.sparkSession
    df.repartition(buckets, col(key))
      .write.mode("overwrite").option("path", s"$dir/$table")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
    s.table(table)
  }

  /** Per-z-bucket extent stats: the data-skipping evidence. Each
    * bucket maps to exactly one (binA, binB) pair, so both dimensions
    * are bounded inside every bucket — the property file-level min/max
    * pruning relies on. */
  def zorderStats(df: DataFrame, colA: String, colB: String,
      bits: Int): DataFrame = {
    val b = bounds(df, colA, colB)
    df.groupBy(zKey(col(colA), col(colB), b, bits).as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
        min(col(colB)).as("b_min"), max(col(colB)).as("b_max"))
  }
}
