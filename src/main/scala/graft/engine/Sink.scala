package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Canonical-table sinks (SURVEY §4 physical-execution notes: at
  * 100 TB the cleaned table checkpoints as partitioned parquet keyed
  * by the columns downstream reads prune on — state/year for the
  * reference corpus).
  */
object Sink {

  /** Write a partitioned parquet table. `partitionCols` become
    * directory-level partitions (partition pruning on read);
    * `sortCols` order rows within each file (min/max page stats make
    * range predicates cheap). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Seq.empty,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(c => df(s"`$c`")): _*)
    val writer = sorted.write.mode(mode)
    (if (partitionCols.nonEmpty)
      writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a bucketed table: rows hash-partitioned into `buckets` files
    * per partition by `bucketCol`, sorted within. Joins/aggregations on
    * the bucket column between co-bucketed tables skip the shuffle
    * entirely — the 100 TB answer for repeated joins on the same key
    * (e.g. the claims three-part key, pre-normalized). Catalog-backed:
    * bucketing metadata lives in the table catalog, so this writes via
    * saveAsTable. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
