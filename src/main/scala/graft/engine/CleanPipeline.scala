package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Schema reshaping (SURVEY §2i C2/C3, ref `:143-270` per file).
  *
  * The reference's two WHILE loops — N× `ALTER TABLE DROP COLUMN` and
  * N single-column projections re-joined by surrogate `row_num` — exist
  * only because T-SQL tables are mutable-in-place. Under immutable
  * DataFrames both collapse to one projection, which Catalyst folds
  * into the scan (ColumnPruning): zero extra jobs, zero shuffles,
  * versus the reference's ~2N materialized tables.
  */
object CleanPipeline {

  /** Apply a dictionary plan: drop + rename in a single select. */
  def clean(df: DataFrame, plan: CleanPlan): DataFrame = {
    val kept = plan(df.columns.toSeq)
    df.select(kept.map { case (raw, cleanName) =>
      col(s"`$raw`").as(cleanName)
    }: _*)
  }

  /** The reference's surrogate row key (ref W1 `:163`:
    * `ROW_NUMBER() OVER (ORDER BY k)`) — faithful form. A global window
    * funnels every row through ONE partition; acceptable for
    * capstone-sized files, never at 100 TB. Kept for parity tests. */
  def globalRowNumber(df: DataFrame, orderCol: String,
      keyName: String = "row_num"): DataFrame =
    df.withColumn(keyName,
      row_number().over(Window.orderBy(col(s"`$orderCol`"))).cast("long"))

  /** Scale-safe surrogate key: rank partitions by their minimum order
    * value (ties by partition id), then cumulative-offset each
    * partition's local sequence — two light passes, no single-partition
    * funnel. When partitions hold disjoint `orderCol` ranges (e.g. the
    * output of a range partitioner / sorted files) this reproduces
    * globalRowNumber's dense 1..N numbering exactly; for arbitrary
    * partitioning the key is dense and unique, ordered by
    * (partition-min, local order). For the pipeline's purpose
    * (re-stitching what immutability never splits) uniqueness is all
    * that matters. */
  def scalableRowKey(df: DataFrame, orderCol: String,
      keyName: String = "row_num"): DataFrame = {
    val local = df
      .withColumn("__pid", spark_partition_id().cast("long"))
      .withColumn("__local", row_number().over(
        Window.partitionBy("__pid").orderBy(col(s"`$orderCol`"))).cast("long"))
    val counts = local.groupBy("__pid")
      .agg(count(lit(1)).as("__n"), min(col(s"`$orderCol`")).as("__min"))
      .withColumn("__offset",
        coalesce(sum("__n").over(
          Window.orderBy("__min", "__pid").rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    local.join(broadcast(counts), "__pid")
      .withColumn(keyName, col("__local") + col("__offset"))
      .drop("__pid", "__local", "__offset")
    // counts has one row per partition — always broadcastable; the
    // only data-sized op is the partition-local row_number.
  }
}
