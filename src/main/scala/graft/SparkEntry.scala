package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's QueryDef; each def
  * optionally carries the DuckDB-equivalent SQL for the correctness gate.
  */
object SparkEntry {

  /** All registered query modules. Order is stable; names must be unique. */
  def defs: Seq[QueryDef] =
    graft.queries.CoreQueries.all ++
    graft.queries.PipelineQueries.all ++
    graft.queries.TextQueries.all ++
    graft.queries.SimilarityQueries.all ++
    graft.queries.EventQueries.all ++
    graft.queries.AnalyticsQueries.all ++
    graft.queries.CurationQueries.all ++
    graft.queries.TrainPrepQueries.all ++
    graft.queries.UrlQueries.all ++
    graft.queries.CrawlQueries.all ++
    graft.queries.GraphQueries.all ++
    graft.queries.DiagnosticsQueries.all ++
    graft.queries.StatsQueries.all ++
    graft.queries.WarehouseQueries.all ++
    graft.queries.ClusterQueries.all ++
    graft.queries.RetrievalQueries.all ++
    graft.queries.GeoQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case QueryDef(n, Some(sql), _) => n -> sql }.toMap
}
