package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. Loading
  * is lazy (a `FileSourceScanExec` plan node); Catalyst pushes projections
  * and filters down into the parquet scan, so callers should NOT pre-select
  * columns here — declare the full table and let pruning happen per-query.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across driver data
    * generations: INT64 TIMESTAMP(NANOS) (read as raw longs via the
    * legacy nanosAsLong conf, truncated to micros with integral
    * division — a double-typed `/ 1000` would lose sub-μs bits at
    * 2024-epoch magnitudes) or plain timestamp[us] without UTC
    * adjustment (read as TIMESTAMP_NTZ). Dispatch on the LOADED type
    * rather than assuming one encoding, and normalize both to
    * session-zoned TimestampType — sessions pin UTC, so the NTZ cast
    * is value-preserving and downstream unix_micros/getTimestamp code
    * sees identical instants either way. DuckDB reads the same file
    * natively, so oracle compares agree without per-encoding SQL. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** One named query: the Spark plan plus (optionally) the equivalent ANSI SQL
  * the driver runs in DuckDB over the same parquet tables. Queries without
  * an oracle get a weaker rows-only check.
  *
  * Oracle-parity discipline (the driver sorts columns by NAME then hashes
  * VALUES):
  *   - alias every computed column identically on both sides;
  *   - impose a deterministic total ORDER BY on a non-null unique key
  *     (DuckDB's default NULL sort order differs from Spark's, so order
  *     keys must be non-null);
  *   - round floating-point aggregates on both sides (summation order
  *     differs between engines);
  *   - cast count/sum integer results explicitly (DuckDB sums to HUGEINT).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
