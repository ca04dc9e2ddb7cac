package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality / CBO-stats pass a 100 TB corpus
  * runs before anything else (the engine-side analog of the reference's
  * `sys.columns` catalog introspection, SURVEY §2 S7, extended from
  * schema to data: null counts, cardinalities, extrema).
  *
  * Scale design: ONE aggregation over the table computes every
  * column's stats (count/min/max are plain one-pass aggregates;
  * Catalyst plans the multi-distinct counts via a single Expand — no
  * per-column scans), then a `stack` pivots the single result row into
  * the tall (column_name, stats…) shape. Nothing ever collects: the
  * profile is a 1×(4·n_cols) row reshaped to n_cols rows.
  */
object Profile {

  /** Per-column profile of `df` restricted to `cols`:
    * (column_name, n_rows, n_null, n_distinct, min_s, max_s) — extrema
    * cast to strings so heterogeneous columns stack into one table. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    def s(c: Column): Column = c.cast("string")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__n_null"),
        count_distinct(col(c)).as(s"${c}__n_distinct"),
        s(min(col(c))).as(s"${c}__min"),
        s(max(col(c))).as(s"${c}__max"))
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n_rows, `${c}__n_null`, `${c}__n_distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_null, n_distinct, min_s, max_s)")
  }
}
