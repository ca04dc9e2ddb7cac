package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-refresh classifier a corpus
  * build runs when a new crawl lands: compare content fingerprints of
  * the old and new snapshots per document key and label every key
  * `added` / `removed` / `changed` / `unchanged`. Downstream, only the
  * added+changed set re-enters the (expensive) dedup/quality pipeline
  * and the removed set is retired — turning a 100 TB full rebuild into
  * an incremental delta job.
  *
  * Scale design: fingerprints are computed BEFORE the join, so
  * document text never crosses the shuffle (the same discipline as
  * exact dedup X1) — each side exchanges only (key, 32-byte hash).
  * The full-outer join is one fixed-width shuffle per side; at 100 TB
  * both snapshots would live bucketed on the key (see the bucketed
  * co-located join), making the diff exchange-free entirely.
  */
object Snapshot {

  /** Label every key across two snapshots. `fp` is the content
    * fingerprint expression evaluated against each side's columns
    * (e.g. `md5(col("text"))`). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      fp: Column): DataFrame = {
    val o = oldSnap.select(col(key), fp.as("old_fp"))
    val n = newSnap.select(col(key), fp.as("new_fp"))
    o.join(n, Seq(key), "full_outer")
      .select(col(key), col("old_fp"), col("new_fp"),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
