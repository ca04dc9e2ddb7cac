package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single latest
  * right row with `right.ts <= left.ts` on the same key. The classic
  * time-series/feature-store operator Spark's built-in joins lack (a
  * naive `l.key = r.key AND r.ts <= l.ts` range join explodes to all
  * eligible pairs and re-filters).
  *
  * Spark-first construction — NO join at all: tag both sides, union,
  * and run one `last(payload, ignoreNulls)` window per key ordered by
  * (ts, side). Right rows sort before left rows at equal ts, so the
  * running last-seen payload at each left row IS its as-of match.
  *
  * At 100 TB: one shuffle on the key for both inputs together and a
  * per-partition sort — the same cost as a sort-merge join, with no
  * intermediate pair explosion regardless of how many right rows
  * precede each left row. State per row during the scan is the
  * payload width, not a buffer.
  *
  * Hot keys: a window partition is ONE task — AQE cannot split it
  * (skew-join splitting applies to joins, not windows), so a
  * degenerate key serializes on one executor. The mitigations are
  * upstream of this operator: (a) pre-aggregate the right side to one
  * row per (key, ts) before calling — usually a huge reduction when
  * the right side is a high-frequency feed; (b) compound the key with
  * a coarse time bucket (run the as-of within each bucket, then
  * resolve rows whose match lies in an earlier bucket with a second,
  * much smaller pass over per-bucket last values). Even unsplit, the
  * single-task cost is a sort + linear scan — no pairwise blowup, so
  * it degrades linearly, not quadratically (AsOfSpec pins this with a
  * one-key stress case).
  *
  * Ties: multiple right rows sharing (key, ts) are resolved by union
  * order (nondeterministic) — pre-aggregate the right side to one row
  * per (key, ts), as q_asof_join does, when determinism matters.
  */
object AsOf {

  /** @param payload right-side columns carried onto each matched left
    *   row (names must not collide with left's columns).
    * @param toleranceMicros if set, matches older than
    *   `left.ts - tolerance` are nulled out (stale features dropped).
    * @param strict `true` for `right.ts < left.ts` (exclude same-instant
    *   rows — e.g. leakage-safe feature joins), default `<=`. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceMicros: Option[Long] = None,
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collide with left columns")

    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) ++ payload.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__match_ts", col("__ts"))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // unionByName fills each side's missing columns with NULL — exactly
    // the sentinel last(ignoreNulls) skips over
    val tagged = l.unionByName(r, allowMissingColumns = true)

    // right-before-left at equal ts gives <=; left-before-right gives <
    val sideOrder: Column = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = "__match_ts" +: payload
    val filled = carried.foldLeft(tagged)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    val aged = toleranceMicros match {
      case None => filled
      case Some(tol) =>
        // interval arithmetic for timestamp ts columns, plain
        // subtraction for numeric ones (same unit as the column)
        val isTimestamp = filled.schema("__ts").dataType ==
          org.apache.spark.sql.types.TimestampType
        val floor =
          if (isTimestamp) col("__ts") - expr(s"INTERVAL $tol MICROSECOND")
          else col("__ts") - lit(tol)
        val stale = col("__match_ts") < floor
        payload.foldLeft(filled)((df, c) =>
          df.withColumn(c, when(stale, lit(null)).otherwise(col(c))))
    }
    aged.filter(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Hot-key-resistant as-of join — the bucketed mitigation the
    * [[asofJoin]] scaladoc documents, implemented: the window key is
    * compounded with a coarse time bucket (`floor(ts / bucketMicros)`),
    * so a degenerate key splits across span/bucketMicros partitions
    * instead of serializing on one task. Two phases:
    *
    *  1. the plain tagged-union window per (key, bucket) — resolves
    *     every left row whose match lies in its own bucket;
    *  2. left rows with no in-bucket match take the LAST right payload
    *     of the nearest earlier bucket: the right side collapses to
    *     one row per (key, bucket) (`max_by` on ts — a tiny table),
    *     and a second as-of at bucket granularity (strict: earlier
    *     buckets only) carries it forward.
    *
    * Cross-bucket rows are always strictly earlier in time (equal ts
    * ⇒ equal bucket), so `strict` semantics reduce to phase 1, and the
    * carried right ts lets `toleranceMicros` apply once at the end —
    * both match [[asofJoin]] exactly (AsOfSpec pins equality, hot key
    * included). Timestamp ts columns are compared as epoch micros.
    *
    * At 100 TB: phase 1 is the same one-shuffle window with a wider
    * key; phase 2's bucket table is rows ≈ keys × active buckets —
    * orders of magnitude smaller than the data. Same (key, ts) ties
    * carry the base operator's caveat: pre-aggregate the right side
    * when determinism matters. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      payload: Seq[String], bucketMicros: Long,
      toleranceMicros: Option[Long] = None,
      strict: Boolean = false): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collide with left columns")

    def num(df: DataFrame, c: String): Column =
      if (df.schema(c).dataType ==
        org.apache.spark.sql.types.TimestampType) unix_micros(col(s"`$c`"))
      else col(s"`$c`")
    def bucketOf(ts: Column): Column = floor(ts / bucketMicros).cast("long")

    // the right event time rides along as payload so "was there an
    // in-bucket match" and the tolerance check survive both phases
    val r2 = right.withColumn("__rts", num(right, rightTs))
    val pay2 = payload :+ "__rts"
    val lB = left
      .withColumn("__lts", num(left, leftTs))
      .withColumn("__bucket", bucketOf(col("__lts")))
    val rB = r2.withColumn("__bucket", bucketOf(col("__rts")))

    val phase1 = asofJoin(lB, rB, keys :+ "__bucket", leftTs, rightTs,
      pay2, toleranceMicros = None, strict = strict)

    // one row per (key, bucket): the bucket's last right payload
    val keyB = keys :+ "__bucket"
    val bucketLast = rB.groupBy(keyB.map(c => col(s"`$c`")): _*)
      .agg(max_by(struct(pay2.map(c => col(s"`$c`")): _*), col("__rts"))
        .as("__last"))
      .select(keyB.map(c => col(s"`$c`")) ++
        pay2.map(c => col("__last").getField(c).as(c)): _*)
    val leftBuckets = phase1.select(keyB.map(c => col(s"`$c`")): _*)
      .distinct()
    val carryNames = pay2.map(c => s"__carry_$c")
    val carry = asofJoin(leftBuckets, bucketLast, keys,
        "__bucket", "__bucket", pay2, toleranceMicros = None, strict = true)
      .select(keyB.map(c => col(s"`$c`")) ++
        pay2.zip(carryNames).map { case (c, n) => col(s"`$c`").as(n) }: _*)

    val joined = phase1.join(carry, keyB, "left")
      .withColumn("__matched", col("__rts").isNotNull)
    val filled = pay2.zip(carryNames).foldLeft(joined) {
      case (df, (c, n)) =>
        df.withColumn(c,
          when(col("__matched"), col(s"`$c`")).otherwise(col(s"`$n`")))
    }
    val aged = toleranceMicros match {
      case None => filled
      case Some(tol) =>
        val stale = col("__rts") < col("__lts") - lit(tol)
        payload.foldLeft(filled)((df, c) =>
          df.withColumn(c, when(stale, lit(null)).otherwise(col(s"`$c`"))))
    }
    aged.select((leftCols ++ payload).map(c => col(s"`$c`")): _*)
  }
}
