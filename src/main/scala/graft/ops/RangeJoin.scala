package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized time-range join — all (left, right) pairs on the same
  * key with `right.ts ∈ [left.ts + lower, left.ts + upper]`.
  *
  * Spark plans a naive `l.k = r.k AND r.ts BETWEEN …` as an equi-join
  * on the key that emits EVERY same-key pair and post-filters: per-key
  * quadratic, which at 100 TB means a hot user with 1M events builds
  * 10¹² pairs before the range filter runs. Bucketizing bounds that:
  * time is cut into windows of the range width, the right side lands
  * in exactly one bucket, the left side is exploded to the (≤2)
  * buckets its range can touch, and the join key becomes
  * (key, bucket) — only temporally-adjacent rows ever meet, and the
  * exact range predicate then prunes within the bucket. Pair volume is
  * O(rows within one range-width of each other), the true output
  * order, not O(same-key pairs).
  */
object RangeJoin {

  /** Floor division exact for |x| well under 2⁵³ (epoch micros are
    * ~1.7e15): x - pmod(x, w) is an exact multiple of w, so the double
    * division is exact. */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")

  /** @param payload right-side columns carried onto each pair (names
    *   must not collide with left's).
    * @param lowerMicros/upperMicros inclusive offsets relative to the
    *   left timestamp (both may be negative: a trailing window). */
  def timeRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      lowerMicros: Long, upperMicros: Long,
      payload: Seq[String]): DataFrame = {
    require(lowerMicros <= upperMicros, "empty range")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collide with left columns")
    val w = math.max(upperMicros - lowerMicros, 1L)

    val l = left
      .withColumn("__lts", unix_micros(col(leftTs)))
      .withColumn("__bucket", explode(array_distinct(array(
        floorDiv(col("__lts") + lit(lowerMicros), w),
        floorDiv(col("__lts") + lit(upperMicros), w)))))
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__rtscol")) ++ payload.map(col): _*)
      .withColumn("__rts", unix_micros(col("__rtscol")))
      .withColumn("__bucket", floorDiv(col("__rts"), w))

    l.join(r, keys :+ "__bucket")
      .filter(col("__rts") >= col("__lts") + lit(lowerMicros) &&
        col("__rts") <= col("__lts") + lit(upperMicros))
      .select((leftCols ++ payload).map(col): _*)
  }
}
