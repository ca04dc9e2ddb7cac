package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood record linkage (Hernández & Stolfo, SIGMOD
  * 1995): sort the (deduplicated) names lexicographically and emit
  * every pair within `w` positions — the sliding-window ALTERNATIVE
  * to key blocking (X91's last-token blocks, X161's Soundex): blocking
  * misses pairs whose block key diverges; the sorted window catches
  * any pair whose PREFIXES sort near each other, at a guaranteed
  * n·w/2 candidate budget.
  *
  * Scale shape — both classic devices, composed:
  *  1. the GLOBAL RANK comes from the two-pass bucketed form (order-
  *     preserving 8-byte name prefix as the numeric bucket key via
  *     approxQuantile — ASCII lexicographic order is exactly the
  *     numeric order of the zero-padded first-8-byte integer, names
  *     tie-break within equal prefixes — then a bucket-partitioned
  *     row_number plus driver-collected bucket offsets), never a
  *     partition-less window;
  *  2. the |rank difference| ≤ w join is the RangeJoin bucketization
  *     on rank: each left rank probes its own and the following
  *     rank-bucket of width w, so only neighboring ranks ever meet —
  *     candidate volume is O(n·w), the method's own budget, not a
  *     same-key quadratic.
  *
  * ASCII names are the recorded contract (the prefix-key order
  * homomorphism is byte-wise; the callers feed normalized catalog
  * strings) — ENFORCED at runtime: a non-ASCII name raise_errors the
  * job instead of silently corrupting ranks (ADVICE r12 #2).
  */
object SortedNeighborhood {

  /** All pairs (name_a < name_b in sort order) within `w` positions:
    * (name_a, name_b, rank_dist). */
  def pairs(names: DataFrame, nameCol: String, w: Int,
      buckets: Int = 32): DataFrame = {
    require(w >= 1)
    val n0 = names.select(col(nameCol).as("name")).distinct()
    // order-preserving numeric key: first 8 UTF-8 bytes, zero-padded,
    // as a big-endian long (ASCII => always positive)
    val pfx = conv(rpad(substring(hex(encode(col("name"), "UTF-8")),
      1, 16), 16, "0"), 16, 10).cast("long")
    // Loud ASCII enforcement (ADVICE r12 #2): a first byte >= 0x80
    // overflows conv's unsigned result on the Long cast -> NULL pfx,
    // which would silently land in bucket 0 and sort nulls-first,
    // corrupting neighbor ranks. Fail the job instead.
    val guarded = when(col("name").rlike("^[\\x00-\\x7F]*$"), pfx)
      .otherwise(raise_error(concat(
        lit("SortedNeighborhood: non-ASCII name violates the "),
        lit("prefix-order contract: "), col("name"))))
    val keyed = n0.withColumn("pfx", guarded)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile("pfx", probs, 0.001)
        .distinct.sorted
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("pfx") > b, 1).otherwise(0)
    }
    val withB = keyed.withColumn("__b", bucket)
    val counts = withB.groupBy("__b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = counts
      .scanLeft((0, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => b -> acc }
      .toMap
    val rw = Window.partitionBy("__b").orderBy("pfx", "name")
    val ranked = withB
      .withColumn("rk", row_number().over(rw).cast("long") +
        coalesce(element_at(typedLit(offsets), col("__b")), lit(0L)))
      .select("name", "rk")
      .localCheckpoint(true) // both sides of the neighbor join
    // rank-range join: left probes its own + next w-bucket
    val lhs = ranked.select(col("name").as("name_a"),
        col("rk").as("ra"),
        explode(array(floor(col("rk") / w).cast("long"),
          floor(col("rk") / w).cast("long") + 1)).as("__rb"))
    val rhs = ranked.select(col("name").as("name_b"),
      col("rk").as("rb"),
      floor(col("rk") / w).cast("long").as("__rb"))
    lhs.join(rhs, Seq("__rb"))
      .where(col("rb") > col("ra") && col("rb") <= col("ra") + w)
      .select(col("name_a"), col("name_b"),
        (col("rb") - col("ra")).as("rank_dist"))
  }
}
