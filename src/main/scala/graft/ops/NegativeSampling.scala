package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive / retrieval
  * training pairs (the (user, item⁺, item⁻ₖ) triple builder every
  * two-tower / matrix-factorization pipeline runs; uniform corruption
  * sampling as in word2vec's negative sampling, Mikolov et al. 2013,
  * minus the frequency tilt — uniform over a DENSE 0-based item-id space).
  *
  * Everything is a pure function of (user, probe index): candidate j
  * for a user is `md5(prefix:user:j) mod N` over the dense item
  * space 0..N−1, so the draw needs NO RNG state, is reproducible on any
  * engine/partitioning, and replays in SQL. Accidental positives are
  * REJECTED by one anti-join against the positive set (the collision
  * probability per probe is |user's items|/N, so k+slack probes make
  * a short fill vanishingly rare — the slack contract is recorded,
  * not hidden: a user interacting with nearly the whole item space
  * can fill short). Surviving probes keep their probe order and the
  * first k win (one user-partitioned window — bounded by k+slack
  * rows per user).
  *
  * Scale shape: positives are one distinct projection; probes are a
  * fixed (k+slack)-way per-user fan-out of fixed-width rows; the
  * rejection is a key-partitioned anti-join; no window touches more
  * than k+slack rows per user key.
  *
  * Uniformity bound (ADVICE r12 #4): the draw is a 48-bit md5 slice
  * mod nItems, so "uniform" is exact only when nItems divides 2^48;
  * otherwise the low (2^48 mod nItems) residues are hit once more in
  * 2^48 probes — a per-item probability skew ≤ nItems/2^48 (~2^-28 at
  * 1M items). Recorded, not corrected: rejection on the top remainder
  * range would buy exactness nothing measurable here at the cost of a
  * variable probe count.
  */
object NegativeSampling {

  /** @param positives (user, item) distinct positive pairs
    * @param nItems    dense item-space size: items are
    *                  itemBase..itemBase+nItems−1
    * @param k         negatives to emit per user
    * @param slack     extra probes to absorb accidental-positive
    *                  rejections
    * @param itemBase  first valid item id (0 for a 0-based dense space,
    *                  1 for 1-based keys like TPC-H p_partkey — ADVICE
    *                  r12 #1: a 1-based caller on the 0-based default
    *                  emitted phantom item 0 and never item nItems)
    * @return (user, neg_item, probe, rank) — rank 1..k in probe order */
  def perUser(positives: DataFrame, userCol: String, itemCol: String,
      nItems: Long, k: Int, slack: Int = 3,
      prefix: String = "neg:", itemBase: Long = 0L): DataFrame = {
    require(k >= 1 && slack >= 0 && nItems >= 1)
    val pos = positives.select(col(userCol).as("user"),
      col(itemCol).as("item")).distinct()
    val users = pos.select("user").distinct()
    val probes = users.select(col("user"),
        explode(sequence(lit(1), lit(k + slack))).as("probe"))
      .withColumn("neg_item",
        conv(substring(md5(concat(lit(prefix), col("user").cast("string"),
          lit(":"), col("probe").cast("string"))), 1, 12), 16, 10)
          .cast("long") % nItems + itemBase)
    val survivors = probes.join(
      pos.select(col("user"), col("item").as("neg_item")),
      Seq("user", "neg_item"), "left_anti")
    val w = Window.partitionBy("user").orderBy("probe")
    survivors
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("user"), col("neg_item"), col("probe").cast("long")
        .as("probe"), col("rank"))
  }
}
