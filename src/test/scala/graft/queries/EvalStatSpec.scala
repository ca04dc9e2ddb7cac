package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Contracts of the X183–X185 additions beyond the oracle hash. */
class EvalStatSpec extends SparkSuite {

  test("q_rank_fusion: rrf recomputes from the row's own ranks; all " +
      "three rank lanes are permutations of 1..n") {
    val rows = SparkEntry.queries("q_rank_fusion")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    val n = rows.length
    Seq(1, 2, 4).foreach { i =>
      assert(rows.map(_.getLong(i)).sorted.toSeq === (1L to n).toSeq, i)
    }
    rows.foreach { r =>
      val want = 1.0 / (60.0 + r.getLong(1)) + 1.0 / (60.0 + r.getLong(2))
      assert(r.getDouble(3) === want)
    }
    // fused rank ordering follows rrf descending
    val byFused = rows.sortBy(_.getLong(4)).map(_.getDouble(3))
    assert(byFused.zip(byFused.tail).forall { case (a, b) => a >= b })
  }

  test("q_logrank: identities — chi2 = z², observed splits the event " +
      "total, expected within [0, total events]") {
    val r = SparkEntry.queries("q_logrank")(spark, Sf0001).head()
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    val (o1, o2) = (r.getLong(2), r.getLong(3))
    assert(n1 > 0 && n2 > 0)
    // every user with a purchase is an event in exactly one cohort
    val purchasers = graft.Tables.events(spark, Sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") ===
        "purchase")
      .select("user_id").distinct().count()
    assert(o1 + o2 === purchasers)
    val e1 = r.getDouble(4)
    assert(e1 >= 0.0 && e1 <= (o1 + o2).toDouble)
    if (!r.isNullAt(6)) {
      val (chi2, z) = (r.getDouble(6), r.getDouble(7))
      assert(math.abs(chi2 - z * z) < 1e-9)
      assert(chi2 >= 0.0)
    }
  }

  test("q_brier_ece: ranges and the MCE ≥ ECE dominance") {
    val r = SparkEntry.queries("q_brier_ece")(spark, Sf0001).head()
    val (brier, ece, mce) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(r.getLong(0) > 0 && r.getLong(4) > 0)
    assert(brier >= 0.0 && brier <= 1.0) // p, y ∈ [0,1]
    assert(ece >= 0.0 && ece <= 1.0)
    assert(mce >= 0.0 && mce <= 1.0)
    // the worst bucket dominates the bucket-weighted average (up to
    // the qround quantization of the ece sum)
    assert(mce >= ece - 1e-6)
  }
}
