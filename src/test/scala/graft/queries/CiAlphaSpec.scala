package graft.queries

import graft.SparkSuite

/** Contracts of the X252–X254 operators beyond the oracle hash. */
class CiAlphaSpec extends SparkSuite {

  test("q_krippendorff: alpha bounded above by 1, close to kappa on " +
      "identical two-coder data, identities hold") {
    val r = DiagnosticsQueries.krippendorff.fn(spark, Sf0001).head()
    val (units, agree) = (r.getLong(0), r.getLong(1))
    assert(agree <= units)
    assert(math.abs(r.getDouble(2) -
      (1.0 - agree.toDouble / units)) < 1e-12, "d_o identity")
    val alpha = r.getDouble(4)
    assert(alpha <= 1.0 + 1e-9)
    assert(math.abs(alpha -
      (1.0 - r.getDouble(2) / r.getDouble(3))) < 1e-12)
    // alpha's expectation uses POOLED marginals — it tracks Scott's
    // pi (+ the n/(n-1) small-sample term), NOT Cohen's kappa, whose
    // per-coder marginal products differ when the coders' label
    // distributions differ (exactly this fixture's case)
    val cells = TextQueries.langidEval.fn(spark, Sf0001)
      .select("lang_labeled", "lang_detected", "n").collect()
    val u = cells.map(_.getLong(2)).sum.toDouble
    val po = cells.filter(c => c.getString(0) == c.getString(1))
      .map(_.getLong(2)).sum / u
    val pooled = (cells.map(c => c.getString(0) -> c.getLong(2)) ++
      cells.map(c => c.getString(1) -> c.getLong(2)))
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum / (2 * u) }
    val pe = pooled.map(p => p * p).sum
    val scottPi = (po - pe) / (1.0 - pe)
    assert(math.abs(alpha - scottPi) < 3.0 / u,
      s"alpha $alpha vs Scott's pi $scottPi beyond the 1/n term")
  }

  test("q_ndcg_ci: interval ordered and brackets the point estimate") {
    val r = RetrievalQueries.ndcgCi.fn(spark, Sf0001).head()
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= hi)
    assert(mean >= lo - 0.02 && mean <= hi + 0.02,
      s"mean $mean outside bootstrap CI [$lo, $hi]")
    assert(lo >= 0.0 && hi <= 1.0 + 1e-9)
    assert(r.getLong(0) > 0)
  }

  test("q_stream_hll_window: every hourly window's estimate tracks " +
      "its exact count") {
    val rows = WarehouseQueries.streamHllWindow.fn(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1, "exact lane")
      assert(r.getDouble(3) > 0.0, "estimate lane")
      // tiny hourly windows make RELATIVE error meaningless (exact=2,
      // est=3 is 50%); the sketch contract is relative error on real
      // cardinalities OR small absolute error on tiny ones
      val absErr = math.abs(r.getDouble(3) - r.getLong(2))
      assert(r.getDouble(4) <= 0.3 || absErr <= 3.0,
        s"${r.getString(0)}@${r.getLong(1)}: rel ${r.getDouble(4)} " +
          s"abs $absErr")
    }
  }

  test("q_good_turing: frequency-of-frequencies accounting and the " +
      "Chao1 floor recompute from raw tokens") {
    val rows = TextQueries.goodTuring.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val toks = graft.Tables.documents(spark, Sf0001)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.explode(
          graft.functions.Text.tokens(
            org.apache.spark.sql.functions.col("text"))).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = toks.filter(_._1 == src).map(_._2)
      val counts = mine.groupBy(identity).view.mapValues(_.size).toMap
      assert(r.getLong(1) == mine.length, s"$src n_tokens")
      assert(r.getLong(2) == counts.size, s"$src v_seen")
      val n1 = counts.values.count(_ == 1).toLong
      val n2 = counts.values.count(_ == 2).toLong
      assert(r.getLong(3) == n1 && r.getLong(4) == n2)
      assert(r.getDouble(5) == n1.toDouble / mine.length)
      val chao1 = counts.size +
        (n1 * (n1 - 1)).toDouble / (2 * (n2 + 1)).toDouble
      assert(math.abs(r.getDouble(6) - chao1) < 1e-9, s"$src chao1")
      assert(r.getDouble(6) >= r.getLong(2).toDouble,
        "Chao1 is a floor above the seen vocabulary")
    }
  }
}
