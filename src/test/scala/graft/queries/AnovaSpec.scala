package graft.queries

import graft.{SparkSuite, Tables}

/** Contracts of the X241–X243 operators beyond the oracle hash. */
class AnovaSpec extends SparkSuite {

  test("q_anova: variance decomposition recomputes from raw lengths; " +
      "eta2 in range") {
    val rows = StatsQueries.anova.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val xs = Tables.documents(spark, Sf0001)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
    val grand = xs.map(_._2).sum / xs.length
    val sst = xs.map(x => (x._2 - grand) * (x._2 - grand)).sum
    val byG = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ssb = byG.values.map { v =>
      val m = v.sum / v.length; v.length * (m - grand) * (m - grand)
    }.sum
    val r0 = rows.head
    assert(math.abs(r0.getDouble(5) - ssb) < 1e-2, "SSB recompute")
    assert(math.abs(r0.getDouble(5) + r0.getDouble(6) - sst) < 1e-2,
      "SSB + SSW = SST")
    assert(r0.getDouble(8) >= 0.0 && r0.getDouble(8) <= 1.0, "eta2")
    assert(r0.getDouble(7) > 0.0, "F")
    rows.foreach { r =>
      val g = byG(r.getString(0))
      assert(math.abs(r.getDouble(2) - g.sum / g.length) < 1e-9,
        s"${r.getString(0)} mean")
    }
  }

  test("q_partial_corr: partials bounded and recompute from the " +
      "row's own raw correlations") {
    val r = StatsQueries.partialCorr.fn(spark, Sf0001).head()
    val (rqp, rqd, rpd) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    def part(rxy: Double, rxz: Double, ryz: Double) =
      (rxy - rxz * ryz) /
        math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    assert(r.getDouble(3) == part(rqp, rqd, rpd))
    assert(r.getDouble(4) == part(rqd, rqp, rpd))
    assert(r.getDouble(5) == part(rpd, rqp, rqd))
    (3 to 5).foreach(i =>
      assert(math.abs(r.getDouble(i)) <= 1.0 + 1e-9))
  }

  test("q_simpson: reversal flag is exactly the sign product; " +
      "correlations bounded") {
    val rows = StatsQueries.simpsonScreen.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val pooled = rows.head.getDouble(3)
    rows.foreach { r =>
      assert(r.getDouble(3) == pooled)
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
      assert(r.getBoolean(4) == (r.getDouble(2) * pooled < 0.0))
    }
  }
}
