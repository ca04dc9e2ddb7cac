package graft.queries

import graft.SparkSuite

/** Contracts of the X203 Nelson–Aalen and X204 gains-chart readouts. */
class SurvivalSpec2 extends SparkSuite {

  test("q_nelson_aalen: cumulative lanes replay a driver fold and " +
      "the FH survival dominates KM row-wise") {
    val na = DiagnosticsQueries.nelsonAalen.fn(spark, Sf0001)
      .collect().sortBy(_.getAs[Long]("t_day"))
    var ch = 0L
    var cv = 0L
    na.foreach { r =>
      val d = r.getAs[Long]("n_events").toDouble
      val n = r.getAs[Long]("n_risk").toDouble
      ch += math.floor(d / n * 1e9 + 0.5).toLong
      cv += math.floor(d / (n * n) * 1e9 + 0.5).toLong
      assert(r.getAs[Double]("cum_hazard") === ch.toDouble / 1e9)
      assert(r.getAs[Double]("var_hazard") === cv.toDouble / 1e9)
      assert(r.getAs[Double]("surv_fh") ===
        math.floor(math.exp(-(ch.toDouble / 1e9)) * 1e6 + 0.5) / 1e6)
    }
    // exp(-d/n) >= 1 - d/n term-wise => FH survival >= KM survival
    val km = DiagnosticsQueries.kaplanMeier.fn(spark, Sf0001)
      .collect()
      .map(r => r.getAs[Long]("t_day") -> r.getAs[Double]("survival"))
      .toMap
    na.foreach { r =>
      val t = r.getAs[Long]("t_day")
      assert(r.getAs[Double]("surv_fh") >= km(t) - 1e-6, s"t=$t")
    }
  }

  test("q_gains_chart: capture is monotone to 1.0 and the top decile " +
      "lifts above random") {
    val rows = TextQueries.gainsChart.fn(spark, Sf0001)
      .collect().sortBy(_.getAs[Long]("decile"))
    val caps = rows.map(_.getAs[Double]("cum_capture"))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b })
    assert(math.abs(caps.last - 1.0) < 1e-12)
    assert(rows.head.getAs[Long]("decile") === 1L)
    assert(rows.head.getAs[Double]("lift") > 1.0,
      s"top-decile lift ${rows.head.getAs[Double]("lift")}")
    // totals conserve
    val n = rows.map(_.getAs[Long]("n")).sum
    val pos = rows.map(_.getAs[Long]("n_pos")).sum
    assert(rows.forall { r =>
      r.getAs[Double]("resp_rate") ===
        r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n") })
    assert(n > 0 && pos > 0)
  }
}
