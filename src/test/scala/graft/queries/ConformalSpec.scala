package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contracts of the X191 split-conformal stack: the q̂ order
  * statistic against a driver re-sort, the interval identity, and
  * the finite-sample coverage the method guarantees. */
class ConformalSpec extends SparkSuite {

  private lazy val out =
    StatsQueries.conformal.fn(spark, Sf0001).collect()

  test("qhat is the k-th smallest calibration residual, k = " +
      "ceil((n+1)(1-alpha)) capped at n") {
    out.groupBy(_.getAs[String]("event_type")).foreach {
      case (_, rows) =>
        val nCal = rows.head.getAs[Long]("n_cal")
        val k = rows.head.getAs[Long]("k")
        assert(k === math.min(nCal,
          math.ceil((nCal + 1) * 0.75).toLong))
    }
  }

  test("intervals are forecast +- qhat and covered matches the bounds") {
    out.foreach { r =>
      val fc = r.getAs[Double]("fc")
      val qh = r.getAs[Double]("qhat")
      assert(r.getAs[Double]("lo") === fc - qh)
      assert(r.getAs[Double]("hi") === fc + qh)
      val x = r.getAs[Long]("x").toDouble
      assert(r.getAs[Boolean]("covered") ===
        (x >= fc - qh && x <= fc + qh))
    }
  }

  test("aggregate empirical coverage tracks the conformal target " +
      "and the coverage column is the per-series rate") {
    // the 1-alpha = 0.75 guarantee is MARGINAL over calibration
    // draws — any single 9-day series can undershoot (sf0.001's
    // signup realizes 0.56), so the pin is on the pooled rate
    val overall = out.count(_.getAs[Boolean]("covered")).toDouble /
      out.length
    assert(overall >= 0.6, s"pooled coverage $overall")
    out.groupBy(_.getAs[String]("event_type")).foreach {
      case (t, rows) =>
        val cov = rows.count(_.getAs[Boolean]("covered")).toDouble /
          rows.length
        assert(cov > 0.0, s"$t degenerate zero coverage")
        assert(math.abs(rows.head.getAs[Double]("coverage") -
          math.floor(cov * 1e6 + 0.5) / 1e6) < 1e-12, t)
    }
  }
}
