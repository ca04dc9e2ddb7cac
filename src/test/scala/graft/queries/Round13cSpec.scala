package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contracts of the X207 ORC round-trip, X208 itemset triples, and
  * X209 empirical-Bayes shrinkage. */
class Round13cSpec extends SparkSuite {

  test("q_orc_roundtrip: the pruned ORC read-back equals the same " +
      "slice computed straight from the source table") {
    val viaOrc = PipelineQueries.orcRoundtrip.fn(spark, Sf0001)
      .collect()
    val direct = graft.Tables.orders(spark, Sf0001)
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Num.qround(sum("o_totalprice"), 4)
          .as("sum_price"),
        min("o_orderdate").as("first_date"),
        max("o_orderdate").as("last_date"))
      .orderBy("o_orderpriority").collect()
    assert(viaOrc.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
  }

  test("q_itemset_triples: support monotonicity and exact ratio lanes") {
    val rows = AnalyticsQueries.itemsetTriples.fn(spark, Sf0001)
      .collect()
    rows.foreach { r =>
      val cAbc = r.getAs[Long]("c_abc")
      Seq("c_ab", "c_ac", "c_bc").foreach { c =>
        assert(cAbc <= r.getAs[Long](c),
          s"monotonicity violated on $c") }
      assert(r.getAs[Double]("conf_ab_c") ===
        cAbc.toDouble / r.getAs[Long]("c_ab"))
      assert(r.getAs[Double]("conf_ab_c") > 0.0 &&
        r.getAs[Double]("conf_ab_c") <= 1.0)
      assert(r.getAs[Long]("a") < r.getAs[Long]("b") &&
        r.getAs[Long]("b") < r.getAs[Long]("c"))
    }
  }

  test("q_eb_shrink: posterior means contract toward the prior mean") {
    val rows = StatsQueries.ebShrink.fn(spark, Sf0001).collect()
    val a = rows.head.getAs[Double]("alpha")
    val b = rows.head.getAs[Double]("beta")
    assert(a > 0 && b > 0, "MoM fit degenerate on the corpus")
    val prior = a / (a + b)
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_rate")
      val shr = r.getAs[Double]("shrunk_rate")
      assert(math.abs(shr - prior) <= math.abs(raw - prior) + 1e-12,
        s"${r.getAs[String]("source")}: $shr not between $raw and prior")
      // shrunk lies between raw and the prior mean
      assert((shr - raw) * (prior - raw) >= 0.0 ||
        math.abs(shr - raw) < 1e-12)
    }
  }
}
