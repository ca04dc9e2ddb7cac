package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Contracts of the X222–X224 operators beyond the oracle hash: SCC
  * against an independent in-memory closure, the count-min join-size
  * estimator's one-sided bias, and the pinball GD's descent. */
class SccSketchSpec extends SparkSuite {

  test("q_domain_scc: matches an independent transitive-closure " +
      "recompute; bow-tie classes are consistent") {
    val edges = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") % 50).as("s"),
        (conv(substring(md5(concat(lit("pr:"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 50).as("t"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // Warshall closure over the 50-node carve
    val reach = Array.fill(50, 50)(false)
    edges.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    for (k <- 0 until 50; i <- 0 until 50; j <- 0 until 50)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    def sccId(u: Int): Long = ((0 until 50)
      .filter(v => reach(u)(v) && reach(v)(u)) :+ u).min.toLong
    val rows = GraphQueries.domainScc.fn(spark, Sf0001).collect()
    assert(rows.length == 50)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    (0 until 50).foreach { u =>
      assert(byId(u.toLong).getLong(1) == sccId(u), s"node $u scc_id")
    }
    // bow-tie consistency against the same closure
    val sizes = (0 until 50).map(sccId).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val coreId = sizes.toSeq.sortBy { case (id, sz) => (-sz, id) }.head._1
    val core = (0 until 50).filter(u => sccId(u) == coreId).toSet
    rows.foreach { r =>
      val u = r.getLong(0).toInt
      assert(r.getLong(2) == sizes(r.getLong(1)), s"node $u scc_size")
      val expected =
        if (core(u)) "CORE"
        else if (core.exists(m => reach(u)(m))) "IN"
        else if (core.exists(m => reach(m)(u))) "OUT"
        else "OTHER"
      assert(r.getString(3) == expected, s"node $u class")
    }
  }

  test("q_join_size_cm: estimate is an upper bound that min-tightens; " +
      "exact replay agrees with a direct count") {
    val rows = AnalyticsQueries.joinSizeCm.fn(spark, Sf0001).collect()
    assert(rows.length == 4)
    val exact = rows.head.getLong(3)
    val est = rows.head.getLong(2)
    assert(est == rows.map(_.getLong(1)).min, "est = min over rows")
    rows.foreach(r => assert(r.getLong(1) >= exact,
      "CM inner product can only overestimate"))
    assert(rows.forall(_.getDouble(4) >= 0.0))
    val direct = Tables.events(spark, Sf0001)
      .select(col("user_id").as("u"))
      .join(Tables.orders(spark, Sf0001)
        .select(col("o_custkey").as("u")), Seq("u")).count()
    assert(exact == direct)
  }

  test("q_quantile_reg: pinball loss descends over the pinned rounds") {
    val rows = StatsQueries.quantileReg.fn(spark, Sf0001).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getInt(0)).toSeq == (0 to 5))
    val losses = rows.map(_.getDouble(3))
    assert(losses.last < losses.head, "5 GD rounds failed to descend")
    assert(losses.forall(_ >= 0.0), "pinball loss is nonnegative")
    // round 0 starts at the origin
    assert(rows.head.getDouble(1) == 0.0 && rows.head.getDouble(2) == 0.0)
    // weights moved
    assert(rows.last.getDouble(1) != 0.0)
  }
}
