package graft.queries

import graft.SparkSuite

/** Contracts of the X205 IPF raking: after the pinned rounds the
  * weighted table matches both target margins — the convergence the
  * method exists for. */
class IpfSpec extends SparkSuite {

  test("raked margins hit the population targets on both axes") {
    val rows = StatsQueries.ipfRake.fn(spark, Sf0001).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val got = rs.map(_.getAs[Double]("raked")).sum
      val want = rs.head.getAs[Double]("row_target")
      assert(math.abs(got - want) / want < 1e-3,
        s"type $t margin $got vs target $want")
    }
    val byDp = rows.groupBy(_.getAs[Long]("daypart"))
    byDp.foreach { case (dp, rs) =>
      val got = rs.map(_.getAs[Double]("raked")).sum
      val want = rs.head.getAs[Double]("col_target")
      // the column pass ran last, so this axis is matched exactly
      assert(math.abs(got - want) / want < 1e-5,
        s"daypart $dp margin $got vs target $want")
    }
    // weights stay near 1 on a mildly biased stratum
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(w > 0.5 && w < 2.0, s"weight $w out of band")
    }
  }
}
