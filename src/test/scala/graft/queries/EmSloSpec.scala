package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Contracts of the X238–X240 operators beyond the oracle hash. */
class EmSloSpec extends SparkSuite {

  test("q_em_mixture: log-likelihood never decreases (the EM " +
      "guarantee), parameters stay in their domains") {
    val rows = StatsQueries.emMixture.fn(spark, Sf0001).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getInt(0)).toSeq == (0 to 5))
    val lls = rows.map(_.getDouble(6))
    lls.sliding(2).foreach {
      case Array(a, b) =>
        // qround(6) per-lane quantization can nudge a step by ~1e-6
        assert(b >= a - 1e-5, s"EM loglik decreased: $a -> $b")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, "pi1")
      assert(r.getDouble(3) >= 1e-4 && r.getDouble(4) >= 1e-4,
        "variance floors")
    }
    // the fit genuinely moved off the moment init
    assert(rows.last.getDouble(1) != rows.head.getDouble(1))
  }

  test("q_slo_burn: burn lanes recompute from counts; page fires " +
      "iff BOTH windows exceed threshold") {
    val rows = EventQueries.sloBurn.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nErr) = (r.getLong(2), r.getLong(3))
      val burn1 = r.getDouble(4)
      assert(burn1 == nErr.toDouble / n / 0.01, "burn1 recompute")
      assert(r.getBoolean(6) == (burn1 > 14.4 && r.getDouble(5) > 6.0))
    }
    // 6h windows aggregate their member hours exactly
    val byKey = rows.groupBy(r => (r.getString(0), r.getLong(1) / 6))
    byKey.foreach { case ((_, _), hrs) =>
      assert(hrs.map(_.getDouble(5)).distinct.length == 1,
        "hours of one 6h window must share burn6")
    }
  }

  test("q_twap: time-weighted mean recomputes from the raw stream") {
    val rows = EventQueries.twap.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val evs = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    val weighted = evs.groupBy(_._1).values.flatMap { u =>
      val srt = u.sortBy(e => (e._4, e._5))
      srt.zip(srt.tail).map { case (a, b) => (a._2, a._3, b._4 - a._4) }
    }.toSeq
    rows.foreach { r =>
      val t = r.getString(0)
      val mine = weighted.filter(_._1 == t)
      assert(r.getLong(1) == mine.length, s"$t n_weighted")
      val tw = mine.map(x => x._3.toDouble * x._2).sum /
        mine.map(_._3.toDouble).sum
      assert(math.abs(r.getDouble(2) - tw) < 1e-4, s"$t twap")
    }
  }
}
