package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Contracts of the X247–X249 operators beyond the oracle hash. */
class TauEntropySpec extends SparkSuite {

  test("q_matryoshka: recall degrades (on average) as dims shrink; " +
      "lanes consistent") {
    val rows = AnalyticsQueries.matryoshka.fn(spark, Sf0001).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 10)
      assert(r.getDouble(3) == r.getLong(2) / 10.0)
    }
    def meanAt(k: Int) = {
      val v = rows.filter(_.getInt(0) == k).map(_.getDouble(3))
      v.sum / v.length
    }
    assert(meanAt(32) >= meanAt(8),
      s"32-dim recall ${meanAt(32)} below 8-dim ${meanAt(8)}")
    assert(meanAt(32) > 0.0, "32-dim truncation should retain signal")
  }

  test("q_entropy_rate: conditional entropies bounded by log2|types|, " +
      "rate recomputes, from-distribution sums to 1") {
    val rows = DiagnosticsQueries.entropyRate.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val k = rows.length
    val maxH = math.log(k.toDouble) / math.log(2.0)
    val rate = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == rate))
    var piSum = 0.0
    var recomputed = 0.0
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= maxH + 1e-9,
        s"${r.getString(0)} h_cond")
      piSum += r.getDouble(2)
      recomputed += r.getDouble(2) * r.getDouble(3)
    }
    assert(math.abs(piSum - 1.0) < 1e-9)
    assert(math.abs(rate - recomputed) < 1e-4)
  }

  test("q_kendall_tau: tau bounded, pair accounting complete, " +
      "matches a direct recount") {
    val r = DiagnosticsQueries.kendallTau.fn(spark, Sf0001).head()
    assert(r.getLong(0) == 50L * 49 / 2)
    val (c, d) = (r.getLong(1), r.getLong(2))
    assert(c + d + r.getLong(3) + r.getLong(4) <= r.getLong(0))
    if (!r.isNullAt(5)) {
      assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
      // direct recount from the carve
      val g = Tables.documents(spark, Sf0001)
        .groupBy((col("doc_id") % 50).as("dom"))
        .agg(sum("n_chars").as("x"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("y"))
        .collect().map(row => (row.getLong(1), row.getLong(2)))
      var (cc, dd2) = (0L, 0L)
      for (i <- g.indices; j <- g.indices if i < j) {
        val s0 = (g(i)._1 - g(j)._1) * (g(i)._2 - g(j)._2)
        if (s0 > 0) cc += 1 else if (s0 < 0) dd2 += 1
      }
      assert(c == cc && d == dd2, "concordance recount")
    }
  }
}
