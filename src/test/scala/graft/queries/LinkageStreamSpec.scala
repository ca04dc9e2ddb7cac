package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Contracts of the X177–X179 additions beyond the oracle hash:
  * Mann–Whitney against a driver-side brute force, Fellegi–Sunter
  * weights recomputed from each row's own agreement pattern, and the
  * streaming EWMA recursion recomputed from its own emitted rows. */
class LinkageStreamSpec extends SparkSuite {

  test("q_mannwhitney: U statistics match a driver-side brute force " +
      "with average ranks") {
    val r = SparkEntry.queries("q_mannwhitney")(spark, Sf0001).head()
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    val (uA, uB) = (r.getDouble(4), r.getDouble(5))
    assert(uA + uB === nA.toDouble * nB)
    // brute force: collect dwell values + cohorts, average ranks
    val dw = SparkEntry.queries("q_interval_union")(spark, Sf0001)
      .select(col("user_id"), col("active_us")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    def md5mod(prefix: String, k: Long, m: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest((prefix + k.toString).getBytes("UTF-8"))
      val hex = h.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % m
    }
    val vals = dw.map { case (u, v) => (v, md5mod("ab:", u, 2)) }
    val sorted = vals.sortBy(_._1)
    // average rank per value (1-based over the pooled sample)
    val rankOf = sorted.map(_._1).zipWithIndex
      .groupBy(_._1).map { case (v, xs) =>
        v -> (xs.map(_._2 + 1).sum.toDouble / xs.length)
      }
    val ra = vals.filter(_._2 == 0L).map(t => rankOf(t._1)).sum
    val bnA = vals.count(_._2 == 0L).toLong
    val bnB = vals.count(_._2 == 1L).toLong
    assert(nA === bnA && nB === bnB)
    assert(math.abs(r.getDouble(3) - ra) < 1e-9) // rank_sum_a
    val bUA = ra - bnA * (bnA + 1) / 2.0
    assert(math.abs(uA - bUA) < 1e-9)
    // z sign agrees with which side's ranks run higher
    if (!r.isNullAt(6))
      assert((r.getDouble(6) > 0) === (uA > bnA.toDouble * bnB / 2.0)
        || r.getDouble(6) === 0.0)
  }

  test("q_fellegi_sunter: weight recomputes from each row's own " +
      "agreement pattern; verdict matches the thresholds") {
    def w(m: Double, u: Double) =
      (math.log(m / u) / math.log(2.0),
        math.log((1.0 - m) / (1.0 - u)) / math.log(2.0))
    val (wNameA, wNameD) = w(0.95, 0.10)
    val (wBrandA, wBrandD) = w(0.95, 0.04)
    val (wContA, wContD) = w(0.95, 1.0 / 6.0)
    val rows = SparkEntry.queries("q_fellegi_sunter")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val jw = r.getDouble(6)
      val want =
        (if (jw >= 0.9) wNameA else wNameD) +
        (if (r.getString(1) == r.getString(4)) wBrandA else wBrandD) +
        (if (r.getString(2) == r.getString(5)) wContA else wContD)
      assert(r.getDouble(7) === want)
      assert(r.getDouble(7) > 0.0)
      assert(r.getString(8) ===
        (if (r.getDouble(7) >= 6.0) "match" else "possible"))
      // pair order is strict: no self-pairs, no duplicates
      assert((r.getString(0), r.getString(1), r.getString(2)) !=
        ((r.getString(3), r.getString(4), r.getString(5))))
    }
  }

  test("q_stream_ewma: the emitted rows satisfy the recursion " +
      "e1 = x1, e = (1-λ)e + λx, ratio = x / e_prev") {
    val lambda = 0.3
    val rows = SparkEntry.queries("q_stream_ewma")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (typ, rs) =>
      val ordered = rs.sortBy(_.getDate(1).toString)
      var prev: Option[Double] = None
      ordered.foreach { r =>
        val x = r.getLong(2).toDouble
        val want = prev match {
          case None    => x
          case Some(p) => (1.0 - lambda) * p + lambda * x
        }
        assert(r.getDouble(3) === want, s"$typ ${r.getDate(1)}")
        prev match {
          case None =>
            assert(r.isNullAt(4) && r.isNullAt(5))
          case Some(p) =>
            assert(r.getDouble(4) === x / p)
            assert(r.getBoolean(5) === (x / p > 1.5))
        }
        prev = Some(want)
      }
    }
  }
}
