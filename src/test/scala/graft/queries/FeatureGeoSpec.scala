package graft.queries

import graft.{SparkSuite, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Contracts of the X215–X217 operators beyond the oracle hash:
  * WOE/IV accounting identities, Kneser–Ney properness (each
  * context's smoothed distribution sums to 1), and grid-join
  * completeness against a brute-force all-pairs recompute. */
class FeatureGeoSpec extends SparkSuite {

  test("q_woe_iv: bucket accounting, iv_total recomputes, woe sign " +
      "tracks the odds direction") {
    val rows = StatsQueries.woeIv.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val (gt, bt) = (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1), "good+bad=n")
    }
    val ivTotal = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) === ivTotal))
    assert(math.abs(ivTotal - rows.map(_.getDouble(5)).sum) < 1e-5)
    assert(ivTotal >= 0.0, "IV is a sum of (gap * same-sign-log) terms")
    rows.foreach { r =>
      val gs = (r.getLong(2) + 0.5) / gt.toDouble
      val bs = (r.getLong(3) + 0.5) / bt.toDouble
      assert((r.getDouble(4) > 0) == (gs > bs) ||
        math.abs(r.getDouble(4)) < 1e-9, s"bucket ${r.getLong(0)} sign")
    }
  }

  test("q_lm_kneser_ney: per-context distributions sum to 1; " +
      "per-doc entropies positive; empty docs null") {
    // refit the bounded-alphabet KN tables directly from tokens
    val toks = Tables.documents(spark, Sf0001)
      .select(Text.tokens(col("text")).as("t")).collect()
      .map(_.getSeq[String](0))
    val top = toks.flatten.groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(24).map(_._1)
      .zipWithIndex.toMap
    def cid(t: String) = top.getOrElse(t, 24)
    val pairs = toks.flatMap(ts => ts.map(cid).sliding(2)
      .collect { case Seq(a, b) => (a, b) })
    val pc = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val lt = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1r = pc.keys.groupBy(_._1).view.mapValues(_.size).toMap
    val n1l = pc.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val tt = pc.size.toDouble
    val cbs = pc.keys.map(_._2).toSeq.distinct
    lt.keys.foreach { ca =>
      // proper distribution: sum over ALL cb of the interpolated form
      val total = cbs.map { cb =>
        val c = pc.getOrElse((ca, cb), 0L)
        val disc = if (c > 0) (c - 0.75) / lt(ca) else 0.0
        disc + ((0.75 * n1r(ca)) / lt(ca)) * (n1l(cb) / tt)
      }.sum
      // sums to 1 exactly when every cb with continuation mass is
      // reachable; the discount mass covers the unseen pairs
      assert(total <= 1.0 + 1e-9, s"ca=$ca over-allocates: $total")
      assert(total >= 0.9, s"ca=$ca mass far from 1: $total")
    }
    val rows = TextQueries.lmKneserNey.fn(spark, Sf0001).collect()
    rows.foreach { r =>
      if (r.getLong(1) == 0) assert(r.isNullAt(2))
      else assert(r.getDouble(2) > 0.0, s"doc ${r.getLong(0)}")
    }
  }

  test("q_geo_pairs: grid join finds EXACTLY the brute-force " +
      "top-200 nearest pairs within the radius") {
    val rows = GeoQueries.geoPairs.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "a < b")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 79.0,
        "0.5 deg radius at <10 deg lat is < 79 km")
    }
    // brute-force replay of the SAME hash coordinates
    def u32(salt: String, k: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$salt$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble
    }
    val ids = Tables.customer(spark, Sf0001)
      .select("c_custkey").collect().map(_.getLong(0))
    val pts = ids.map(k => (k, u32("geo-lat:", k) * 10.0 / 4294967296.0,
      u32("geo-lon:", k) * 10.0 / 4294967296.0))
    val brute = (for {
      (a, alat, alon) <- pts; (b, blat, blon) <- pts
      if a < b
      if (alat - blat) * (alat - blat) +
         (alon - blon) * (alon - blon) < 0.25
    } yield {
      val hdlat = math.sin(((alat - blat) * math.Pi / 180.0) / 2.0)
      val hdlon = math.sin(((alon - blon) * math.Pi / 180.0) / 2.0)
      val h = hdlat * hdlat + math.cos(alat * math.Pi / 180.0) *
        math.cos(blat * math.Pi / 180.0) * hdlon * hdlon
      val km = 2.0 * 6371.0 * math.asin(math.sqrt(h))
      (a, b, math.floor(km * 1e6 + 0.5) / 1e6)
    }).sortBy { case (a, b, km) => (km, a, b) }.take(200)
    assert(rows.length == math.min(200, brute.length))
    rows.zip(brute).foreach { case (r, (a, b, km)) =>
      assert(r.getLong(0) == a && r.getLong(1) == b,
        s"pair mismatch: (${r.getLong(0)},${r.getLong(1)}) vs ($a,$b)")
      assert(math.abs(r.getDouble(2) - km) < 1e-6)
    }
  }
}
