package graft.queries

import graft.{SparkSuite, Tables}
import graft.functions.DamerauLevenshtein
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** Contracts of the X229–X232 operators beyond the oracle hash. */
class DriftKernelSpec extends SparkSuite {

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.compute(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("DamerauLevenshtein kernel: unrestricted-metric semantics " +
      "(DuckDB-pinned probes), symmetry, and dl <= lev on the join") {
    assert(dl("abc", "abc") == 0)
    assert(dl("", "abc") == 3 && dl("abc", "") == 3)
    assert(dl("abcd", "acbd") == 1) // one transposition
    // the OSA-divergent probe: transpose then insert INSIDE the pair
    assert(dl("ca", "abc") == 2, "must be unrestricted DL, not OSA")
    assert(dl("kitten", "sitting") == 3)
    val pairs = Seq(("banana", "ananas"), ("qwerty", "qewrty"),
      ("spark", "sprak"), ("abcdef", "fedcba"))
    pairs.foreach { case (a, b) => assert(dl(a, b) == dl(b, a)) }
    val rows = SimilarityQueries.fuzzyJoinDl.fn(spark, Sf0001).collect()
    rows.foreach { r =>
      assert(r.getInt(4) <= 2, "gate")
      assert(r.getInt(4) <= r.getInt(5),
        "transposition credit can only lower the distance")
    }
  }

  test("q_wasserstein_drift: nonnegative metric, full pair matrix, " +
      "one pair re-derived directly from the raw lengths") {
    val rows = StatsQueries.wassersteinDrift.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
    val k = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.length
    assert(rows.length == k * (k - 1) / 2, "full source-pair matrix")
    // independent recompute of the first pair's W1
    val r0 = rows.head
    val (sa, sb) = (r0.getString(0), r0.getString(1))
    val lens = Tables.documents(spark, Sf0001)
      .filter(col("source").isin(sa, sb))
      .select("source", "n_chars").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val maxV = lens.values.flatten.max
    def cdf(xs: Seq[Long], v: Long) =
      xs.count(_ <= v).toDouble / xs.length
    val w1 = (0L to maxV)
      .map(v => math.abs(cdf(lens(sa), v) - cdf(lens(sb), v))).sum
    assert(math.abs(r0.getDouble(4) - w1) < 1e-4, s"$sa/$sb W1")
    // metric triangle inequality over the first three sources
    val bySrc = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    def w(a: String, b: String) =
      if (a < b) bySrc((a, b)) else bySrc((b, a))
    val srcs = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted.take(3)
    if (srcs.length == 3) {
      val Seq(a, b, c) = srcs.toSeq
      assert(w(a, c) <= w(a, b) + w(b, c) + 1e-5, "triangle inequality")
    }
  }

  test("q_forget_audit: deletes conserve rows and leave ZERO dangling " +
      "references on every table") {
    val rows = WarehouseQueries.forgetAudit.fn(spark, Sf0001).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"${r.getString(0)}: before = deleted + after")
      assert(r.getLong(4) == 0L,
        s"${r.getString(0)}: ${r.getLong(4)} dangling references")
      assert(r.getLong(2) > 0, s"${r.getString(0)}: delete set empty")
    }
  }

  test("q_platt_scaling: starts at ln 2, loss descends, weights move") {
    val rows = TextQueries.plattScaling.fn(spark, Sf0001).collect()
    assert(rows.length == 6)
    assert(rows.head.getDouble(3) == 0.693147, "loss at sigma(0) = ln 2")
    assert(rows.last.getDouble(3) < rows.head.getDouble(3), "descent")
    // the synthetic corpus's stopword ratio need not correlate with
    // the lang label — the contract is CALIBRATION (loss descent),
    // not signal direction; only require the fit actually moved
    assert(rows.last.getDouble(1) != 0.0 || rows.last.getDouble(2) != 0.0)
  }
}
