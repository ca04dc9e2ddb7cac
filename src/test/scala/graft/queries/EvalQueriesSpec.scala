package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Contracts of the round-10 measurement/analysis queries beyond the
  * oracle hash: the metrics they emit must MEAN what they claim. */
class EvalQueriesSpec extends SparkSuite {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, Sf0001)

  test("q_quantile_sketch: estimates track exact quantiles") {
    val est = run("q_quantile_sketch").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = spark.read
      .parquet(s"$Sf0001/lineitem.parquet")
      .agg(percentile(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.9), lit(0.99))))
      .head().getSeq[Double](0)
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    // ~256 clustered samples of 6k rows: generous bound here; the
    // sf0.01 calibration in the scaladoc sits at 1–6% relative error
    qs.zip(exact).foreach { case (q, ex) =>
      val rel = math.abs(est(q) - ex) / ex
      assert(rel < 0.25, s"q=$q est=${est(q)} exact=$ex rel=$rel")
    }
    // order statistics from one sorted sample are monotone by
    // construction — a violation means the index arithmetic broke
    assert(qs.map(est) === qs.map(est).sorted)
  }

  test("q_script_id: planted script runs dominate as designed") {
    val rows = run("q_script_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val cyr = r.getInt(2)
      if (id % 5 == 0) {
        // undressed docs are ASCII: zero non-Latin codepoints
        assert(cyr === 0, s"doc $id")
        assert(r.getString(6) === "latin", s"doc $id")
      }
      if (id % 5 == 1)
        // ≥4 repeats of a 9-letter Cyrillic run
        assert(cyr >= 36, s"doc $id cyr=$cyr")
    }
    // ratio is max/total: in (0, 1] wherever any letter exists
    rows.filter(r => !r.isNullAt(7)).foreach { r =>
      val ratio = r.getDouble(7)
      assert(ratio > 0.0 && ratio <= 1.0, r)
    }
  }

  test("q_classifier_eval: metric identities and learnable signal") {
    val r = run("q_classifier_eval").head()
    val (nPos, nNeg) = (r.getLong(0), r.getLong(1))
    val (tp, fp, fn) = (r.getLong(2), r.getLong(3), r.getLong(4))
    val auc = r.getDouble(5)
    assert(nPos === tp + fn)   // every positive is tp or fn
    assert(nPos + nNeg >= tp + fp + fn)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(auc > 0.5, s"classifier should beat chance, auc=$auc")
    val f1 = r.getDouble(8)
    assert(math.abs(f1 - 2.0 * tp / (2.0 * tp + fp + fn)) < 1e-6)
  }

  test("q_temperature_mix: α<1 upweights the low-resource pool") {
    val rows = run("q_temperature_mix").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val (rawLow, shareLow, _) = rows("low")
    val (rawHigh, shareHigh, _) = rows("high")
    assert(shareLow > rawLow, rows)   // low-resource pulled UP
    assert(shareHigh < rawHigh, rows) // high-resource pushed DOWN
    // largest-remainder apportionment is exactly exhaustive
    assert(rows.values.map(_._3).sum === 200L)
  }

  test("q_curation_audit: reason encodes the first failing policy") {
    val rows = run("q_curation_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cont, qok, dup) =
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))
      val (reason, kept) = (r.getString(4), r.getBoolean(5))
      val expected =
        if (cont) "contaminated"
        else if (!qok) "quality"
        else if (dup) "duplicate"
        else "kept"
      assert(reason === expected, r)
      assert(kept === (reason == "kept"), r)
    }
    // the fixture exercises every branch
    assert(rows.map(_.getString(4)).distinct.sorted ===
      Seq("contaminated", "duplicate", "kept", "quality"))
  }

  test("q_ann_recall: recall bounded, exact baseline would be 1.0") {
    val rows = run("q_ann_recall").collect()
    assert(rows.length === 10) // 2 methods × 5 queries
    rows.foreach { r =>
      val (hits, rec) = (r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= 10, r)
      assert(math.abs(rec - hits / 10.0) < 1e-12, r)
    }
    // the probed-IVF path sees far more true candidates than the
    // 4-plane LSH buckets on this corpus — the eval must expose that
    val mean = rows.groupBy(_.getString(0))
      .map { case (m, rs) => m -> rs.map(_.getDouble(3)).sum / rs.size }
    assert(mean("ivf") > mean("lsh"), mean)
  }
}
