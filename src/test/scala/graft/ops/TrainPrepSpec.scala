package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSuite {
  import spark.implicits._

  test("deterministic and partitioning-independent") {
    val df = (0 until 1000).map(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", 100, "t:")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", 100, "t:")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a.size === 100 && a === b)
  }

  test("selection is weight-biased: heavy rows dominate the sample") {
    // 100 ids at weight 50 vs 900 at weight 1 — heavy mass 5000 vs 900;
    // in a k=200 draw essentially every heavy id should win a slot
    val df = (0 until 1000)
      .map(i => (i.toLong, if (i < 100) 50L else 1L)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 200, "bias:")
      .select("id").collect().map(_.getLong(0))
    val heavy = got.count(_ < 100)
    assert(heavy > 90, s"only $heavy of 100 heavy ids sampled")
  }

  test("k >= n keeps everything; zero/negative weight rejected by contract") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 10, "s:")
    assert(got.count() === 2)
  }

  test("plan is a TakeOrdered, not a global sort") {
    val df = (0 until 100).map(i => (i.toLong, 1L)).toDF("id", "w")
    val plan = Sampling.weightedSample(df, "id", "w", 5, "p:")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}

class FimSpec extends SparkSuite {
  import spark.implicits._

  test("applied rows reassemble to the original text; skipped pass through") {
    val docs = Tables.documents(spark, Sf0001)
    val rows = Fim.transform(docs, "doc_id", "text", rate = 0.5, "fs:")
      .select("doc_id", "text", "fim_applied", "lo", "hi", "psm", "spm")
      .collect()
    val applied = rows.filter(_.getBoolean(2))
    assert(applied.nonEmpty && applied.length < rows.length)
    rows.foreach { r =>
      val (text, lo, hi) = (r.getString(1), r.getLong(3).toInt,
        r.getLong(4).toInt)
      if (r.getBoolean(2)) {
        val (p, m, sfx) = (text.substring(0, lo), text.substring(lo, hi),
          text.substring(hi))
        assert(r.getString(5) ===
          s"${Fim.Pre}$p${Fim.Suf}$sfx${Fim.Mid}$m")
        assert(r.getString(6) ===
          s"${Fim.Pre}${Fim.Suf}$sfx${Fim.Mid}$p$m")
      } else {
        assert(r.getString(5) === text && r.getString(6) === text)
      }
    }
  }

  test("rate 0 and 1 are total; cuts stay within [0, n]") {
    val docs = Seq((1L, "abcdef"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val none = Fim.transform(docs, "doc_id", "text", 0.0, "z:")
      .filter(col("fim_applied")).count()
    assert(none === 0)
    val all = Fim.transform(docs, "doc_id", "text", 1.0, "z:")
      .select("doc_id", "text", "lo", "hi").collect()
    assert(all.length === 3)
    all.foreach { r =>
      val n = r.getString(1).length
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(3) &&
        r.getLong(3) <= n)
    }
  }

  test("deterministic across partitioning") {
    val docs = Tables.documents(spark, Sf0001)
    val a = Fim.transform(docs, "doc_id", "text", 0.5, "d:")
      .select("doc_id", "psm").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Fim.transform(docs.repartition(11), "doc_id", "text", 0.5, "d:")
      .select("doc_id", "psm").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }
}

class PackSegmentsSpec extends SparkSuite {
  import spark.implicits._

  test("segment ids number documents within each (stream, bin); straddlers flagged") {
    // tokens: 3, 4, 5, 2 → offsets 0,3,7,12; budget 5 → bins 0,0,1,2
    val docs = Seq(
      (1L, "a b c", "s"), (2L, "a b c d", "s"),
      (3L, "a b c d e", "s"), (4L, "a b", "s"))
      .toDF("doc_id", "text", "source")
    val got = Packing.packSegments(docs, "text", "source", "doc_id", 5L)
      .select("doc_id", "bin", "segment_id", "truncated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got === Set(
      (1L, 0L, 1L, false),
      (2L, 0L, 2L, true),   // 3 + 4 > 5: straddles the bin-0 cut
      (3L, 1L, 1L, true),   // 2 + 5 > 5
      (4L, 2L, 1L, false)))
  }

  test("windows are keyed — no partition-less WindowExec in the plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = Seq((1L, "a b", "s")).toDF("doc_id", "text", "source")
    val sp = Packing.packSegments(docs, "text", "source", "doc_id", 5L)
      .queryExecution.sparkPlan
    val windows = sp.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, sp.toString))
  }
}
