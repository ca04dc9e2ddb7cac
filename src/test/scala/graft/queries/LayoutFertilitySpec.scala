package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Contracts of the X244–X246 operators beyond the oracle hash. */
class LayoutFertilitySpec extends SparkSuite {

  test("q_skipping_eval: each sorted layout aces its own predicate, " +
      "z-order prunes both, row accounting holds") {
    val rows = EventQueries.skippingEval.fn(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("time", "user", "zorder"))
    val by = rows.map(r => r.getString(0) -> r).toMap
    val total = Tables.events(spark, Sf0001).count()
    rows.foreach { r =>
      assert(r.getLong(1) <= 32, "file budget")
      assert(r.getLong(2) < r.getLong(1), "point predicate hits >= 1 file")
      assert(r.getLong(4) <= total && r.getLong(5) <= total)
    }
    // the entity sort must prune the point predicate at least as well
    // as the time sort, and vice versa for the range predicate
    assert(by("user").getLong(2) >= by("time").getLong(2),
      "user sort should win the point predicate")
    assert(by("time").getLong(3) >= by("user").getLong(3),
      "time sort should win the range predicate")
    // z-order must prune SOMETHING on both axes (the whole point)
    assert(by("zorder").getLong(2) > 0 && by("zorder").getLong(3) > 0,
      "z-order pruned nothing on one axis")
  }

  test("q_dedup_weighted_stats: effective docs <= raw docs; weighted " +
      "mean recomputes from fingerprint clusters") {
    val rows = CurationQueries.dedupWeightedStats.fn(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, Sf0001)
      .select(col("source"), col("n_chars"),
        graft.functions.Text.fingerprintMd5(col("text")).as("fp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val csize = docs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src)
      assert(r.getLong(1) == mine.length)
      val w = mine.map(d => 1.0 / csize(d._3))
      val wx = mine.map(d => d._2.toDouble / csize(d._3))
      assert(math.abs(r.getDouble(3) - wx.sum / w.sum) < 1e-4,
        s"$src weighted mean")
      assert(r.getDouble(4) <= r.getLong(1) + 1e-9, "effective <= raw")
    }
  }

  test("q_tokenizer_fertility: unit hierarchies hold per language") {
    val rows = TextQueries.tokenizerFertility.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3), "bytes >= chars (UTF-8)")
      assert(r.getLong(4) >= r.getLong(5),
        "subwords >= whitespace words")
      assert(r.getDouble(7) >= 1.0 - 1e-9, "fertility >= 1")
      assert(r.getDouble(6) > 0.0)
    }
    // the synthetic corpus is ASCII for every lang tag, so bytes ==
    // chars exactly — pin that the byte lane is real, not a copy of
    // the char lane with drift (equality IS the ASCII contract here)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(3),
      s"${r.getString(0)}: ASCII corpus must have bytes == chars"))
  }
}
