package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contracts of the X180–X182 additions: CDC shift resistance (the
  * operator's entire reason to exist), Theil–Sen robustness to a
  * planted outlier, and KMV overlap sanity on constructed corpora. */
class CdcChunkSpec extends SparkSuite {
  import spark.implicits._

  // all-distinct tokens: aperiodic, so shifted fixed-offset windows
  // can never coincide by accident — the contrast stays meaningful
  private val Body = (1 to 120).map(i => s"tok$i").mkString(" ")

  test("cdcChunks: boundaries realign after an inserted prefix " +
      "(shift resistance) — fixed-offset chunking does not") {
    val df = Seq((1L, Body), (2L, s"inserted junk tokens $Body"))
      .toDF("id", "text")
    val ch = Chunker.cdcChunks(df, "id", "text").collect()
    val h1 = ch.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
      .map(_.getLong(4))
    val h2 = ch.filter(_.getLong(0) == 2L).sortBy(_.getLong(1))
      .map(_.getLong(4))
    assert(h1.length > 1, "fixture must cut at least once")
    // after the first cut in the shifted doc, chunks realign: every
    // chunk of doc 1 except possibly the first appears verbatim in
    // doc 2's chunk set
    val shared = h1.tail.toSet.intersect(h2.toSet)
    assert(shared === h1.tail.toSet,
      s"expected full realignment, shared=${shared.size}/${h1.tail.length}")
    // fixed-offset chunking on the same pair shares NOTHING after the
    // shift (the contrast that motivates CDC)
    val fx = Chunker.chunk(df, "id", "text", size = 32, overlap = 0)
      .select(col("id"), md5(col("chunk_text")).as("h")).collect()
    val f1 = fx.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val f2 = fx.filter(_.getLong(0) == 2L).map(_.getString(1)).toSet
    assert(f1.intersect(f2).isEmpty)
  }

  test("cdcChunks: chunks tile the document exactly; short docs give " +
      "one whole-doc chunk") {
    val df = Seq((1L, Body), (2L, "just two"), (3L, "")).toDF("id", "text")
    val ch = Chunker.cdcChunks(df, "id", "text").collect()
    assert(!ch.exists(_.getLong(0) == 3L)) // token-less: no rows
    val doc2 = ch.filter(_.getLong(0) == 2L)
    assert(doc2.length === 1 && doc2.head.getString(5) === "just two")
    val doc1 = ch.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    // tiling: starts follow ends with no gap or overlap, cover 1..n
    var expectStart = 1L
    doc1.foreach { r =>
      assert(r.getLong(2) === expectStart)
      expectStart = r.getLong(2) + r.getLong(3)
    }
    assert(expectStart === Body.split(" ").length + 1)
    // reassembling the chunk texts gives back the token stream
    assert(doc1.map(_.getString(5)).mkString(" ") === Body)
  }

  test("q_theil_sen is robust where OLS is dragged: planted outlier") {
    // y = 2x except one wild day; Theil-Sen slope stays 2, OLS doesn't
    val days = (0L to 20L).map(x => (x, if (x == 10) 500L else 2 * x))
    val slopes = for {
      (xa, ya) <- days; (xb, yb) <- days if xa < xb
    } yield (yb - ya).toDouble / (xb - xa)
    val sorted = slopes.sorted
    val med =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    assert(med === 2.0) // the estimator the query implements
    // and the query's own output on real data: intercept + slope are
    // finite and the pair count is T(T-1)/2 per type
    val rows = graft.SparkEntry.queries("q_theil_sen")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val t = (1 + math.sqrt(1 + 8.0 * n)) / 2 // inverse of T(T-1)/2
      assert(t === math.rint(t), s"n_pairs $n is not triangular")
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
    }
  }

  test("q_source_overlap: estimator identities on the query's rows") {
    val rows = graft.SparkEntry.queries("q_source_overlap")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ea, eb, eu, ei) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      assert(eu >= math.max(ea, eb) - 1e-9) // union ≥ larger side
      assert(ei === math.max(0.0, ea + eb - eu))
      if (!r.isNullAt(6)) {
        val j = r.getDouble(6)
        assert(j >= 0.0 && j <= 1.0 + 1e-9)
        assert(math.abs(j - ei / eu) < 1e-12)
      }
    }
  }
}
