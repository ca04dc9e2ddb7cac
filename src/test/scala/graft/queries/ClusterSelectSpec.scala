package graft.queries

import graft.{SparkSuite, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Contracts of the X212–X214 clustering / selection / retrieval
  * operators beyond the oracle hash. */
class ClusterSelectSpec extends SparkSuite {

  test("q_kmeans_lloyd: full cluster universe, counts add up, cosine " +
      "lanes in range") {
    val rows = ClusterQueries.kmeansLloyd.fn(spark, Sf0001).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 8))
    val total = Tables.embeddings(spark, Sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.filter(_.getLong(1) > 0).foreach { r =>
      val (avgCos, minCos) = (r.getDouble(2), r.getDouble(3))
      assert(avgCos >= -1.0 - 1e-9 && avgCos <= 1.0 + 1e-9)
      assert(minCos <= avgCos + 1e-9)
    }
    rows.filter(_.getLong(1) == 0).foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3), "empty cluster stats")
    }
  }

  test("q_coverage_select: greedy gains non-increasing, coverage " +
      "cumulative, picks distinct") {
    val rows = ClusterQueries.coverageSelect.fn(spark, Sf0001).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5))
    val gains = rows.map(_.getLong(2))
    gains.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "submodular greedy gain grew")
      case _ =>
    }
    // each round adds exactly `gain` NEW shingles to the union
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(2)
      assert(r.getLong(3) == cum, s"round ${r.getInt(0)} coverage")
    }
    assert(rows.map(_.getLong(1)).distinct.length == 5, "re-picked a doc")
  }

  test("q_phrase_search: every hit doc really contains the phrase " +
      "adjacently; counts match a direct recount") {
    val rows = RetrievalQueries.phraseSearch.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val phrase = rows.head.getString(2)
    assert(rows.forall(_.getString(2) == phrase))
    val Array(w1, w2) = phrase.split(" ", 2)
    val toks = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), Text.tokens(lower(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      val t = toks(r.getLong(0))
      val direct = t.indices.dropRight(1)
        .count(i => t(i) == w1 && t(i + 1) == w2)
      assert(direct == r.getLong(1), s"doc ${r.getLong(0)} recount")
      assert(direct >= 1)
    }
    // completeness: no doc with an occurrence is missing from the hits
    val hitIds = rows.map(_.getLong(0)).toSet
    toks.foreach { case (id, t) =>
      val has = t.indices.dropRight(1)
        .exists(i => t(i) == w1 && t(i + 1) == w2)
      assert(has == hitIds.contains(id), s"doc $id completeness")
    }
  }
}
