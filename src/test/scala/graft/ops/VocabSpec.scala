package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSuite {
  import spark.implicits._

  test("topK: frequency order with lexicographic tie at the cut") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a d c")).toDF("doc_id", "text")
    // counts: b=3, a=3, c=2, d=1; k=3 → {a, b, c}; k=1 → ties a/b
    // break lexicographically → a... no: count DESC first (a=3,b=3),
    // then tok ASC → a wins rank 1
    val top3 = Vocab.topK(docs, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top3.toSeq === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
    val top1 = Vocab.topK(docs, "text", 1).collect().map(_.getString(0))
    assert(top1.toSeq === Seq("a"))
  }

  test("oovStats: exact counts; token-less docs keep a NULL-rate row") {
    val docs = Seq(
      (1L, "a b zz a"),
      (2L, "   "),
      (3L, "qq ww")).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("tok")
    val got = Vocab.oovStats(docs, vocab, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) === 4L && got(0).getLong(2) === 1L)
    assert(got(0).getDouble(3) === 0.25)
    assert(got(1).getLong(1) === 0L && got(1).getLong(2) === 0L)
    assert(got(1).isNullAt(3))
    assert(got(2).getLong(1) === 2L && got(2).getLong(2) === 2L)
    assert(got(2).getDouble(3) === 1.0)
  }

  test("oovStats plan: vocab side broadcast, corpus not shuffled for it") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val vocab = Vocab.topK(docs, "text", 20)
    val plan = Vocab.oovStats(docs, vocab, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast:\n$plan")
  }
}
