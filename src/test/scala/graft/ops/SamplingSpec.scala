package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("hashSample is reproducible and partitioning-independent") {
    val docs = Tables.documents(spark, Sf0001)
    val a = Sampling.hashSample(docs, "doc_id", 0.3, "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.3, "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("rate lands near p and disjoint salts are independent") {
    val n = 2000
    val df = (0 until n).map(_.toLong).toDF("id")
    val s1 = Sampling.hashSample(df, "id", 0.5, "salt-a")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(df, "id", 0.5, "salt-b")
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(s1.size.toDouble / n - 0.5) < 0.05)
    // independence: overlap ≈ p² ± a few sigma, far from 0 or p
    val overlap = (s1 intersect s2).size.toDouble / n
    assert(overlap > 0.15 && overlap < 0.35, s"overlap $overlap")
  }

  test("nested rates: sample(p) ⊆ sample(q) for p < q under one salt") {
    val df = (0 until 1000).map(_.toLong).toDF("id")
    val small = Sampling.hashSample(df, "id", 0.1, "s")
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(df, "id", 0.4, "s")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }
}

class ContaminationSpec extends SparkSuite {
  import spark.implicits._

  test("benchmark members score 1.0, disjoint docs 0.0, overlap fractional") {
    val mk = (i: Int, words: Seq[String]) => (i.toLong, words.mkString(" "))
    val a = (1 to 20).map(i => s"w$i")         // benchmark doc
    val half = (1 to 12).map(i => s"w$i") ++ (50 to 57).map(i => s"x$i")
    val other = (100 to 120).map(i => s"z$i")  // disjoint
    val corpus = Seq(mk(1, a), mk(2, half), mk(3, other))
      .toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 1L)
    val got = Contamination.ngramOverlap(corpus, bench, "doc_id", "text",
        k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L)._3 === 1.0)
    assert(got(3L)._3 === 0.0)
    // half: 13 8-grams total (20-8+1); hits = those within w1..w12+? —
    // 8-grams fully inside w1..w12 of the SAME order as a: positions
    // 1..5 of a's grams (w1..w8 ... w5..w12) = 5 of 13
    assert(got(2L)._1 === 13L && got(2L)._2 === 5L)
  }

  test("counts are distinct-shingle counts (repeated 8-grams count once)") {
    val rep = ((1 to 8) ++ (1 to 8) ++ (1 to 8)).map(i => s"w$i")
    val corpus = Seq((1L, rep.mkString(" "))).toDF("doc_id", "text")
    val got = Contamination.ngramOverlap(corpus, corpus, "doc_id", "text",
        k = 8).collect().head
    // 24 tokens → 17 positional grams, but only 8 distinct cyclic forms
    assert(got.getLong(1) === 8L)
    assert(got.getDouble(3) === 1.0)
  }
}
