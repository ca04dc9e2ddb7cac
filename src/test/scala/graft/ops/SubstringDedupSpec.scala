package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Cross-document exact-substring dedup: global first-occurrence
  * semantics on crafted corpora, and the fused SpanRebuild kernel
  * pinned against a composed HOF rebuild. */
class SubstringDedupSpec extends SparkSuite {
  import spark.implicits._

  private def run(texts: Seq[String], k: Int = 3) =
    SubstringDedup.clean(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", col("text"), k)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()

  test("a window repeated in a LATER doc is removed there, kept first") {
    val Array(d0, d1) = run(Seq("a b c d", "x a b c y"))
    assert(d0._5 === "a b c d")          // first occurrence untouched
    assert((d1._3, d1._4) === (1L, 3L))  // one dup window, 3 tokens out
    assert(d1._5 === "x y")
  }

  test("intra-document repeats are also corpus-duplicates") {
    // same doc repeats its own window — global scope covers X53's case
    val Array(d0) = run(Seq("a b c d a b c e"))
    assert(d0._3 === 1L)
    assert(d0._5 === "a b c d e")
  }

  test("overlapping dup windows union across the corpus") {
    val Array(_, d1) = run(Seq("p q r s t", "p q r s t"))
    // every window of doc1 duplicates doc0: all 5 tokens removed
    assert(d1._4 === 5L)
    assert(d1._5 === "")
  }

  test("docs shorter than the window pass through untouched") {
    val rows = run(Seq("only two", "only two"))
    assert(rows.map(_._3).toSeq === Seq(0L, 0L))
    assert(rows.map(_._5).toSeq === Seq("only two", "only two"))
  }

  test("fused SpanRebuild equals the composed HOF rebuild") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(120) { i =>
      val n = rnd.nextInt(30)
      val toks = Seq.fill(n)("abcd".charAt(rnd.nextInt(4)).toString)
      val maxW = math.max(n - 2, 0)
      val dups = (1 to maxW).filter(_ => rnd.nextBoolean())
      (i.toLong, toks.mkString(" "), dups.map(Integer.valueOf).toArray)
    }
    val df = rows.toDF("doc_id", "text", "dups")
    val emptyInts = array().cast("array<int>")
    val toks = graft.functions.Text.tokens(col("text"))
    val rm = array_distinct(flatten(
      transform(col("dups"), p => sequence(p, p + 2))))
    val fused = df.select(col("doc_id"),
        graft.functions.SpanFunctions.spanRebuild(col("text"),
          col("dups"), 3).as("s"))
      .select(col("doc_id"), col("s.n_tokens"), col("s.n_removed"),
        col("s.cleaned_text"))
      .orderBy("doc_id").collect()
    val composed = df
      .select(col("doc_id"), toks.as("toks"), rm.as("rm"))
      .select(col("doc_id"), col("toks"),
        when(size(col("toks")) >= 1,
          filter(sequence(lit(1), size(col("toks"))),
            p => !array_contains(col("rm"), p))).otherwise(emptyInts)
          .as("kept"))
      .select(col("doc_id"),
        size(col("toks")).cast("long"),
        (size(col("toks")) - size(col("kept"))).cast("long"),
        array_join(transform(col("kept"),
          p => element_at(col("toks"), p)), " "))
      .orderBy("doc_id").collect()
    assert(fused.map(_.toSeq).toSeq === composed.map(_.toSeq).toSeq)
  }
}
