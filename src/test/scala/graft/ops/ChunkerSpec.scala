package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSuite {
  import spark.implicits._

  private def toksOf(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  private def chunksOf(text: String, size: Int, overlap: Int) =
    Chunker.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, overlap)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

  test("exact boundaries: size 4, overlap 1, 10 tokens") {
    // stride 3 → starts 1,4,7(,10 suppressed: 10 > 10-1)
    val got = chunksOf(toksOf(10), size = 4, overlap = 1)
    assert(got.map(c => (c._1, c._2, c._3)).toSeq ===
      Seq((1L, 1L, 4L), (2L, 4L, 4L), (3L, 7L, 4L)))
    assert(got(0)._4 === "t1 t2 t3 t4")
    assert(got(1)._4 === "t4 t5 t6 t7") // 1-token overlap visible
    assert(got(2)._4 === "t7 t8 t9 t10")
  }

  test("tail chunk emitted when it adds tokens, suppressed when it " +
      "is a suffix of the previous chunk") {
    // 11 tokens, size 4, overlap 1, stride 3: start 10 ≤ 11-1 → kept,
    // partial (2 tokens)
    val kept = chunksOf(toksOf(11), size = 4, overlap = 1)
    assert(kept.length === 4)
    assert(kept(3) === ((4L, 10L, 2L, "t10 t11")))
    // exactly size tokens → one chunk, no redundant tail
    val one = chunksOf(toksOf(4), size = 4, overlap = 1)
    assert(one.length === 1 && one(0)._3 === 4L)
  }

  test("short and empty documents") {
    assert(chunksOf("a b", 64, 16).toSeq ===
      Seq((1L, 1L, 2L, "a b")))
    assert(chunksOf("", 64, 16).isEmpty)
    assert(chunksOf("   ", 64, 16).isEmpty)
  }

  test("chunking is shuffle-free (no Exchange in the plan)") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val plan = Chunker.chunk(docs, "doc_id", "text", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("every token appears in at least one chunk; consecutive chunks " +
      "share exactly the overlap while saturated") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val chunks = Chunker.chunk(docs, "doc_id", "text", 64, 16)
      .groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_chunk_tokens") - 1).as("covered"),
        count(lit(1)).as("n_chunks"))
    val toks = docs.select(col("doc_id"),
      size(graft.functions.Text.tokens(col("text"))).cast("long").as("n"))
    val bad = chunks.join(toks, "doc_id")
      .filter(col("covered") =!= col("n")).count()
    assert(bad === 0L)
  }
}
