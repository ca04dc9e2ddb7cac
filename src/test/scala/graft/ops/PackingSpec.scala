package graft.ops

import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("concat-and-chunk: offsets accumulate, bins cut at the budget") {
    // token counts: 3, 4, 5, 2 in one stream → offsets 0,3,7,12
    val docs = Seq(
      (1L, "a b c", "s"), (2L, "a b c d", "s"),
      (3L, "a b c d e", "s"), (4L, "a b", "s"))
      .toDF("doc_id", "text", "source")
    val got = Packing.packBins(docs, "text", "source", "doc_id", budget = 5L)
      .select("doc_id", "n_tokens", "start_offset", "bin", "offset_in_bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      (1L, 3L, 0L, 0L, 0L),
      (2L, 4L, 3L, 0L, 3L),  // starts in bin 0, straddles into bin 1
      (3L, 5L, 7L, 1L, 2L),
      (4L, 2L, 12L, 2L, 2L)))
  }

  test("streams pack independently") {
    val docs = Seq(
      (1L, "a b", "x"), (2L, "a b", "y"), (3L, "a b", "x"))
      .toDF("doc_id", "text", "source")
    val got = Packing.packBins(docs, "text", "source", "doc_id", budget = 3L)
      .select("doc_id", "start_offset")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 2L))
  }
}
