package graft.streaming

import graft.SparkSuite
import graft.queries.EventQueries

/** X221 CEP contract: the per-user state machine's append-only match
  * rows must equal the batch range-join + keyed-max form exactly, and
  * every match must respect the strict 30-minute window. */
class PatternStreamSpec extends SparkSuite {

  test("q_stream_pattern ≡ q_pattern_within on the bounded replay; " +
      "gaps strictly inside the window") {
    val batch = EventQueries.patternWithin.fn(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted
    val stream = EventQueries.streamPattern.fn(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted
    assert(batch.nonEmpty, "fixture has no click→purchase pairs")
    assert(stream.toSeq == batch.toSeq,
      "streaming state machine diverged from the batch join")
    batch.foreach { case (_, _, clickUs, purchaseUs, gapUs) =>
      assert(gapUs == purchaseUs - clickUs)
      assert(gapUs > 0 && gapUs < 1800000000L, "strict window")
    }
  }
}
