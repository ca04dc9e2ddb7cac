package graft.streaming

import graft.SparkSuite
import graft.queries.WarehouseQueries

/** X259 streaming-SCD2 contract: the per-user state machine's
  * append-only closed intervals must equal the batch X210 build
  * restricted to closed rows, and intervals must tile each user's
  * timeline (contiguous, version-ordered, no overlap). */
class Scd2StreamSpec extends SparkSuite {

  test("q_stream_scd2 ≡ q_scd2_build closed intervals on the bounded " +
      "replay; intervals tile per user") {
    val batch = WarehouseQueries.scd2Build.fn(spark, Sf0001).collect()
      .filter(!_.isNullAt(4)) // closed intervals only
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getString(2), r.getLong(3), r.getLong(4))).sorted
    val stream = WarehouseQueries.streamScd2.fn(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sorted
    assert(batch.nonEmpty, "fixture has no type changes")
    assert(stream.toSeq == batch.toSeq,
      "streaming SCD2 state machine diverged from the batch build")
    // per user: versions 1..k, each interval ends where the next
    // begins, types change at every boundary
    stream.groupBy(_._1).foreach { case (_, rows) =>
      val byV = rows.sortBy(_._2)
      assert(byV.map(_._2).toSeq == (1L to byV.length).toSeq)
      byV.sliding(2).foreach {
        case Array((_, _, t1, _, to1), (_, _, t2, from2, _)) =>
          assert(to1 == from2, "intervals must be contiguous")
          assert(t1 != t2, "a version boundary must change the type")
        case _ => ()
      }
      byV.foreach { case (_, _, _, from, to) => assert(from < to) }
    }
  }
}
