package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** ops.NegativeSampling — stateless md5 draws, positive rejection,
  * probe-order ranks, and the short-fill contract. */
class NegativeSamplingSpec extends SparkSuite {
  import spark.implicits._

  private val pos = Seq(
    (1L, 0L), (1L, 1L), (1L, 2L),
    (2L, 5L)).toDF("u", "i")

  test("k negatives per user, never a positive, ranks in probe order") {
    val out = NegativeSampling.perUser(pos, "u", "i",
        nItems = 100L, k = 3, slack = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byUser = out.groupBy(_._1)
    assert(byUser.keySet === Set(1L, 2L))
    byUser.foreach { case (u, rows) =>
      assert(rows.length === 3)
      assert(rows.map(_._4).sorted.toSeq === Seq(1L, 2L, 3L))
      // ranks follow probe order
      assert(rows.sortBy(_._4).map(_._3).toSeq ===
        rows.map(_._3).sorted.toSeq)
      val posSet = pos.filter(col("u") === u).collect()
        .map(_.getLong(1)).toSet
      rows.foreach { case (_, item, _, _) =>
        assert(!posSet.contains(item))
        assert(item >= 0L && item < 100L)
      }
    }
  }

  test("deterministic: same inputs, same draws, any partitioning") {
    val a = NegativeSampling.perUser(pos, "u", "i", 100L, 3)
      .collect().map(_.toSeq).toSet
    val b = NegativeSampling.perUser(pos.repartition(7), "u", "i", 100L, 3)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("rejection consumes probes: a tiny item space can fill short " +
      "(recorded contract)") {
    // user 1 holds 3 of 4 items: probes landing on positives are
    // rejected; with 6 probes over 4 items some draws repeat the one
    // negative item — at most 3 rows, all of item 3
    val dense = Seq((1L, 0L), (1L, 1L), (1L, 2L)).toDF("u", "i")
    val out = NegativeSampling.perUser(dense, "u", "i",
        nItems = 4L, k = 3, slack = 3).collect()
    assert(out.forall(_.getLong(1) === 3L))
    assert(out.length <= 3)
  }
}
