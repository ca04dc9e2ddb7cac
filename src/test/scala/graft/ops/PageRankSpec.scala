package graft.ops

import graft.SparkSuite

class PageRankSpec extends SparkSuite {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5)
      : Map[Long, Double] = {
    val df = edges.toDF("src", "dst")
    PageRank.run(df, "src", "dst", iters, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("mass is conserved: ranks sum to ~1 after damped rounds") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-4, r)
  }

  test("a star hub outranks its leaves") {
    // leaves 1..5 all point at 6; 6 points back at 1 only
    val r = ranks((1L to 5L).map(_ -> 6L) :+ (6L -> 1L))
    assert(r(6L) > r(2L) * 2, r)
    assert((2L to 5L).map(r).distinct.size === 1) // symmetric leaves tie
  }

  test("dangling mass is redistributed, not lost") {
    // 3 is a sink (no out-edges): without redistribution the sum decays
    val r = ranks(Seq((1L, 3L), (2L, 3L), (1L, 2L)), iters = 10)
    assert(math.abs(r.values.sum - 1.0) < 1e-3, r)
    assert(r(3L) > r(1L), r) // the sink still accumulates authority
  }

  test("deterministic under repartitioning") {
    val edges = (0 until 200).map(i =>
      (i.toLong % 20, (i * 7 + 3).toLong % 20))
    val a = PageRank.run(edges.toDF("src", "dst"), "src", "dst", 5, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.run(edges.toDF("src", "dst").repartition(9),
        "src", "dst", 5, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }
}
