package graft.ops

import graft.SparkSuite

class HitsSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 3)
      : Map[Long, (Double, Double)] =
    Hits.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap

  test("star: the centre is the only hub, leaves split authority") {
    val h = run(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(h(1L)._1 === 1.0)            // all hub mass
    assert(h(1L)._2 === 0.0)            // no in-links -> no authority
    Seq(2L, 3L, 4L).foreach { v =>
      assert(h(v)._1 === 0.0)
      assert(math.abs(h(v)._2 - 1.0 / 3) < 1e-5, s"auth($v)")
    }
  }

  test("hub and authority scores each sum to ~1 (L1-normalized)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val h = run(edges)
    assert(math.abs(h.values.map(_._1).sum - 1.0) < 1e-4)
    assert(math.abs(h.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("shared authority boosts its hubs, big hub boosts its targets") {
    // 1 -> {3,4}, 2 -> {3}: node 3 is endorsed twice -> top authority;
    // node 1 points at more good targets -> top hub
    val h = run(Seq((1L, 3L), (1L, 4L), (2L, 3L)))
    assert(h(1L)._1 > h(2L)._1)
    assert(h(3L)._2 > h(4L)._2)
  }

  test("self-loop-only node stays in the universe with zero scores") {
    val h = run(Seq((1L, 2L), (2L, 1L), (5L, 5L)))
    assert(h.contains(5L))
    assert(h(5L) === ((0.0, 0.0)))
  }

  test("duplicate edges don't change scores (distinct edge set)") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(base ++ base) === run(base))
  }
}
