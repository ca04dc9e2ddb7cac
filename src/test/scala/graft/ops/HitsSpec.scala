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

  private def runSeeded(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int): Map[Long, (Option[Double], Option[Double])] =
    Hits.runSeeded(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("v"), iters)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap

  test("seeded: root-set restriction scores only the seed's base set " +
      "(Kleinberg 1999 §2)") {
    // seeds {2}: base = {2} + in(2)={1,3} + out(2)={4}; the 5→6
    // component is OUTSIDE the base and gets no row at all
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L), (5L, 6L))
    val h = runSeeded(edges, Seq(2L), iters = 2)
    assert(h.keySet === Set(1L, 2L, 3L, 4L))
    // hand-unrolled 2 rounds on the induced subgraph:
    // a2 = {2: .8, 4: .2}; h2 = {1: .444444, 3: .444444, 2: .111111}
    assert(math.abs(h(2L)._2.get - 0.8) < 1e-5)
    assert(math.abs(h(4L)._2.get - 0.2) < 1e-5)
    assert(math.abs(h(1L)._1.get - 0.444444) < 1e-5)
    assert(math.abs(h(3L)._1.get - 0.444444) < 1e-5)
    assert(math.abs(h(2L)._1.get - 0.111111) < 1e-5)
    // base members with no mass in a role score 0.0, not null
    assert(h(1L)._2 === Some(0.0))
    assert(h(4L)._1 === Some(0.0))
  }

  test("seeded: an edgeless base (isolated or self-loop-only seed) " +
      "degrades to NULL scores, not a crash") {
    // seed 9's only edge is a self-loop → induced subgraph has no
    // simple edge → every half-step total is 0 → null on both engines
    val h = runSeeded(Seq((9L, 9L), (1L, 2L)), Seq(9L), iters = 1)
    assert(h.keySet === Set(9L))
    assert(h(9L) === ((None, None)))
    // a seed absent from the graph entirely: same contract
    val g = runSeeded(Seq((1L, 2L)), Seq(42L), iters = 1)
    assert(g.keySet === Set(42L))
    assert(g(42L) === ((None, None)))
  }
}
