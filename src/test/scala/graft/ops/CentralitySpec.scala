package graft.ops

import graft.SparkSuite

class CentralitySpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], radius: Int): Map[Long, Double] =
    Centrality.harmonic(edges.toDF("src", "dst"), "src", "dst", radius)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("path graph: hand-computed harmonic values") {
    // 1 -> 2 -> 3: H(3) = 1/1 (from 2) + 1/2 (from 1); H(2) = 1; H(1) = 0
    val h = run(Seq((1L, 2L), (2L, 3L)), radius = 6)
    assert(h(1L) === 0.0)
    assert(h(2L) === 1.0)
    assert(h(3L) === 1.5)
  }

  test("radius truncation cuts far contributions") {
    val h = run(Seq((1L, 2L), (2L, 3L)), radius = 1)
    assert(h(3L) === 1.0) // node 1's 1/2 is beyond the radius
  }

  test("3-cycle: every node sees the other two at distances 1 and 2") {
    val h = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), radius = 6)
    Seq(1L, 2L, 3L).foreach(v => assert(h(v) === 1.5, s"node $v"))
  }

  test("self-loops and parallel edges contribute nothing") {
    val h = run(Seq((1L, 1L), (1L, 2L), (1L, 2L)), radius = 6)
    assert(h(1L) === 0.0) // d(1,1)=0 excluded
    assert(h(2L) === 1.0)
  }

  test("early exit: saturated balls stop before the radius cap") {
    // frontier empties at round 3; radius 10 must terminate and agree
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(edges, radius = 10) === run(edges, radius = 3))
  }

  test("direction: harmonic counts nodes that REACH v, not leavers") {
    // star into the hub: 2,3,4 -> 1
    val h = run(Seq((2L, 1L), (3L, 1L), (4L, 1L)), radius = 6)
    assert(h(1L) === 3.0)
    assert(h(2L) === 0.0)
  }

  // ------------------------------------------- HyperBall (sketched)

  private def runHb(edges: Seq[(Long, Long)], radius: Int,
      k: Int): Map[Long, Double] =
    Centrality.harmonicHyperball(edges.toDF("src", "dst"), "src", "dst",
        radius, k)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  // a 30-node pseudo-random digraph, dense enough that radius-4 balls
  // exceed small k (so saturation genuinely happens at k=8)
  private val g30: Seq[(Long, Long)] =
    (0L until 30L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 30), (i, (i * 13 + 1) % 30)))

  test("hyperball with unsaturated sketches IS the exact harmonic") {
    // k > |V|: the KMV sketch holds every reached hash, the estimator
    // returns exact counts, and per-round deltas telescope to Σ 1/d
    val exact = run(g30, radius = 4)
    val hb = runHb(g30, radius = 4, k = 64)
    exact.keys.foreach { v =>
      assert(math.abs(hb(v) - exact(v)) <= 2e-6, s"node $v")
    }
  }

  test("hyperball is deterministic and saturation stays in range") {
    val a = runHb(g30, radius = 4, k = 8)
    val b = runHb(g30, radius = 4, k = 8)
    assert(a === b)
    // estimates are positive and bounded by a generous multiple of
    // the exact value (KMV at k=8 is noisy but not unhinged)
    val exact = run(g30, radius = 4)
    a.foreach { case (v, est) =>
      assert(est > 0.0 && est < exact(v) * 5 + 5, s"node $v: $est")
    }
  }
}
