package graft.ops

import graft.SparkSuite

class CommunitiesSpec extends SparkSuite {
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], rounds: Int = 4)
      : Map[Long, Long] = {
    Communities.labelPropagation(edges.toDF("src", "dst"),
        "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two disjoint triangles resolve to two communities") {
    val tri1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val tri2 = Seq((11L, 12L), (12L, 13L), (13L, 11L))
    val c = lpa(tri1 ++ tri2)
    assert(Set(c(1L), c(2L), c(3L)).size === 1)
    assert(Set(c(11L), c(12L), c(13L)).size === 1)
    assert(c(1L) !== c(11L))
  }

  test("min-label tie-break is deterministic on a symmetric pair") {
    // 1–2 only: each node's sole neighbour label is the other's; after
    // round 1 they swap (2→1's label, 1→2's), after round 2 swap back —
    // the deterministic synchronous oscillation, same on every run
    val a = lpa(Seq((1L, 2L)), rounds = 2)
    val b = lpa(Seq((1L, 2L)), rounds = 2)
    assert(a === b)
    assert(a(1L) === 1L && a(2L) === 2L) // even rounds: back to start
    val odd = lpa(Seq((1L, 2L)), rounds = 3)
    assert(odd(1L) === 2L && odd(2L) === 1L)
  }

  test("a bridge node joins the larger clique") {
    // clique {1,2,3} (pairwise), node 4 attached to 1 only: 4's sole
    // neighbour is 1, so 4 adopts 1's community
    val clique = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val c = lpa(clique :+ (1L -> 4L))
    assert(c(4L) === c(1L))
  }

  test("self-loop-only node keeps its own label") {
    val c = lpa(Seq((1L, 2L), (2L, 1L), (9L, 9L)))
    assert(c(9L) === 9L)
  }

  test("multi-edges carry no extra vote weight") {
    // 5 votes twice for 1's label via duplicate edges, once for 6's:
    // distinct neighbour semantics → tie → min label wins, and the
    // duplicated edge must NOT outvote it
    val base = Seq((5L, 1L), (5L, 1L), (5L, 1L), (5L, 6L))
    val c = lpa(base, rounds = 1)
    assert(c(5L) === 1L) // {1,6} tie → min
  }

  test("deterministic under repartitioning") {
    val edges = (0 until 300).map(i =>
      (i.toLong % 30, (i * 11 + 5).toLong % 30))
    val a = lpa(edges)
    val b = Communities.labelPropagation(
        edges.toDF("src", "dst").repartition(7), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("fixpoint short-circuit stops early; oscillators run the full " +
      "budget (r11 #2)") {
    // triangle: round 1 {1→2,2→1,3→1}, round 2 {1,1,1}, round 3
    // reproduces round 2 → fixpoint proven at round 3, rounds 4-10
    // skipped — labels equal the full-budget run's
    var executed = 0
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val c = Communities.labelPropagation(tri, "src", "dst", rounds = 10,
        onRound = _ => executed += 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(executed === 3)
    assert(c === lpa(Seq((1L, 2L), (2L, 3L), (3L, 1L)), rounds = 10))
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // the 1–2 pair oscillates with period 2: consecutive states always
    // differ, so the bounded budget stays the only stop — all rounds run
    executed = 0
    Communities.labelPropagation(Seq((1L, 2L)).toDF("src", "dst"),
        "src", "dst", rounds = 6, onRound = _ => executed += 1)
      .collect()
    assert(executed === 6)
  }
}
