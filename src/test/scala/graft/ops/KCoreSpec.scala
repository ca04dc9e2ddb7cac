package graft.ops

import graft.SparkSuite

class KCoreSpec extends SparkSuite {
  import spark.implicits._

  private def layers(edges: Seq[(Long, Long)], k: Int, rounds: Int = 6)
      : Map[Long, (Long, Option[Int])] =
    KCore.onionLayers(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2))))).toMap

  // K4 plus a pendant chain: 1-2-3-4 complete, 5 hangs off 4, 6 off 5
  private val k4chain = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L))

  test("k=3: the K4 survives, the chain peels outside-in") {
    val l = layers(k4chain, k = 3)
    (1L to 4L).foreach(v => assert(l(v)._2 === None, s"node $v"))
    // 5 and 6 both have degree < 3 at the start: both peel in round 1
    assert(l(5L)._2 === Some(1))
    assert(l(6L)._2 === Some(1))
  }

  test("k=2 cascade: onion layers count peel ROUNDS, outermost first") {
    // path 1-2-3-4-5: endpoints peel first, then the new endpoints...
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val l = layers(path, k = 2)
    assert(l(1L)._2 === Some(1))
    assert(l(5L)._2 === Some(1))
    assert(l(2L)._2 === Some(2))
    assert(l(4L)._2 === Some(2))
    assert(l(3L)._2 === Some(3))
  }

  test("triangle with k=2 survives (cycle is its own 2-core)") {
    val l = layers(Seq((1L, 2L), (2L, 3L), (3L, 1L)), k = 2)
    (1L to 3L).foreach(v => assert(l(v)._2 === None))
  }

  test("degree is the simple-graph degree before any peeling") {
    val l = layers(k4chain, k = 3)
    assert(l(4L)._1 === 4L)
    assert(l(5L)._1 === 2L)
    assert(l(6L)._1 === 1L)
  }

  test("duplicate/reversed edges and self-loops don't change the peel") {
    val messy = k4chain ++ Seq((2L, 1L), (4L, 3L), (5L, 5L), (1L, 2L))
    assert(layers(messy, 3) === layers(k4chain, 3))
  }

  test("the pinned q_domain_kcore peel CONVERGES at the oracle SF " +
      "(bounded-round contract)") {
    // carve as in the query: if round `rounds` still peels, the
    // bounded unroll would under-report layers — assert fixpoint
    val edges = graft.Tables.documents(spark, Sf0001).selectExpr(
      "doc_id % 200 AS src",
      "CAST(conv(substring(md5(concat('kc:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 200 AS dst")
    val out = KCore.onionLayers(edges, "src", "dst", k = 4, rounds = 10)
    val lastRound = out.agg(
      org.apache.spark.sql.functions.max("layer")).head().getInt(0)
    val survivors = out.filter(out("layer").isNull).count()
    // converged iff the graph emptied or the last round peeled nothing
    assert(survivors == 0L || lastRound < 10,
      s"peel not converged: $survivors survivors, last layer $lastRound")
  }

  test("empty-delta short-circuit: converged graph stops early (r11 #2)") {
    // triangle at k=2 is its own 2-core: round 1 peels nothing → the
    // loop exits after ONE executed round despite a 10-round budget
    var executed = 0
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val res = KCore.onionLayers(tri, "src", "dst", k = 2, rounds = 10,
      onRound = _ => executed += 1)
    assert(res.filter(res("layer").isNull).count() === 3)
    assert(executed === 1)
    // 5-node path at k=2 peels outside-in over 3 rounds; round 4 (the
    // empty round that PROVES the fixpoint) runs, rounds 5-10 don't —
    // and the layers equal the full-budget run's
    executed = 0
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = layersWithCounter(path, k = 2, rounds = 10,
      () => executed += 1)
    assert(executed === 4)
    assert(got === layers(path, k = 2, rounds = 10))
  }

  private def layersWithCounter(edges: Seq[(Long, Long)], k: Int,
      rounds: Int, tick: () => Unit): Map[Long, (Long, Option[Int])] =
    KCore.onionLayers(edges.toDF("src", "dst"), "src", "dst", k, rounds,
        onRound = _ => tick())
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2))))).toMap
}
