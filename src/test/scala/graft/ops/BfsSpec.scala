package graft.ops

import graft.SparkSuite

class BfsSpec extends SparkSuite {
  import spark.implicits._

  private def dist(edges: Seq[(Long, Long)], seeds: Seq[Long],
      hops: Int = 4): Map[Long, Option[Int]] =
    Bfs.hopDistance(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("v"), hops)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap

  test("path graph: exact hop labels, beyond-budget nodes null") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val d = dist(path, Seq(1L), hops = 3)
    assert(d(1L) === Some(0))
    assert(d(2L) === Some(1))
    assert(d(4L) === Some(3))
    assert(d(5L) === None)
    assert(d(6L) === None)
  }

  test("edges are directed: upstream nodes are unreachable") {
    val d = dist(Seq((1L, 2L), (3L, 1L)), Seq(1L))
    assert(d(2L) === Some(1))
    assert(d(3L) === None)
  }

  test("multi-source takes the minimum over seeds") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val d = dist(path, Seq(1L, 4L))
    assert(d(3L) === Some(2))
    assert(d(4L) === Some(0))
  }

  test("a shortcut edge wins over the long way round") {
    val d = dist(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), Seq(1L))
    assert(d(4L) === Some(1))
  }

  test("seeds absent from the graph are ignored") {
    val d = dist(Seq((1L, 2L)), Seq(1L, 99L))
    assert(d === Map(1L -> Some(0), 2L -> Some(1)))
  }
}
