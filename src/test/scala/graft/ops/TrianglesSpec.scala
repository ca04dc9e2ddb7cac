package graft.ops

import graft.SparkSuite

class TrianglesSpec extends SparkSuite {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Option[Double])] = {
    Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
  }

  test("a triangle: every node in 1 triangle, clustering 1.0") {
    val c = count(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    (1L to 3L).foreach { v =>
      assert(c(v) === ((2L, 1L, Some(1.0))), s"node $v")
    }
  }

  test("a path has no triangles; degree-1 nodes get null clustering") {
    val c = count(Seq((1L, 2L), (2L, 3L)))
    assert(c(1L) === ((1L, 0L, None)))
    assert(c(2L)._2 === 0L)
    assert(c(2L)._3 === Some(0.0))
  }

  test("K4: each node in 3 triangles, clustering 1.0") {
    val k4 = for {
      i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (i, j)
    val c = count(k4)
    (1L to 4L).foreach(v => assert(c(v) === ((3L, 3L, Some(1.0)))))
  }

  test("direction, duplication and self-loops don't change the count") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val messy = base ++ Seq((2L, 1L), (3L, 2L), (1L, 3L),
      (1L, 2L), (2L, 2L))
    assert(count(messy) === count(base))
  }

  test("bowtie: the shared apex is in 2 triangles, others in 1") {
    // triangles {1,2,3} and {1,4,5} sharing node 1
    val c = count(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 4L), (4L, 5L), (5L, 1L)))
    assert(c(1L)._2 === 2L)
    assert(c(2L)._2 === 1L)
    assert(c(4L)._2 === 1L)
    // apex degree 4 → clustering = 2·2/(4·3) = 1/3
    assert(math.abs(c(1L)._3.get - 1.0 / 3) < 1e-12)
  }

  test("deterministic under repartitioning") {
    val edges = (0 until 400).map(i =>
      (i.toLong % 25, (i * 13 + 7).toLong % 25))
    val a = count(edges)
    val b = Triangles.perNode(
        edges.toDF("src", "dst").repartition(9), "src", "dst")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(a === b)
  }
}
