package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions.col

/** Contracts of the X233–X235 operators beyond the oracle hash. */
class AlgebraSpec extends SparkSuite {

  test("q_hierarchy_rollup: level-1 nodes partition the corpus, " +
      "parents aggregate their children exactly") {
    val rows = WarehouseQueries.hierarchyRollup.fn(spark, Sf0001)
      .collect()
    val parts = Tables.part(spark, Sf0001)
      .select("p_partkey").collect().map(_.getLong(0) + 1).toSet
    val byNode = rows.map(r => r.getLong(0) ->
      (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    // every part's top-digit ancestor exists; level-1 sizes sum to N
    assert(rows.filter(_.getInt(1) == 1).map(_.getLong(2)).sum
      == parts.size)
    // parent count = sum of child-node counts + self if parent is a part
    rows.foreach { case r =>
      val node = r.getLong(0)
      val children = (0 to 9).map(j => node * 10 + j)
        .flatMap(c => byNode.get(c).map(_._2))
      val self = if (parts.contains(node)) 1L else 0L
      if (children.nonEmpty || self > 0)
        assert(r.getLong(2) == children.sum + self, s"node $node")
    }
  }

  test("q_hll_algebra: union dominates singles, estimates track the " +
      "exact set algebra") {
    val rows = WarehouseQueries.hllAlgebra.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (estA, estB, estU) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(estU >= math.max(estA, estB) - 1e-6,
        s"${r.getString(0)}/${r.getString(1)}: union must dominate")
      val (exU, exI) = (r.getLong(6), r.getLong(7))
      assert(exU >= exI)
      assert(math.abs(estU - exU) / exU < 0.25,
        s"union rel err ${(estU - exU) / exU}")
      // inclusion-exclusion intersections inherit the union's absolute
      // error scale, not the (possibly tiny) intersection's
      assert(math.abs(r.getDouble(5) - exI) <= 0.25 * exU + 1.0,
        s"intersect est ${r.getDouble(5)} vs $exI")
    }
  }

  test("q_seq_triples: counts match a direct sequence recount; " +
      "support lanes consistent; surprise positive") {
    val rows = EventQueries.seqTriples.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // direct recount of contiguous triples from the raw stream
    val evs = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val triples = evs.groupBy(_._1).values.flatMap { u =>
      u.sortBy(e => (e._3, e._4)).map(_._2).sliding(3)
        .filter(_.length == 3).map(t => (t(0), t(1), t(2)))
    }.toSeq
    val counts = triples.groupBy(identity).view.mapValues(_.size.toLong)
    val nt = triples.size.toDouble
    var prev = Long.MaxValue
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1), r.getString(2))
      assert(r.getLong(3) == counts(key), s"$key recount")
      assert(r.getLong(3) <= prev, "support-descending order")
      prev = r.getLong(3)
      assert(math.abs(r.getDouble(4) - r.getLong(3) / nt) < 1e-12)
      assert(r.getDouble(5) > 0.0)
    }
  }
}
