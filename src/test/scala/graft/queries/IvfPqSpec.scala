package graft.queries

import graft.{SparkSuite, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** X292 composed-index contract: the IVF coarse quantizer must do the
  * pruning (candidate volume == probed-cell occupancy, nothing more,
  * nothing less) and the PQ ADC scoring must rank only inside the
  * probed cells. */
class IvfPqSpec extends SparkSuite {

  private val NProbe = 4

  test("candidate volume == probed-cell occupancy minus self-hits") {
    val e = Tables.embeddings(spark, Sf0001)
    // rebuild the exact index the query trains (same seedless
    // deterministic fit), then predict candidates from first principles
    val index = Similarity.fitIvf(e, "embedding", "vec_id", nlist = 16)
    val assigned = e.select(col("vec_id"),
        index.assignExpr(col("embedding")).as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val occupancy = assigned.values.groupBy(identity).map {
      case (l, xs) => l -> xs.size.toLong
    }
    val qIds = assigned.keys.filter(_ < 5).toSeq.sorted
    val qVecs = e.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Number](1).map(_.doubleValue()).toArray).toMap
    val predicted: Map[Long, Long] = qIds.map { q =>
      val probes = index.probeLists(qVecs(q), NProbe).toSet
      val occ = probes.toSeq.map(l => occupancy.getOrElse(l, 0L)).sum
      // the query itself is a corpus row: subtract its self-hit iff its
      // own cell is probed (it always is at nprobe >= 1 in practice,
      // but assert from the assignment, not the assumption)
      q -> (occ - (if (probes.contains(assigned(q))) 1L else 0L))
    }.toMap

    // actual candidates: run the composed ranking with k large enough
    // that the rank filter keeps every scored candidate
    val full = ClusterQueries.ivfPqTopK(spark, Sf0001, k = 1000000)
    val actual = full.groupBy("query_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(actual.keySet === predicted.keySet)
    qIds.foreach { q =>
      assert(actual(q) === predicted(q),
        s"query $q: candidates ${actual(q)} != occupancy ${predicted(q)}")
    }
    // and the pruning is real: strictly fewer candidates than the
    // corpus-minus-self brute-force volume
    val n = assigned.size.toLong
    qIds.foreach(q => assert(predicted(q) < n - 1))
  }

  test("every returned neighbor lies in a probed cell; ranks dense") {
    val e = Tables.embeddings(spark, Sf0001)
    val index = Similarity.fitIvf(e, "embedding", "vec_id", nlist = 16)
    val assigned = e.select(col("vec_id"),
        index.assignExpr(col("embedding")).as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qVecs = e.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Number](1).map(_.doubleValue()).toArray).toMap
    val top = ClusterQueries.ivfPqTopK(spark, Sf0001, k = 10).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val (q, nb) = (r.getLong(0), r.getLong(1))
      assert(nb !== q)
      val probes = index.probeLists(qVecs(q), NProbe).toSet
      assert(probes.contains(assigned(nb)),
        s"neighbor $nb of query $q outside probed cells")
    }
    // ranks are 1..k' dense per query, adist non-decreasing
    top.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq ===
        (1L to sorted.length.toLong))
      val ad = sorted.map(_.getDouble(3))
      assert(ad.zip(ad.tail).forall { case (a, b) => a <= b })
    }
  }

  test("residual IVFADC: same candidate geometry as raw-PQ, " +
      "different (residual) scores") {
    // the coarse quantizer alone decides candidates — PQ variant only
    // changes SCORING, so at k = corpus size both rankings cover the
    // identical (query, neighbor) candidate set
    val raw = ClusterQueries.ivfPqTopK(spark, Sf0001, k = 1000000)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val res = ClusterQueries.ivfPqResidualTopK(spark, Sf0001,
        k = 1000000)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw === res)
    // and the scores genuinely differ (residual codebooks re-center
    // each cell): the two top-10 rankings must not be identical
    val rawTop = ClusterQueries.ivfPqTopK(spark, Sf0001, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    val resTop = ClusterQueries.ivfPqResidualTopK(spark, Sf0001, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    assert(rawTop.toSet !== resTop.toSet,
      "residual encoding produced the identical ranking — suspicious")
  }
}
