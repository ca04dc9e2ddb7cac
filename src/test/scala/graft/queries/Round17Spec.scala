package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Round-17 operators: X315 persisted navigable-graph ANN index and
  * the ADVICE r16 fixes. Cross-engine value equality is the driver
  * oracle's job; these tests pin the ALGORITHMIC contracts the hash
  * check cannot express.
  */
class Round17Spec extends SparkSuite {

  // ------------------------------- X315 persisted navigable graph

  /** The persistence contract (the AnnIndexSpec discipline applied to
    * the graph index): beam search over the COMMITTED edges + entry
    * must equal beam search over the SAME graph built inline in
    * memory — writing through the manifest and reading back changes
    * nothing. This is what "serve X307 without the n² scaffold"
    * rests on: the served graph IS the built graph. */
  test("q_ann_graph_index_query: served search ≡ inline-built search") {
    val e = SimilarityQueries.simEmbFrame(spark, Sf0001)
    val n = e.count()
    // inline build — same parameters as AnnGraph.build, zero I/O
    val (_, g) = graft.ops.AnnGraph.nnDescent(e, n)
    val gk = graft.ops.AnnGraph.rankEdges(g).localCheckpoint(true)
    val kept = graft.ops.AnnGraph.rngPrune(gk, e).localCheckpoint(true)
    val entry = kept.groupBy("src").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src").asc)
      .select("src").limit(1).head().getLong(0)
    val inline = SimilarityQueries.beamSearchEval(e,
        SimilarityQueries.symmetrized(kept), q0 = 100L, q1 = 120L,
        beam = 8, hops = 5, k = 10, entry = entry)
      .collect().map(_.toSeq).toSeq
    val served = SparkEntry.queries("q_ann_graph_index_query")(
        spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(served == inline,
      "committed-artifact search diverged from inline-built search")
    assert(served.nonEmpty)
  }

  /** ensureBuilt is the serve path's ONLY build trigger: a second
    * call against a committed index is a no-op (same commit id, same
    * edge set) — the build-once/serve-many contract. */
  test("AnnGraph.ensureBuilt: second call is a no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-anngraph-once").toString
    val e = SimilarityQueries.simEmbFrame(spark, Sf0001)
    graft.ops.AnnGraph.ensureBuilt(e, dir)
    val (commit1, _) = graft.ops.Shard.readTablesManifest(spark, dir)
    val edges1 = graft.ops.Shard
      .readTableViaManifest(spark, dir, "edges").count()
    graft.ops.AnnGraph.ensureBuilt(e, dir)
    val (commit2, _) = graft.ops.Shard.readTablesManifest(spark, dir)
    assert(commit1 == commit2, "ensureBuilt rebuilt a committed index")
    val edges2 = graft.ops.Shard
      .readTableViaManifest(spark, dir, "edges").count()
    assert(edges1 == edges2)
  }

  /** Structural invariants of the committed graph: every corpus node
    * keeps ≥ 1 out-edge (the rn = 1 edge has no closer-ranked
    * neighbor, so the RNG rule can never drop it — which is what
    * makes the max-out-degree entry argmax total), and the flagged
    * entry IS the degree argmax with min-id tie-break. */
  test("q_ann_graph_index_build: total coverage and entry = degree argmax") {
    val rows = SparkEntry.queries("q_ann_graph_index_build")(
        spark, Sf0001)
      .collect()
    val n = SimilarityQueries.simEmbFrame(spark, Sf0001).count()
    assert(rows.length == n, "a node lost ALL edges to the prune")
    assert(rows.forall(_.getAs[Long]("deg_after") >= 1L))
    val best = rows.map(r => (r.getAs[Long]("deg_after"),
      r.getAs[Long]("node"))).sortBy(t => (-t._1, t._2)).head._2
    val flagged = rows.filter(_.getAs[Boolean]("is_entry"))
      .map(_.getAs[Long]("node")).toSeq
    assert(flagged == Seq(best),
      s"entry flag on $flagged, degree argmax is $best")
  }
}
