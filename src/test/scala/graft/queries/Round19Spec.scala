package graft.queries

import graft.SparkSuite
import graft.ops.{Dedup, DedupIndex, Shard}
import org.apache.spark.sql.functions._

/** Round-19 contracts: the persisted LSH dedup index's lifecycle
  * (VERDICT r18 #1 — segment-append ingest, sparse-clusters rewrite,
  * compaction invisibility) and the ADVICE r18 empty-document pair
  * policy. Cross-engine value equality stays the driver oracle's job;
  * these pin the invariants a hash check cannot express — which files
  * a commit writes, and that compaction/maintenance change NOTHING
  * observable. */
class Round19Spec extends SparkSuite {

  /** 10 docs: an identical+near-dup cluster {0,1,2} (doc 2 appends one
    * token — Jaccard 28/29 ≈ 0.966 ≥ 0.9), an identical pair {5,6},
    * singletons elsewhere. Long texts so k=3 shingles are plentiful. */
  private def corpus() = {
    import spark.implicits._
    val base = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val other = (1 to 30).map(i => s"beta$i").mkString(" ")
    Seq(
      (0L, base), (1L, base), (2L, base + " tail"),
      (3L, (1 to 30).map(i => s"gamma$i").mkString(" ")),
      (4L, (1 to 30).map(i => s"delta$i").mkString(" ")),
      (5L, other), (6L, other),
      (7L, (1 to 30).map(i => s"eps$i").mkString(" ")),
      (8L, (1 to 30).map(i => s"zeta$i").mkString(" ")),
      (9L, (1 to 30).map(i => s"eta$i").mkString(" "))
    ).toDF("doc_id", "text").localCheckpoint(true)
  }

  private def ingestAll(dir: String,
      batches: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    DedupIndex.init(spark, dir)
    batches.foreach(b => DedupIndex.ingest(b, "doc_id", "text", dir,
      shingleK = 3, numHashes = 128, bands = 32, threshold = 0.9,
      bucketCap = Int.MaxValue))
  }

  private def clustersMap(dir: String): Map[Long, Long] =
    DedupIndex.clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("DedupIndex: 3-batch maintained clustering ≡ one-shot recompute") {
    val docs = corpus()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-didx-eq").toString + "/idx"
    // splits cross cluster boundaries on purpose: {0,1} arrive before
    // 2, and {5} before {6}, so batch-1/2 probes must find committed
    // partners through the index, not within their own batch
    val b0 = docs.filter(col("doc_id").isin(0L, 1L, 3L, 5L))
    val b1 = docs.filter(col("doc_id").isin(2L, 4L, 6L))
    val b2 = docs.filter(col("doc_id").isin(7L, 8L, 9L))
    ingestAll(dir, Seq(b0, b1, b2))
    val maintained = clustersMap(dir)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", shingleK = 3,
      numHashes = 128, bands = 32, threshold = 0.9,
      bucketCap = Int.MaxValue)
    val recomputed = Dedup.clusterKeepMin(docs.select("doc_id"),
      "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained == recomputed,
      s"index-maintained $maintained != recomputed $recomputed")
    // and the clustering is the intended one: {0,1,2}→0, {5,6}→5
    assert(maintained(0L) == 0L && maintained(1L) == 0L &&
      maintained(2L) == 0L && maintained(5L) == 5L &&
      maintained(6L) == 5L && maintained(7L) == 7L)
  }

  test("DedupIndex.compact: invisible to results AND to future ingests") {
    val docs = corpus()
    val b0 = docs.filter(col("doc_id") < 4)
    val b1 = docs.filter(col("doc_id") >= 4 && col("doc_id") < 7)
    val b2 = docs.filter(col("doc_id") >= 7)
    // lane A: never compacts; lane B: compacts mid-lifecycle and at end
    val dirA = java.nio.file.Files
      .createTempDirectory("graft-didx-a").toString + "/idx"
    val dirB = java.nio.file.Files
      .createTempDirectory("graft-didx-b").toString + "/idx"
    ingestAll(dirA, Seq(b0, b1, b2))
    DedupIndex.init(spark, dirB)
    DedupIndex.ingest(b0, "doc_id", "text", dirB, shingleK = 3,
      numHashes = 128, bands = 32, threshold = 0.9,
      bucketCap = Int.MaxValue)
    DedupIndex.ingest(b1, "doc_id", "text", dirB, shingleK = 3,
      numHashes = 128, bands = 32, threshold = 0.9,
      bucketCap = Int.MaxValue)
    assert(Shard.livePrefixes(spark, dirB).size > 1,
      "two ingests over init should fragment the segment chain")
    DedupIndex.compact(spark, dirB)
    assert(Shard.livePrefixes(spark, dirB).size == 1,
      "compaction should fold to exactly one live prefix")
    // an ingest AFTER compaction must behave exactly as one without
    DedupIndex.ingest(b2, "doc_id", "text", dirB, shingleK = 3,
      numHashes = 128, bands = 32, threshold = 0.9,
      bucketCap = Int.MaxValue)
    assert(clustersMap(dirA) == clustersMap(dirB),
      "compaction changed the maintained clustering")
    // same index CONTENT, different files: band row sets are equal
    val bandsA = Shard.readTableViaManifest(spark, dirA, "bands")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val bandsB = Shard.readTableViaManifest(spark, dirB, "bands")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(bandsA == bandsB, "compaction must move files, not rows")
  }

  test("DedupIndex: mixed commit appends segments, rewrites clusters") {
    val docs = corpus()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-didx-mix").toString + "/idx"
    ingestAll(dir, Seq(docs.filter(col("doc_id") < 5),
      docs.filter(col("doc_id") >= 5)))
    val (commit, entries) = Shard.readTablesManifest(spark, dir)
    val bandPrefixes = entries.collect { case ("bands", p) =>
      """data/([^/]+)/""".r.findFirstMatchIn(p).get.group(1) }.toSet
    assert(bandPrefixes.size == 3,
      s"bands should span init + 2 ingest segments, got $bandPrefixes")
    // clusters was REWRITTEN: every file under the latest commit only
    val clPrefixes = entries.collect { case ("clusters", p) =>
      """data/([^/]+)/""".r.findFirstMatchIn(p).get.group(1) }.toSet
    assert(clPrefixes == Set(commit),
      s"clusters files should live only under $commit, got $clPrefixes")
    // sparse storage: only non-identity rows are committed
    val sparse = Shard.readTableViaManifest(spark, dir, "clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sparse == Set((1L, 0L), (2L, 0L), (6L, 5L)),
      s"sparse clusters should hold exactly the duplicate rows, got $sparse")
  }

  test("DedupIndex.ingest: re-ingesting committed ids is refused") {
    val docs = corpus()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-didx-dup").toString + "/idx"
    val b0 = docs.filter(col("doc_id") < 5)
    ingestAll(dir, Seq(b0))
    val e = intercept[IllegalArgumentException] {
      DedupIndex.ingest(b0, "doc_id", "text", dir, shingleK = 3,
        numHashes = 128, bands = 32, threshold = 0.9,
        bucketCap = Int.MaxValue)
    }
    assert(e.getMessage.contains("already committed"))
  }

  test("q_ann_filtered: dual lane dominates post-filter per query") {
    // the structural contract (X327): the dual lane's visited set is
    // a SUPERSET of the unfiltered walk's, so vs the filtered ground
    // truth hits = min(k, |truth ∩ visited|) is monotone — recall ≥
    // post-filter PER QUERY, not just in aggregate, at a bounded
    // extra scan (≤ beam·k per extension hop)
    val rows = graft.SparkEntry.queries("q_ann_filtered")(spark, Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    val byQ = rows.groupBy(_._2)
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, lanes) =>
      val post = lanes.find(_._1 == "post").get
      val dual = lanes.find(_._1 == "dual").get
      assert(dual._4 >= post._4,
        s"query $qid: dual recall ${dual._4} < post ${post._4}")
      assert(dual._3 >= post._3,
        s"query $qid: dual visited ${dual._3} < post ${post._3} — " +
          "the superset invariant broke")
    }
  }

  test("q_ann_graph_layered: dominance + the adaptivity attribution") {
    // X328 contracts: (1) layered's visited set ⊇ multi4's, so recall
    // dominates the flat baseline PER QUERY; (2) the control lane
    // (plain 3-hop continuation) separates "more hops" from "adaptive
    // coarse entries" — layered must beat the control IN AGGREGATE,
    // otherwise the coarse layer routes nothing
    val rows = graft.SparkEntry.queries("q_ann_graph_layered")(
        spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    val byQ = rows.groupBy(_._2)
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, lanes) =>
      val m4 = lanes.find(_._1 == "multi4").get
      val lay = lanes.find(_._1 == "layered").get
      assert(lay._4 >= m4._4,
        s"query $qid: layered recall ${lay._4} < multi4 ${m4._4}")
      assert(lay._3 >= m4._3,
        s"query $qid: layered visited ${lay._3} < multi4 ${m4._3} — " +
          "the superset invariant broke")
    }
    def agg(v: String) =
      rows.filter(_._1 == v).map(_._4).sum / byQ.size
    assert(agg("layered") >= agg("multi4ext"),
      s"layered ${agg("layered")} < control ${agg("multi4ext")} — " +
        "adaptive coarse seeding added nothing over plain continuation")
  }

  test("empty-document pair policy (ADVICE r18): no engine emits it") {
    import spark.implicits._
    // two contentless docs: 0/0 Jaccard — by policy NOT near-dup
    // evidence. Spark lane: JaccardSim maps empty-union to NULL and
    // `NULL >= τ` filters false, so minhashPairs emits nothing.
    val docs = Seq((0L, ""), (1L, ""), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", shingleK = 3,
      numHashes = 128, bands = 32, threshold = 0.9,
      bucketCap = Int.MaxValue).collect()
    assert(pairs.isEmpty,
      s"empty docs must not pair: ${pairs.mkString(",")}")
    // oracle sparse form: zero-overlap pairs are excluded
    // STRUCTURALLY, which is sound only under τ > 0 — asserted
    val err = intercept[IllegalArgumentException] {
      SimilarityQueries.sqlExactJaccardPairs(0.0)
    }
    assert(err.getMessage.contains("threshold"))
  }
}
