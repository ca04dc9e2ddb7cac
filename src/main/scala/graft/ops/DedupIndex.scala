package graft.ops

import graft.functions.{HashFunctions, ShingleFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH dedup index behind the atomic manifest
  * commit (X326 — VERDICT r18 #1: the streaming incremental-dedup
  * row's per-batch probe grew with the accumulated corpus because
  * every microbatch re-shingled and re-banded the WHOLE seen corpus;
  * the ANN index had its lifecycle (X300 build / X311 delta segments /
  * X317 compaction), the LSH dedup index did not. This gives the
  * dedup side the identical discipline). One commit publishes three
  * tables:
  *
  *  - `bands`    — the banded LSH index rows (band, bucket, id):
  *                 fixed-width, corpus-sized, APPEND-ONLY — each
  *                 ingest adds one segment, existing files are
  *                 carried by manifest reference, never rewritten
  *                 (the X317 property: 100 TB ingest I/O is
  *                 O(delta), not O(corpus));
  *  - `shingles` — the verification sidecar (id, shingles:
  *                 array<long>): the shingle SETS candidates verify
  *                 exact Jaccard against, append-only like `bands`
  *                 (so batch N never re-reads, re-tokenizes or
  *                 re-hashes batch 0's text — the r18 probe-growth
  *                 term this index removes);
  *  - `clusters` — the SPARSE canonical-min mapping (id,
  *                 canonical_id), only rows with id ≠ canonical:
  *                 REWRITTEN per ingest, but its size is the
  *                 duplicate mass (the dedup-rate fraction of the
  *                 corpus), never the corpus itself.
  *
  * One manifest swap per ingest publishes segments + state together,
  * so a reader can never pair new band segments with a stale
  * clustering (the torn-index hazard), and a crashed ingest leaves
  * readers on the previous consistent index.
  *
  * Probe shape (the scale contract): a delta of Δ docs shingles and
  * bands ONLY itself; candidate generation probes the committed
  * `bands` table restricted to the buckets the delta occupies — the
  * delta's (band, bucket) key set broadcasts, so the committed index
  * is scanned once with a semi-join filter and NOTHING corpus-sized
  * shuffles. Candidate volume is O(Δ · bucket occupancy) exactly as
  * [[Dedup.minhashPairsDelta]]; cluster maintenance re-closes only
  * delta-touched components ([[Dedup.maintainClusters]], O(|Δ pairs|)).
  * Banding is a per-row function of the text, so the accumulated
  * index is bit-identical to re-banding the full corpus — delta
  * probes return EXACTLY the full recompute's pairs restricted to
  * pairs touching the delta (the X295 identity), which is why the
  * stream-maintained clustering equals the from-scratch one
  * hash-for-hash (q_stream_incremental_dedup / q_dedup_index_compact
  * carry the proof).
  *
  * [[compact]] folds the accumulated band/shingle segments into one
  * fresh segment each under a single swap (X317's background
  * compaction: one scan + one write, amortized over many O(delta)
  * ingests), and GC retires every superseded prefix — bounding both
  * file count (manifest metadata, probe-scan fan-in) and disk.
  * Round19Spec pins compaction invisibility: clusters and subsequent
  * ingests are bit-identical across a compacted vs fragmented index.
  */
object DedupIndex {

  /** The table set one index commit publishes. */
  val tableNames: Seq[String] = Seq("bands", "shingles", "clusters")

  /** Initialize an EMPTY committed index at `dir` — batch 0 then
    * ingests against empty state through the same code path as every
    * later batch (maintenance IS the initial build; no special
    * case). */
  def init(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val bands = Seq.empty[(Int, Long, Long)]
      .toDF("band", "bucket", "id").repartition(1)
    val shingles = Seq.empty[(Long, Array[Long])]
      .toDF("id", "shingles").repartition(1)
    val clusters = Seq.empty[(Long, Long)]
      .toDF("id", "canonical_id").repartition(1)
    Shard.writeTablesAtomic(
      Seq("bands" -> bands, "shingles" -> shingles,
        "clusters" -> clusters), dir, Shard.newCommitId())
  }

  /** Ingest `docs` (idCol, textCol) as one delta batch: shingle+band
    * ONLY the delta, probe the committed index, verify exact Jaccard,
    * maintain the clustering, and publish (append band/shingle
    * segments + rewrite the sparse clusters) in ONE swap. Delta ids
    * must be disjoint from the committed corpus (the X311 retry
    * guard — a retried committed batch would duplicate index rows).
    *
    * Cap precondition (ADVICE r15, as [[Dedup.minhashPairsDelta]]):
    * equivalence-proof lanes pass bucketCap = Int.MaxValue; with a
    * finite cap, occupancy is counted over (committed ∪ delta) rows
    * of the PROBED buckets — identical to capping the full banded
    * frame, because restriction by bucket key keeps every row of a
    * probed bucket and unprobed buckets yield no candidates. */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      dir: String, shingleK: Int = 3, numHashes: Int = 128,
      bands: Int = 32, threshold: Double = 0.9,
      bucketCap: Int = 1000): Unit = {
    val s = docs.sparkSession
    val (nBands, rows) =
      if (bands == 0) Dedup.optimalBanding(numHashes, threshold)
      else {
        require(numHashes % bands == 0, "bands must divide numHashes")
        (bands, numHashes / bands)
      }
    // delta-only text work: one shingle pass, one banding kernel.
    // r20 NEGATIVE RESULT: widening the delta before this projection
    // was tried and REVERTED — a microbatch is small by definition,
    // and the 32-partition checkpoint it produced multiplied every
    // downstream per-batch stage's task count (profiled 240 → 1 500
    // tasks, 6 → 91 task-seconds, wall 6 → 12 s across the two
    // lifecycle rows). Serial shingling of a delta is the cheap part.
    val shD = docs.select(col(idCol).cast("long").as("id"),
      ShingleFunctions.shingleHashes(col(textCol), shingleK)
        .as("shingles"))
      .localCheckpoint(true) // banding + both verify sides + commit
    val newIds = shD.select("id").localCheckpoint(true)
    val committedSh = Shard.readTableViaManifest(s, dir, "shingles")
    val dup = newIds.join(committedSh.select("id"), Seq("id"),
      "left_semi").count()
    require(dup == 0L,
      s"dedup ingest into $dir: $dup ids already committed — deltas " +
        "must be disjoint (a retry of a committed delta re-ingests)")
    val bandedD = shD.select(col("id"),
      HashFunctions.minhashBandBuckets(col("shingles"), nBands, rows)
        .as("buckets"))
      .select(col("id"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
      .localCheckpoint(true) // probe keys + candidates + commit
    // probe the committed index restricted to delta-occupied buckets:
    // the delta's key set broadcasts; the index scan emits only
    // matching fixed-width rows, nothing corpus-sized shuffles
    val probedKeys = broadcast(
      bandedD.select("band", "bucket").distinct())
    val probed = Shard.readTableViaManifest(s, dir, "bands")
      .join(probedKeys, Seq("band", "bucket"), "left_semi")
      .select("band", "bucket", "id")
      .unionByName(bandedD.select("band", "bucket", "id"))
    val capped =
      if (bucketCap == Int.MaxValue) probed
      else Dedup.capBuckets(probed, Seq("band", "bucket"), bucketCap)
    val deltaSide = capped.join(broadcast(newIds), Seq("id"), "left_semi")
      .select(col("band"), col("bucket"), col("id").as("id_d"))
    val allSide = capped.select(col("band"), col("bucket"),
      col("id").as("id_o"))
    val candidates = deltaSide.join(allSide, Seq("band", "bucket"))
      .filter(col("id_d") =!= col("id_o"))
      .select(least(col("id_d"), col("id_o")).as("id_a"),
        greatest(col("id_d"), col("id_o")).as("id_b"))
      .distinct()
    val deltaPairs = Dedup.verifyJaccard(candidates,
      committedSh.unionByName(shD), threshold)
    // cluster maintenance: old components contract to supernodes,
    // only delta-touched components re-close (O(|Δ pairs|))
    val sparseOld = Shard.readTableViaManifest(s, dir, "clusters")
    val oldClusters = committedSh.select("id")
      .join(sparseOld.withColumnRenamed("canonical_id", "c"),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("canonical_id"))
    val maintained = Dedup.maintainClusters(oldClusters, "id", newIds,
      deltaPairs)
    val sparseNew = maintained
      .filter(col("id") =!= col("canonical_id"))
      .localCheckpoint(true) // materialize BEFORE the swap (reads old state)
    Shard.appendTablesAtomic(
      Seq("bands" -> bandedD.select("band", "bucket", "id"),
        "shingles" -> shD),
      dir, Shard.newCommitId(),
      rewriteTables = Seq("clusters" -> sparseNew))
    Shard.gcOldCommits(s, dir)
  }

  /** Fold the accumulated band/shingle segments into ONE fresh
    * segment each (plus the clusters state), republished under a
    * single manifest swap — readers see the fragmented chain before
    * the swap and the single segment after, never a half state; GC
    * then retires every superseded prefix, bounding disk and the
    * probe scan's file fan-in. Invisible to results by construction
    * (same rows, different files — Round19Spec pins it). */
  def compact(s: SparkSession, dir: String): Unit = {
    // materialize BEFORE the swap: the rewrite must not read files
    // its own publish step's GC retires
    val bandsAll = Shard.readTableViaManifest(s, dir, "bands")
      .localCheckpoint(true)
    val shAll = Shard.readTableViaManifest(s, dir, "shingles")
      .localCheckpoint(true)
    val clAll = Shard.readTableViaManifest(s, dir, "clusters")
      .localCheckpoint(true)
    Shard.writeTablesAtomic(
      Seq("bands" -> bandsAll, "shingles" -> shAll,
        "clusters" -> clAll), dir, Shard.newCommitId())
    Shard.gcOldCommits(s, dir)
  }

  /** The FULL (id, canonical_id) clustering of the committed corpus:
    * the sparse committed mapping joined back over the corpus id set
    * with identity fallback. */
  def clusters(s: SparkSession, dir: String): DataFrame = {
    val sparse = Shard.readTableViaManifest(s, dir, "clusters")
    Shard.readTableViaManifest(s, dir, "shingles").select("id")
      .join(sparse.withColumnRenamed("canonical_id", "c"), Seq("id"),
        "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("canonical_id"))
  }
}
