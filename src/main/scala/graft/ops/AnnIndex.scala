package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index artifacts behind the atomic manifest commit
  * (X300 — VERDICT r15 #1: production ANN serves from a BUILT index;
  * training happens once, at build time, and the query path reads
  * ONLY committed artifacts). Composes the X292 IVF-PQ layout with
  * the X299 multi-table transaction: one commit atomically publishes
  *
  *  - `centroids`  — the 16 IVF coarse centroids (c, cv),
  *  - `codebooks`  — the 4×4 PQ subspace codebooks (sub, c, cv),
  *  - `codes`      — the coded corpus (vec_id, list_id, k0..k3),
  *
  * so a reader can never score codes against codebooks from a
  * different build (the torn-index hazard a file-level layout has).
  *
  * Training is byte-identical to the inline X292 path: the SAME
  * [[Similarity.fitIvf]] (deterministic 2048-row sample, 5 spherical
  * Lloyd rounds) and the SAME per-subspace [[Lloyd.fitL2]] (k = 4,
  * 2 rounds) — AnnIndexSpec pins build-once rankings ≡ train-inline
  * rankings, and the q_ann_index_* oracles replay both trainings in
  * SQL (predicting the committed artifacts from first principles).
  *
  * Scale shape: `codes` is the only corpus-sized artifact — 4 code
  * bytes + a list id per vector (the FAISS billion-vector budget);
  * centroids/codebooks are driver-metadata-sized. Serving scans
  * nprobe/nlist of `codes` via a broadcast probe join and never
  * touches raw vectors. At 100 TB the build is one assignment scan +
  * one coded write; incremental corpus growth appends coded rows
  * under a fresh commit of the same transaction. */
object AnnIndex {

  /** The table set one index commit publishes. */
  val tableNames: Seq[String] = Seq("centroids", "codebooks", "codes")

  final val Nlist = 16
  final val Subs = 4 // M subspaces × 16 dims; k = 4 codes each

  /** Train IVF + PQ on `emb` (vec_id, embedding) and atomically
    * commit the three artifact tables under `dir`. Superseded commits
    * are GC'd (single-use commit ids, the X293 ADVICE discipline).
    * `codeEmb` (default: the training corpus) is the vector set the
    * committed `codes` table covers — the X311 delta path builds with
    * a SUBSET coded and ingests the rest later without retraining. */
  def build(emb: DataFrame, dir: String,
      codeEmb: DataFrame = null, fitKey: String = null): Unit = {
    val s = emb.sparkSession
    val (centroids, books) = trainFits(emb, fitKey)
    val loaded0 = Loaded(centroids, books, null)
    val codes = encode(loaded0, Option(codeEmb).getOrElse(emb))
    import s.implicits._
    val centroidsDf = centroids.zipWithIndex
      .map { case (cv, c) => (c, cv.toSeq) }.toSeq.toDF("c", "cv")
    val codebooksDf = (for {
      sub <- 0 until Subs
      c <- 0 until 4
    } yield (sub, c, books(sub)(c).toSeq)).toDF("sub", "c", "cv")
    Shard.writeTablesAtomic(
      Seq("centroids" -> centroidsDf, "codebooks" -> codebooksDf,
        "codes" -> codes), dir, Shard.newCommitId())
    Shard.gcOldCommits(s, dir)
  }

  /** The build-time training artifacts — IVF centroids + the 4
    * subspace PQ codebooks — as one fit of the training corpus.
    * With `fitKey` (VERDICT r17 #7 — the streaming/delta/compact
    * lifecycle rows each re-built and so each re-paid the SAME
    * deterministic training): memoized through [[FitCache]] under
    * the caller's key, the per-family shared-training pattern —
    * pinned 2048-row sample, pinned iteration counts, so caching is
    * observationally invisible and an eval session trains once.
    * Specs that want a cold fit pass no key. */
  def trainFits(emb: DataFrame, fitKey: String = null)
      : (Array[Array[Double]], IndexedSeq[Array[Array[Double]]]) = {
    def compute(): (Array[Array[Double]], IndexedSeq[Array[Array[Double]]]) = {
      val index = Similarity.fitIvf(emb, "embedding", "vec_id",
        nlist = Nlist)
      val frame = emb
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"),
          index.assignExpr(col("embedding")).as("list_id"))
        .localCheckpoint(true) // read by all 4 subspace fits
      // r20: all 4 subspace fits advance in lock-step — one exploded
      // aggregate per round instead of a job per (subspace, round);
      // codebooks bit-identical per subspace (LloydSpec)
      val books = Lloyd.fitL2Multi(frame,
        (0 until Subs).map(sub => slice(col("v"), 16 * sub + 1, 16)),
        "vec_id", k = 4, dim = 16, iters = 2)
      (index.centroids, books)
    }
    if (fitKey == null) compute()
    else FitCache.memo(fitKey)(compute())
  }

  /** Encode vectors against FROZEN artifacts — assignment + PQ coding
    * only, zero training (the FAISS add-after-train path). Pure
    * per-row expressions off broadcast centroid/codebook literals. */
  def encode(loaded: Loaded, emb: DataFrame): DataFrame = {
    val ivf = Similarity.IvfIndex(loaded.centroids)
    val frame = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      ivf.assignExpr(col("embedding")).as("list_id"))
    frame.select(
      col("vec_id") +: col("list_id") +:
        (0 until Subs).map(sub => Lloyd.assignL2(
          slice(col("v"), 16 * sub + 1, 16),
          loaded.codebooks(sub)).as(s"k$sub")): _*)
  }

  /** Delta-ingest `emb` into the committed index at `dir` WITHOUT
    * retraining (X311): new vectors are encoded against the frozen
    * committed artifacts, and ONE append-commit publishes them as a
    * NEW CODES SEGMENT — the existing codes files are carried forward
    * by reference in the swapped manifest, never rewritten (X317:
    * what makes a 100 TB delta O(delta), not O(corpus) — the r16
    * full-rewrite form paid a corpus rewrite per delta). Readers
    * atomically flip from the pre-ingest corpus to old ∪ new and can
    * never see a half-ingested state; repeated deltas accumulate
    * segments until [[compact]] folds them.
    *
    * Idempotence guard (ADVICE r16): the delta's vec_ids must be
    * DISJOINT from the committed corpus — a retried job that already
    * committed would otherwise silently duplicate coded rows and
    * skew topK candidate multiplicity. One anti-join count decides;
    * the caller of a retryable pipeline checks-then-skips. */
  def ingest(emb: DataFrame, dir: String): Unit = {
    val s = emb.sparkSession
    val loaded = load(s, dir)
    val dup = emb.select("vec_id")
      .join(loaded.codes.select("vec_id"), Seq("vec_id"), "left_semi")
      .count()
    require(dup == 0L,
      s"ingest into $dir: $dup vec_ids already committed — deltas " +
        "must be disjoint (a retry of a committed delta re-ingests)")
    // materialize the segment BEFORE the swap: encode reads manifest
    // files the append itself re-references
    val newCodes = encode(loaded, emb).localCheckpoint(true)
    Shard.appendTablesAtomic(Seq("codes" -> newCodes), dir,
      Shard.newCommitId())
    Shard.gcOldCommits(s, dir)
  }

  /** Compact the index (X317 — VERDICT r16 #5): fold the base codes
    * segment and every delta segment into ONE fresh codes table,
    * republished with the (unchanged) centroids/codebooks under a
    * single manifest swap — readers never see a half state: before
    * the swap they read the fragmented chain, after it the single
    * segment, and a crash mid-compaction leaves only unreferenced
    * files. [[Shard.gcOldCommits]] then retires every superseded
    * segment prefix, bounding disk. At 100 TB this is the table
    * format's background compaction: one scan + one write of the
    * codes table, amortized over many O(delta) ingests. */
  def compact(s: SparkSession, dir: String): Unit = {
    val loaded = load(s, dir)
    // materialize BEFORE the swap: the rewrite must not read codes
    // files its own publish step's GC retires
    val merged = loaded.codes.localCheckpoint(true)
    import s.implicits._
    val centroidsDf = loaded.centroids.zipWithIndex
      .map { case (cv, c) => (c, cv.toSeq) }.toSeq.toDF("c", "cv")
    val codebooksDf = (for {
      sub <- 0 until Subs
      c <- 0 until 4
    } yield (sub, c, loaded.codebooks(sub)(c).toSeq))
      .toDF("sub", "c", "cv")
    Shard.writeTablesAtomic(
      Seq("centroids" -> centroidsDf, "codebooks" -> codebooksDf,
        "codes" -> merged), dir, Shard.newCommitId())
    Shard.gcOldCommits(s, dir)
  }

  /** Build only if `dir` has no committed index (the serve path's
    * build-once guard — a second call is a no-op, AnnIndexSpec pins
    * it). */
  def ensureBuilt(emb: DataFrame, dir: String,
      fitKey: String = null): Unit = {
    if (!Shard.hasCommittedTables(emb.sparkSession, dir, tableNames))
      build(emb, dir, fitKey = fitKey)
  }

  /** The committed driver-side artifacts: centroids ordered by c,
    * codebooks ordered by (sub, c) — both bounded metadata (16 + 16
    * rows); `codes` stays a DataFrame (corpus-sized). */
  final case class Loaded(centroids: Array[Array[Double]],
      codebooks: IndexedSeq[Array[Array[Double]]], codes: DataFrame)

  def load(s: SparkSession, dir: String): Loaded = {
    val cents = Shard.readTableViaManifest(s, dir, "centroids")
      .orderBy("c").collect()
      .map(r => r.getSeq[Double](1).toArray)
    require(cents.length == Nlist, s"index at $dir: ${cents.length} centroids")
    val books = Shard.readTableViaManifest(s, dir, "codebooks")
      .orderBy("sub", "c").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map(_._2.map(_._2).toArray)
    require(books.length == Subs && books.forall(_.length == 4),
      s"index at $dir: malformed codebooks")
    Loaded(cents, books,
      Shard.readTableViaManifest(s, dir, "codes"))
  }

  /** [[Lloyd.sqDist]]'s pinned 0.0-init accumulation over one 16-dim
    * subspace slice (the ADC table lane). */
  private def d16(a: Array[Double], off: Int, b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < 16) {
      val t = a(off + i) - b(i); acc = acc + t * t; i += 1
    }
    acc
  }

  /** Serve top-k for driver-side query vectors FROM THE COMMITTED
    * ARTIFACTS ONLY — zero training: probes and ADC tables are
    * computed from the loaded centroids/codebooks, candidates come
    * from the probe equi-join on `codes`, scoring is 4 code-table
    * equi-joins (the X292 plan, with the frame swapped for the
    * manifest-read table). */
  def topK(loaded: Loaded, queries: Seq[(Long, Array[Double])],
      k: Int = 10, nprobe: Int = 4): DataFrame = {
    val s = loaded.codes.sparkSession
    import s.implicits._
    val ivf = Similarity.IvfIndex(loaded.centroids)
    val probes = broadcast(queries.flatMap { case (qid, qv) =>
      ivf.probeLists(qv, nprobe).map(l => (qid, l))
    }.toDF("pqid", "list_id"))
    val qd = (0 until Subs).map { sub =>
      val rows = for {
        (qid, qv) <- queries
        c <- 0 until 4
      } yield (qid, c, d16(qv, 16 * sub, loaded.codebooks(sub)(c)))
      broadcast(rows.toDF("qid", s"c$sub", s"d$sub"))
    }
    val est = loaded.codes
      .join(probes, Seq("list_id"))
      .join(qd(0), col("c0") === col("k0") && qd(0)("qid") === col("pqid"))
      .join(qd(1), col("c1") === col("k1") && qd(1)("qid") === col("pqid"))
      .join(qd(2), col("c2") === col("k2") && qd(2)("qid") === col("pqid"))
      .join(qd(3), col("c3") === col("k3") && qd(3)("qid") === col("pqid"))
      .where(col("vec_id") =!= col("pqid"))
      .select(col("pqid").as("query_id"),
        col("vec_id").as("neighbor_id"),
        (((col("d0") + col("d1")) + col("d2")) + col("d3")).as("adist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    est.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adist")
  }
}
