package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-16 operators: X303 NN-descent, X304 Count-Sketch, X305
  * streaming bottom-k quantile sample, X306 multiplicative-weights
  * online data mixing. Cross-engine value equality is the driver
  * oracle's job; these tests pin the ALGORITHMIC contracts the hash
  * check cannot express.
  */
class Round16Spec extends SparkSuite {

  private val Sf001 = "/root/testdata/sf0.01"

  // ------------------------------------------------- X303 NN-descent

  /** Per-node recall is MONOTONE over descent rounds: a true top-k
    * neighbor, once found, can only be evicted by a higher-cosine
    * node — and every node with higher cosine than a true top-k
    * member is itself a true top-k member, so hits never decrease.
    * This is the invariant that makes "run more rounds" always safe. */
  test("q_knn_descent: recall never decreases, and the descent works") {
    val rows = SparkEntry.queries("q_knn_descent")(spark, Sf0001)
      .collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val init = r.getAs[Double]("recall_init")
      val fin = r.getAs[Double]("recall_final")
      assert(fin >= init, s"recall decreased on node ${r.get(0)}")
    }
    val meanInit = rows.map(_.getAs[Double]("recall_init")).sum / 50
    val meanFin = rows.map(_.getAs[Double]("recall_final")).sum / 50
    // stride-lattice init is ~random (recall ≈ k/n); 5 rounds of
    // neighbor-of-neighbor joins must lift it by an order of magnitude
    assert(meanInit <= 0.15, s"init recall suspiciously high: $meanInit")
    assert(meanFin >= 0.5, s"descent under-converged: $meanFin")
  }

  // ------------------------------------------------ X304 Count-Sketch

  /** The defining contrast with count-min (q_countmin_freq): CMS
    * overestimates ALWAYS (one-sided min of non-negative collisions);
    * Count-Sketch's signed collisions cancel in expectation, so its
    * error is TWO-SIDED. On the sf0.01 fixture both signs actually
    * occur, and the median-of-5 keeps the magnitude bounded. */
  test("q_count_sketch: two-sided bounded error, exact on sparse input") {
    val errs01 = SparkEntry.queries("q_count_sketch")(spark, Sf001)
      .select("err").collect().map(_.getLong(0))
    assert(errs01.min < 0, "no underestimate — not two-sided")
    assert(errs01.max > 0, "no overestimate — not two-sided")
    assert(errs01.map(math.abs).sum.toDouble / errs01.length <= 25.0,
      "median-of-5 error magnitude out of the measured envelope")
    // sf0.001 is sparse enough that every top-20 estimate is exact
    val errs001 = SparkEntry.queries("q_count_sketch")(spark, Sf0001)
      .select("err").collect().map(_.getLong(0))
    assert(errs001.forall(_ == 0L),
      "sparse-input estimates should be exact")
  }

  // --------------------------------- X305 bottom-k pair sample aggregate

  /** BottomKPairs contract: k smallest distinct hashes win, hash
    * collisions keep the MINIMUM v (so update/merge order cannot leak
    * into the result), output ascends by h. */
  test("bottom_k_pairs: distinct-min semantics, bounded, ordered") {
    import graft.functions.SketchFunctions
    import spark.implicits._
    val df = Seq((5L, 2.0), (3L, 9.0), (5L, 1.0), (9L, 4.0), (1L, 7.0))
      .toDF("h", "v")
    val out = df.select(struct(col("h"), col("v")).as("hv"))
      .agg(SketchFunctions.bottomKPairs(col("hv"), 3).as("s"))
      .head().getSeq[Row](0)
    assert(out.map(r => (r.getLong(0), r.getDouble(1))) ==
      Seq((1L, 7.0), (3L, 9.0), (5L, 1.0)))
  }

  test("q_stream_quantile: sample saturates at K and estimates track") {
    val rows = SparkEntry.queries("q_stream_quantile")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nPop = r.getAs[Long]("n_pop")
      assert(r.getAs[Long]("sample_n") == math.min(128L, nPop))
      def rel(est: String, exact: String) = {
        val e = r.getAs[Double](est); val x = r.getAs[Double](exact)
        math.abs(e - x) / x
      }
      // 128-of-~200 sample: order statistics land near the truth
      assert(rel("est_p50", "exact_p50") <= 0.2, s"p50 off on $r")
      assert(rel("est_p90", "exact_p90") <= 0.2, s"p90 off on $r")
    }
  }

  // ------------------------------------------ X307 graph beam search

  /** The serving contract: the walk scores a corpus-size-independent
    * candidate set (≈ 1 + beam·kg·hops) yet finds most true
    * neighbors — the reason graph ANN serves without scanning. */
  test("q_knn_graph_search: bounded scan, useful recall") {
    val rows = SparkEntry.queries("q_knn_graph_search")(spark, Sf0001)
      .collect()
    assert(rows.length == 20)
    val n = 500 // sf0.001 embeddings corpus
    rows.foreach { r =>
      val scanned = r.getAs[Long]("n_scored")
      // the candidate budget 1 + beam·deg·hops is corpus-size
      // INDEPENDENT; at this 500-node fixture it sits near ~60% of n
      // (max measured 304) — the fraction, not the count, shrinks
      // with corpus growth
      assert(scanned < n * 7 / 10, s"scanned $scanned of $n — not bounded")
      assert(scanned >= 1L)
    }
    val meanRecall = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(meanRecall >= 0.5, s"routing under-performed: $meanRecall")
  }

  // ------------------------------------------------- X308 DeepWalk

  /** Walk mechanics: every emitted pair is a real co-occurrence, PMI
    * is consistent with its own counts, and the top-50 cut is a
    * total order. */
  test("q_deepwalk: pair counts and PMI are internally consistent") {
    val rows = SparkEntry.queries("q_deepwalk")(spark, Sf0001)
      .collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val a = r.getAs[Long]("a"); val b = r.getAs[Long]("b")
      assert(a < b, "pairs must be canonical (a < b)")
      assert(a >= 0 && b < 50, "nodes live on the 50-node domain carve")
      val cab = r.getAs[Long]("c_ab")
      assert(cab >= 1 && r.getAs[Long]("c_a") >= cab &&
        r.getAs[Long]("c_b") >= cab,
        "marginals must dominate the joint count")
    }
    val cs = rows.map(_.getAs[Long]("c_ab"))
    assert(cs.zip(cs.tail).forall { case (x, y) => x >= y },
      "top-50 must be sorted by co-occurrence")
  }

  // --------------------------------------------- X309 node2vec walks

  /** Walk validity: every emitted pair sits on the 50-node carve,
    * counts are canonical and consistent — and the biased walk
    * genuinely DIFFERS from X308's uniform walk on the same graph
    * and seeds (the bias did something). */
  test("q_node2vec: valid biased walks that differ from DeepWalk") {
    val n2v = SparkEntry.queries("q_node2vec")(spark, Sf0001).collect()
    val dw = SparkEntry.queries("q_deepwalk")(spark, Sf0001).collect()
    assert(n2v.length == 50)
    n2v.foreach { r =>
      val a = r.getAs[Long]("a"); val b = r.getAs[Long]("b")
      assert(a < b && a >= 0 && b < 50)
      assert(r.getAs[Long]("c_a") >= r.getAs[Long]("c_ab") &&
        r.getAs[Long]("c_b") >= r.getAs[Long]("c_ab"))
    }
    val pairsN2v = n2v.map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairsDw = dw.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsN2v != pairsDw, "bias produced identical top pairs")
  }

  // ----------------------------------------------- X310 k-fold CV

  /** CV mechanics — and the measurement CV exists for: folds
    * partition the corpus, the micro row is the exact fold sum, and
    * the held-out accuracy sits at CHANCE while the same fit scores
    * ~0.86 in-sample. This synthetic corpus's lang label is
    * content-independent (verified: stopword rates are equal across
    * labels), so the classifier can only memorize — the ~0.35
    * generalization gap is exactly what a single half-in-sample
    * split (X75's shape) structurally understates. */
  test("q_kfold_cv: folds partition, micro consistent, gap exposed") {
    import org.apache.spark.sql.functions.{col, when}
    val rows = SparkEntry.queries("q_kfold_cv")(spark, Sf0001).collect()
    assert(rows.length == 6) // 5 folds + micro
    val folds = rows.filter(_.getAs[Long]("fold") >= 0)
    val micro = rows.find(_.getAs[Long]("fold") == -1L).get
    assert(folds.map(_.getAs[Long]("n_test")).sum ==
      micro.getAs[Long]("n_test"))
    assert(folds.map(_.getAs[Long]("n_correct")).sum ==
      micro.getAs[Long]("n_correct"))
    assert(micro.getAs[Long]("n_test") == 500L) // every doc held out once
    val cvAcc = micro.getAs[Double]("acc")
    assert(cvAcc > 0.3 && cvAcc < 0.7, s"CV accuracy off-envelope: $cvAcc")
    // in-sample accuracy of the same device, fit on ALL docs
    val docs = graft.Tables.documents(spark, Sf0001)
    val labels = docs.select(col("doc_id"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    val feats = graft.ops.Scoring
      .featureCounts(docs, "doc_id", col("text"), 1024)
    val m = graft.ops.Scoring.trainNaiveBayes(feats, labels, "doc_id")
    val raw = org.apache.spark.sql.functions
      .element_at(col("__st"), 1) + org.apache.spark.sql.functions.lit(m.bias)
    val inAcc = docs.select(col("lang"),
        graft.ops.Scoring.inlineStats(col("text"), 1024, m.w).as("__st"))
      .select(((graft.functions.Num.qround(raw, 4) > 0) ===
        (col("lang") === "en")).cast("double").as("c"))
      .agg(org.apache.spark.sql.functions.avg("c")).head().getDouble(0)
    assert(inAcc - cvAcc >= 0.15,
      s"expected a memorization gap: in-sample $inAcc vs CV $cvAcc")
  }

  // ------------------------------------------ X311 ANN delta-ingest

  /** The atomicity + freeze contracts the oracle can't express: a
    * crash between the build commit and the ingest commit leaves
    * readers on the CONSISTENT half-coded index (never a torn state),
    * ingest adds exactly the delta, and the trained artifacts are
    * byte-frozen across it. */
  test("ann index delta: consistent between commits, artifacts frozen") {
    import org.apache.spark.sql.functions.col
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_delta_spec_${ProcessHandle.current().pid()}").getPath
    val emb = graft.Tables.embeddings(spark, Sf0001)
    val n = emb.count()
    graft.ops.AnnIndex.build(emb, dir,
      codeEmb = emb.filter(col("vec_id") % 2 === 0))
    // "crash" here: the committed state must be the complete half
    val half = graft.ops.AnnIndex.load(spark, dir)
    assert(half.codes.count() == (n + 1) / 2)
    graft.ops.AnnIndex.ingest(emb.filter(col("vec_id") % 2 === 1), dir)
    val full = graft.ops.AnnIndex.load(spark, dir)
    assert(full.codes.count() == n)
    assert(full.codes.select("vec_id").distinct().count() == n)
    assert(half.centroids.map(_.toSeq).toSeq ==
      full.centroids.map(_.toSeq).toSeq, "ingest must not move centroids")
    assert(half.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      full.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "ingest must not refit codebooks")
  }

  // --------------------------------------------- X313 RNG pruning

  /** The trade the rule makes, measured honestly: beam search over
    * the PRUNED graph scores a MATERIALLY smaller candidate set and
    * keeps recall useful. On this near-random fixture (no cluster
    * structure for diversity to exploit — the published navigability
    * wins are on structured corpora) the measured point is raw
    * 0.825 recall scanning more vs pruned 0.625 scanning less at
    * well under 3/4 of the edges: a real efficiency-for-recall trade,
    * not a free lunch, and the spec pins BOTH sides of it. (Driven
    * through the factored X307 search device on both edge sets; the
    * oracle checks the prune's arithmetic, this checks its effect.) */
  test("q_graph_prune: pruned graph trades bounded recall for less scan") {
    val e = SimilarityQueries.simEmbFrame(spark, Sf0001)
    val gk = SimilarityQueries.exactGraphEdges(e, 16).localCheckpoint(true)
    val kept = SimilarityQueries.rngKeptEdges(gk, e).localCheckpoint(true)
    val rawN = gk.count(); val keptN = kept.count()
    assert(keptN < (rawN * 3) / 4,
      s"rule barely pruned: $keptN of $rawN edges kept")
    def run(ug: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = SimilarityQueries.beamSearchEval(e, ug,
        q0 = 100L, q1 = 120L, beam = 8, hops = 5, k = 10).collect()
      (rows.map(_.getAs[Double]("recall")).sum / rows.length,
        rows.map(_.getAs[Long]("n_scored").toDouble).sum / rows.length)
    }
    val (rawRecall, rawScan) = run(SimilarityQueries.symmetrized(gk))
    val (prunedRecall, prunedScan) = run(SimilarityQueries.symmetrized(kept))
    assert(prunedScan < rawScan,
      s"pruning did not shrink the scanned set: $prunedScan vs $rawScan")
    assert(prunedRecall >= 0.5,
      s"pruning destroyed navigability: raw $rawRecall vs pruned $prunedRecall")
  }

  // ------------------------------------------------ X312 WordPiece

  /** The criterion bites: WordPiece's PMI argmax must pick a
    * different merge chain than BPE's frequency argmax on the same
    * corpus (here it finds 'qu' — q is almost always followed by u —
    * where BPE takes the merely-frequent 'er'), and each reported
    * score must be consistent with its own pair count. */
  test("q_wordpiece: PMI merges differ from BPE's frequency merges") {
    val wp = SparkEntry.queries("q_wordpiece")(spark, Sf0001).collect()
    val bpe = SparkEntry.queries("q_bpe_merges")(spark, Sf0001).collect()
    assert(wp.length == 3 && bpe.length == 3)
    wp.foreach { r =>
      assert(r.getAs[Long]("pair_count") >= 1L)
      assert(r.getAs[Double]("score") > 0.0)
    }
    val wpPairs = wp.map(r =>
      (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"))).toSeq
    val bpePairs = bpe.map(r =>
      (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"))).toSeq
    assert(wpPairs != bpePairs,
      "PMI and frequency criteria picked identical merges")
  }

  // ------------------------------------- X306 multiplicative weights

  test("q_online_mix: a proper mixture that actually moved") {
    val rows = SparkEntry.queries("q_online_mix")(spark, Sf0001)
      .collect()
    assert(rows.length == 20) // the source alphabet
    val ps = rows.map(_.getAs[Double]("p_final"))
    assert(math.abs(ps.sum - 1.0) < 1e-9, s"mixture sums to ${ps.sum}")
    rows.foreach { r =>
      val w = r.getAs[Double]("final_weight")
      val tr = r.getAs[Double]("total_reward")
      // rewards are in [0,1] per round: weights live in [1, 1.5^8]
      assert(w >= 1.0 && w <= math.pow(1.5, 8))
      assert(tr >= 0.0 && tr <= 8.0)
    }
    assert(ps.distinct.length > 1, "weights never moved off uniform")
  }
}
