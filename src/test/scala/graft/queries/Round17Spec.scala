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

  // ------------------------------------- X316 WordPiece encode kernel

  /** Reference implementation the kernel must equal: per-position
    * greedy longest vocab match with single-code-point fallback —
    * the "per-round replay" the oracle runs relationally. */
  private def naiveWordPiece(word: String, vocab: Set[String]): Seq[String] = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val hit = (math.min(maxLen, word.length - pos) to 1 by -1)
        .find(l => vocab.contains(word.substring(pos, pos + l)))
      val len = hit.getOrElse(Character.charCount(word.codePointAt(pos)))
      val raw = word.substring(pos, pos + len)
      out += (if (pos == 0) raw else "##" + raw)
      pos += len
    }
    out.result()
  }

  /** Kernel ≡ naive replay over randomized vocab/word draws (seeded —
    * reproducible), exercising longest-vs-shorter overlaps, merged
    * multi-char symbols, and OOV fallback chars. */
  test("WordPieceEncode kernel ≡ naive longest-match replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val alphabet = "abcde"
    for (trial <- 1 to 5) {
      val syms = (Seq("a", "b", "c") ++ (1 to 6).map(_ =>
        (1 to (2 + rnd.nextInt(3))).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString)).distinct
      val words = (1 to 40).map(_ => (1 to (1 + rnd.nextInt(12))).map(_ =>
        // 'z' never in vocab -> fallback path exercised
        if (rnd.nextInt(8) == 0) 'z'
        else alphabet(rnd.nextInt(alphabet.length))).mkString).distinct
      val got = words.toDF("word")
        .select(col("word"),
          graft.functions.WordPieceFunctions.wordpieceEncode(
            col("word"), syms).as("toks"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      words.foreach { w =>
        assert(got(w) == naiveWordPiece(w, syms.toSet),
          s"trial $trial word '$w' vocab $syms")
      }
    }
  }

  /** OOV totality: strip the ## marks, concatenate, recover the word
    * — for EVERY input, including characters no vocabulary has
    * (astral code points exercise the surrogate-pair fallback). */
  test("WordPieceEncode: round-trips all input, no [UNK] black hole") {
    import spark.implicits._
    val vocab = Seq("ab", "cd", "a", "naï")
    val words = Seq("abcd", "qxz", "naïve", "日本語", "a🙂b", "zzz")
    val rows = words.toDF("word")
      .select(col("word"),
        graft.functions.WordPieceFunctions.wordpieceEncode(
          col("word"), vocab).as("toks"))
      .collect()
    rows.foreach { r =>
      val w = r.getString(0)
      val toks = r.getSeq[String](1)
      assert(toks.head.take(2) != "##" || w.startsWith("##"))
      val rebuilt = toks.head + toks.tail.map(_.stripPrefix("##")).mkString
      assert(rebuilt == w, s"'$w' round-tripped to '$rebuilt' via $toks")
    }
  }

  // ----------------------- VERDICT r16 #8: shared ANN-family fits

  /** FitCache transparency: the memoized fits are pure functions of
    * (sf dir, parameters), so a cold-cache run and a warmed-cache run
    * of an ANN row produce IDENTICAL rows — caching can never change
    * a result, only when training cost is paid. */
  test("FitCache: warmed ≡ cold for the ANN family") {
    graft.ops.FitCache.clear()
    val cold = SparkEntry.queries("q_ann_ivfpq")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    graft.queries.ClusterQueries.warmAnnFits(spark, Sf0001)
    val warm = SparkEntry.queries("q_ann_ivfpq")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(cold == warm, "fit caching changed a query result")
    graft.ops.FitCache.clear()
    val recold = SparkEntry.queries("q_ann_opq")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    graft.queries.ClusterQueries.warmAnnFits(spark, Sf0001)
    val rewarm = SparkEntry.queries("q_ann_opq")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(recold == rewarm)
  }

  // ------------------------------- X319 unigram-LM (SentencePiece)

  /** Brute-force reference: enumerate EVERY segmentation, keep the
    * min total nll; among cost-ties prefer the longer token at the
    * earliest position (lexicographically-descending length
    * sequence) — exactly the kernel's forward-walk rule. */
  private def allSegs(word: String,
      nll: Map[String, Long]): Seq[(Seq[String], Long)] = {
    if (word.isEmpty) Seq((Seq.empty, 0L))
    else (1 to math.min(4, word.length)).flatMap { l =>
      val tok = word.take(l)
      nll.get(tok).toSeq.flatMap { c =>
        allSegs(word.drop(l), nll).map { case (rest, rc) =>
          (tok +: rest, c + rc)
        }
      }
    }
  }

  test("UnigramViterbi kernel = brute-force min-cost segmentation") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val alphabet = "abc"
    for (trial <- 1 to 5) {
      val toks = (alphabet.map(_.toString) ++ (1 to 5).map(_ =>
        (1 to (2 + rnd.nextInt(3))).map(_ =>
          alphabet(rnd.nextInt(3))).mkString)).distinct
      // deliberately tie-prone nll values (small integer range)
      val vocab = toks.map(t => (t, 1L + rnd.nextInt(4))).toSeq
      val nll = vocab.toMap
      val words = (1 to 30).map(_ => (1 to (1 + rnd.nextInt(8))).map(_ =>
        alphabet(rnd.nextInt(3))).mkString).distinct
      val got = words.toDF("word")
        .select(col("word"),
          graft.functions.UnigramFunctions.unigramViterbi(
            col("word"), vocab).as("toks"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      words.foreach { w =>
        val want = allSegs(w, nll).reduceLeft { (a, b) =>
          if (b._2 < a._2) b
          else if (b._2 > a._2) a
          else { // equal cost: length sequence lexicographically DESC
            val cmp = a._1.map(_.length).zip(b._1.map(_.length))
              .find { case (x, y) => x != y }
              .map { case (x, y) => x - y }.getOrElse(0)
            if (cmp >= 0) a else b
          }
        }._1
        assert(got(w) == want,
          s"trial $trial '$w': kernel ${got(w)} vs brute $want " +
            s"(vocab $vocab)")
      }
    }
  }

  /** Prune-order determinism (VERDICT r16 #7): the kept set is a
    * pure function of exact-integer (em_count, token) ordering —
    * re-running the query yields the identical vocabulary decision,
    * every single character survives (coverage totality), and
    * exactly 12 multi-char tokens are kept. */
  test("q_unigram_tokenizer: deterministic prune, total char coverage") {
    val run1 = SparkEntry.queries("q_unigram_tokenizer")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    val run2 = SparkEntry.queries("q_unigram_tokenizer")(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(run1 == run2, "prune order not deterministic across runs")
    val rows = SparkEntry.queries("q_unigram_tokenizer")(spark, Sf0001)
      .collect()
    val singles = rows.filter(_.getAs[String]("token").length == 1)
    assert(singles.nonEmpty && singles.forall(_.getAs[Boolean]("kept")),
      "a single character was pruned — coverage totality broken")
    val multisKept = rows.count(r =>
      r.getAs[String]("token").length > 1 && r.getAs[Boolean]("kept"))
    assert(multisKept == math.min(12,
      rows.count(_.getAs[String]("token").length > 1)))
    // the EM actually moved mass: some seed token must lose all its
    // occurrences to overlapping cheaper segmentations
    assert(rows.exists(r => r.getAs[Long]("em_count") == 0L &&
      r.getAs[Long]("seed_count") > 0L))
  }

  // ---------------------- X317 segment ingest + compaction (+ ADVICE)

  /** The append path's core property: a delta-ingest carries the
    * BASE commit's files forward by reference — the manifest after
    * ingest names files under BOTH the build prefix and the delta
    * prefix (O(delta) ingest; nothing rewritten), GC keeps every
    * referenced prefix, and compaction folds the chain back to ONE
    * prefix with the superseded segments retired from disk. */
  test("ANN ingest appends a segment; compact folds the chain and GCs") {
    import graft.ops.{AnnIndex, Shard}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annseg").toString
    val emb = graft.Tables.embeddings(spark, Sf0001)
    AnnIndex.build(emb, dir,
      codeEmb = emb.filter(col("vec_id") % 2 === 0))
    val basePrefixes = Shard.livePrefixes(spark, dir)
    assert(basePrefixes.size == 1)
    AnnIndex.ingest(emb.filter(col("vec_id") % 2 === 1), dir)
    val fragged = Shard.livePrefixes(spark, dir)
    assert(fragged.size == 2, s"expected base+delta, got $fragged")
    assert(fragged.intersect(basePrefixes) == basePrefixes,
      "ingest rewrote the base segment instead of referencing it")
    AnnIndex.compact(spark, dir)
    val compacted = Shard.livePrefixes(spark, dir)
    assert(compacted.size == 1 &&
      compacted.intersect(fragged).isEmpty,
      "compaction must publish one FRESH segment")
    // GC retired the superseded prefixes from disk
    val dataDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dataDirs == compacted,
      s"stale segment prefixes survive GC: ${dataDirs -- compacted}")
    assert(AnnIndex.load(spark, dir).codes.count() == emb.count())
  }

  /** Crash MID-COMPACTION: files of the would-be compacted commit
    * land on disk but the manifest swap never happens — readers must
    * still resolve the fragmented-but-consistent chain (the X299
    * torn-write argument applied to compaction). */
  test("ANN compact: crash before the manifest swap is invisible") {
    import graft.ops.{AnnIndex, Shard}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-anncrash").toString
    val emb = graft.Tables.embeddings(spark, Sf0001)
    AnnIndex.build(emb, dir,
      codeEmb = emb.filter(col("vec_id") % 2 === 0))
    AnnIndex.ingest(emb.filter(col("vec_id") % 2 === 1), dir)
    val before = Shard.livePrefixes(spark, dir)
    val codesBefore = AnnIndex.load(spark, dir).codes.count()
    // a compaction that dies after writing its files, before the swap
    val orphan = Shard.newCommitId()
    AnnIndex.load(spark, dir).codes.write
      .parquet(s"$dir/data/$orphan/codes")
    assert(Shard.livePrefixes(spark, dir) == before,
      "unswapped compaction files leaked into the live manifest")
    assert(AnnIndex.load(spark, dir).codes.count() == codesBefore)
    // the real compaction afterwards still succeeds and GC sweeps
    // the orphan prefix with the superseded segments
    AnnIndex.compact(spark, dir)
    val dataDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(!dataDirs.contains(orphan), "orphan prefix survived GC")
    assert(AnnIndex.load(spark, dir).codes.count() == codesBefore)
  }

  /** Idempotence guard (ADVICE r16): re-ingesting vec_ids the index
    * already committed — the retried-job shape — is REFUSED instead
    * of silently duplicating coded rows. */
  test("ANN ingest: a re-ingested (already-committed) delta is refused") {
    import graft.ops.AnnIndex
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annidem").toString
    val emb = graft.Tables.embeddings(spark, Sf0001)
    AnnIndex.build(emb, dir,
      codeEmb = emb.filter(col("vec_id") % 2 === 0))
    val delta = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.ingest(delta, dir)
    val n = AnnIndex.load(spark, dir).codes.count()
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.ingest(delta, dir) // the retry of a committed delta
    }
    assert(ex.getMessage.contains("disjoint"))
    assert(AnnIndex.load(spark, dir).codes.count() == n,
      "refused ingest must leave the index untouched")
  }

  // ------------------------------- X323 unigram pruned-vocab encode

  /** Cross-query consistency + conservation: the serving pass may
    * emit ONLY tokens q_unigram_tokenizer's prune kept, and the
    * freq-weighted character mass of the emitted tokens must equal
    * the corpus's word-character mass exactly (segmentation loses
    * nothing, duplicates nothing). */
  test("q_unigram_encode: kept-set consistency and char conservation") {
    val kept = SparkEntry.queries("q_unigram_tokenizer")(spark, Sf0001)
      .collect().filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[String]("token")).toSet
    val enc = SparkEntry.queries("q_unigram_encode")(spark, Sf0001)
      .collect()
    assert(enc.nonEmpty)
    val emitted = enc.map(_.getAs[String]("token")).toSet
    assert(emitted.subsetOf(kept),
      s"serving emitted pruned tokens: ${emitted -- kept}")
    val tokenChars = enc.map(r =>
      r.getAs[Long]("n_occurrences") *
        r.getAs[String]("token").length).sum
    val words = graft.Tables.documents(spark, Sf0001)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 12)
      .agg(sum(length(col("w")))).head().getLong(0)
    assert(tokenChars == words,
      s"character mass not conserved: tokens $tokenChars vs corpus $words")
  }

  // ------------------------------- X322 cross-tokenizer comparison

  /** The comparison is only meaningful on ONE universe: every lane
    * must count the identical word occurrences. And the family
    * contrast must show: the unigram seed (3-4-char substrings)
    * compresses hardest, 3 BPE merges beat the char floor, WordPiece's
    * PMI merges (rare-but-correlated pairs) buy less compression per
    * merge than BPE's frequency merges — the canonical criterion
    * contrast, now measured in one frame. */
  test("q_tokenizer_compare: shared universe, family compression order") {
    val rows = SparkEntry.queries("q_tokenizer_compare")(spark, Sf0001)
      .collect().map(r => r.getAs[String]("tokenizer") -> r).toMap
    assert(rows.keySet == Set("char", "bpe", "wordpiece", "unigram"))
    val occs = rows.values.map(_.getAs[Long]("n_word_occurrences")).toSet
    assert(occs.size == 1, s"lanes diverged on the word universe: $occs")
    def f(t: String) = rows(t).getAs[Double]("tokens_per_word")
    assert(rows("char").getAs[Double]("chars_per_token") == 1.0)
    assert(f("unigram") < f("bpe"), "unigram seed should compress hardest")
    assert(f("bpe") < f("wordpiece"),
      "BPE's frequency merges should out-compress WordPiece's PMI merges")
    assert(f("wordpiece") < f("char"), "any tokenizer beats the char floor")
  }

  // ----------------------- X320 beam curve + X321 graph delta-ingest

  /** The beam (ef) knob's measured trade on the committed graph:
    * widening the beam scans strictly more and ends at least as good
    * — the endpoints bracket the q_ann_graph_index_query operating
    * point (beam = 8). */
  test("q_ann_beam_curve: wider beam scans more, recall holds or rises") {
    val rows = SparkEntry.queries("q_ann_beam_curve")(spark, Sf0001)
      .collect()
    val byBeam = rows.groupBy(_.getAs[Int]("beam")).map { case (b, rs) =>
      b -> (rs.map(_.getAs[Long]("n_scored").toDouble).sum / rs.length,
        rs.map(_.getAs[Double]("recall")).sum / rs.length)
    }
    val beams = Seq(2, 4, 8, 16)
    assert(byBeam.keySet == beams.toSet)
    beams.sliding(2).foreach { case Seq(a, b) =>
      assert(byBeam(b)._1 > byBeam(a)._1,
        s"beam $b scanned no more than beam $a")
    }
    assert(byBeam(16)._2 >= byBeam(2)._2,
      "widest beam lost recall vs narrowest")
  }

  /** Dong et al. §2.3's claim, proven mechanically: the new/old flag
    * rule skips only pairs ALREADY generated in an earlier round, so
    * flagged descent from an all-fresh init equals full-rescoring
    * descent from the same init — edge for edge, cosine for cosine.
    * This is what licenses the X321 warm start to touch only
    * delta-perturbed neighborhoods. */
  test("descendFlagged ≡ full-rescore descent on an identical init") {
    import graft.ops.AnnGraph
    val e = SimilarityQueries.simEmbFrame(spark, Sf0001)
    val n = e.count()
    val g0 = AnnGraph.score(e, AnnGraph.latticeEdges(e, n, 16, 37L))
      .localCheckpoint(true)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("src", "dst", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    val full = canon(AnnGraph.descendFrom(e, g0, 16, 2))
    val flagged = canon(AnnGraph.descendFlagged(e,
      g0.withColumn("fresh", lit(true)), 16, 2))
    assert(flagged.toSeq == full.toSeq,
      "flag rule changed the descent result")
    // r20 NOTE: this equivalence is NOT a depth-independent theorem —
    // at 5 rounds on this fixture the two DIVERGE, because the
    // rev-cap top-k by dst churns between rounds: an old edge can
    // RE-ENTER a node's capped reverse set in a later round, forming
    // an old-old pair the flag rule skips but full rescore generates.
    // The 2-round warm window [[graft.ops.AnnGraph.ingest]] uses is
    // what this test pins (and the delta oracle REPLAYS the flagged
    // rounds, so flagged is the defined semantics there); do NOT swap
    // build's full-rescore rounds to the flag rule.
  }

  /** Graph delta-ingest contract: after build-half + ingest-rest the
    * committed graph covers the WHOLE corpus (every node keeps ≥ 1
    * edge, one entry), and re-ingesting already-committed ids is
    * refused (the X311 retry guard). */
  test("q_ann_graph_index_delta: full coverage; re-ingest refused") {
    val rows = SparkEntry.queries("q_ann_graph_index_delta")(
      spark, Sf0001).collect()
    val n = SimilarityQueries.simEmbFrame(spark, Sf0001).count()
    assert(rows.length == n)
    assert(rows.forall(_.getAs[Long]("deg_after") >= 1L))
    assert(rows.count(_.getAs[Boolean]("is_entry")) == 1)
    // the query left a committed index behind; a retried delta must
    // be refused, not silently re-wired
    val dir = SimilarityQueries.annGraphDir(Sf0001) + "_delta"
    val e = SimilarityQueries.simEmbFrame(spark, Sf0001)
    val ex = intercept[IllegalArgumentException] {
      graft.ops.AnnGraph.ingest(e, col("id") >= n / 2, dir)
    }
    assert(ex.getMessage.contains("disjoint"))
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
