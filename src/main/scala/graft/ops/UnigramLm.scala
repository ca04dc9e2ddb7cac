package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenizer trainer (X258 — Kudo
  * 2018, the OTHER tokenizer every data pipeline meets next to X31's
  * BPE) by fixed-round SOFT EM over the corpus word-frequency table.
  *
  * Model: each word factorizes into vocabulary pieces; a word's
  * likelihood marginalizes over ALL segmentations (forward algorithm),
  * and EM re-estimates piece probabilities from posterior expected
  * counts (forward–backward). Soft EM is chosen over Viterbi hard-EM
  * deliberately: expected counts are pure sums of products — no
  * argmax backtrace — so the whole E-step is expressible as identical
  * element-wise arithmetic on both engines and the DuckDB oracle can
  * replay it exactly.
  *
  * Scale shape (the X31 bpeTrain discipline): the corpus is scanned
  * ONCE into a persisted word-frequency table; every EM round is ONE
  * map-side-combining aggregate keyed by piece over the words×slots
  * expansion (≤ `MaxWordLen`·`MaxPiece` fixed-width rows per word
  * type, never per token occurrence), and only the vocabulary-sized
  * (piece, expected-count) table — ≤ 26 + TopMulti rows — reaches the
  * driver, where the renormalized probabilities re-enter the next
  * round's scan as a literal map. At 100 TB that is ~38 doubles per
  * round regardless of corpus size.
  *
  * Determinism contract (the X189/X212 pinned-round discipline): the
  * result is "`rounds`-round soft EM from the substring-frequency
  * seed", not "the converged fit". Forward/backward lanes are
  * element-wise products/sums of q6 probability literals in a FIXED
  * association order (j = 1..MaxPiece, left-fold) — bit-identical
  * cross-engine; per-piece expected counts are the one aggregated
  * lane, quantized qround(4) (their magnitude is corpus token counts,
  * so the 1e-4 quantum leaves ~20× headroom over worst-case
  * fold-order drift — coarser than the usual q6 BY DESIGN); the
  * renormalized probabilities are qround(6) of exact divides.
  */
object UnigramLm {

  /** Words longer than this are excluded from the fit (keeps the
    * unrolled forward/backward DP at a fixed depth on both engines —
    * the recorded contract; production SentencePiece caps candidate
    * length the same way). */
  val MaxWordLen = 10

  /** Maximum piece length considered (seed and segmentation). */
  val MaxPiece = 4

  /** Multi-character seed pieces kept (count DESC, piece ASC). */
  val TopMulti = 12

  private def qd(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    math.floor(x * p + 0.5) / p
  }

  /** All (start i 0-based, length j) substring slots of an n-char
    * word, j ≤ MaxPiece — the shared expansion for seed counting and
    * the E-step. */
  private def slots(n: Column): Column =
    flatten(transform(sequence(lit(0), n - 1), i =>
      transform(sequence(lit(1), least(lit(MaxPiece), n - i)), j =>
        struct(i.as("i"), j.as("j")))))

  /** Lowercase word-frequency table, length-capped. Persist before
    * the EM rounds (each round re-reads it — the bpeTrain rule). */
  def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(graft.functions.Text.tokens(col("text")))
        .as("word"))
      .filter(col("word").rlike("^[a-z]+$") &&
        length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: every single character present + the TopMulti
    * most frequent length-2..MaxPiece substrings (frequency-weighted;
    * count DESC, piece ASC tie-break). Returns (piece, rawCount)
    * sorted by piece — bounded driver metadata. */
  def seedVocab(words: DataFrame): Seq[(String, Long)] = {
    val counts = words
      .select(col("freq"), col("word"),
        explode(slots(length(col("word")))).as("s"))
      .select(col("word").substr(col("s.i") + 1, col("s.j")).as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val chars = counts.filter(length(col("piece")) === 1)
      .collect() // ≤ 26 rows: bounded driver metadata
      .map(r => (r.getString(0), r.getLong(1)))
    val multi = counts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(TopMulti)
      .collect() // ≤ TopMulti rows
      .map(r => (r.getString(0), r.getLong(1)))
    (chars ++ multi).sortBy(_._1).toSeq
  }

  /** Initial probabilities: q6 of each seed count over the seed
    * total (exact-integer-fed divides — bit-identical cross-engine). */
  def initProbs(seed: Seq[(String, Long)]): Seq[(String, Double)] = {
    val total = seed.map(_._2).sum.toDouble
    seed.map { case (p, c) => p -> qd(c.toDouble / total, 6) }
  }

  /** One soft-EM round: forward–backward posterior expected piece
    * counts under `probs` (element-wise unrolled DP — alpha over the
    * word, beta as alpha over the REVERSED word with reversed-piece
    * lookups), freq-weighted and aggregated corpus-wide in ONE
    * piece-keyed shuffle; EC lanes qround(4), renormalized to
    * qround(6). Returns the updated (piece, prob), piece ASC. */
  /** Unrolled forward DP columns a0..aMaxWordLen:
    * a_k = sum_j a_{k-j} * p(word[k-j+1 .. k-j+j]). */
  private def forwardCols(df0: DataFrame,
      pOf: Column => Column): DataFrame = {
    var df = df0.withColumn("a0", lit(1.0))
    for (k <- 1 to MaxWordLen) {
      val terms = (1 to math.min(MaxPiece, k)).map { j =>
        col(s"a${k - j}") *
          pOf(col("word").substr(lit(k - j + 1), lit(j)))
      }
      df = df.withColumn(s"a$k", terms.reduceLeft(_ + _))
    }
    df
  }

  /** Marginal word likelihood under `probs`: adds `alpha_n` (the
    * forward total over all segmentations) to a frame with a `word`
    * column — the scoring half of the model, shared by the EM E-step
    * and the X264 corpus cross-entropy scorer. Element-wise on q6
    * literals — bit-identical cross-engine. */
  def forward(words: DataFrame, probs: Map[String, Double]): DataFrame = {
    val vlit = typedLit(probs)
    def pOf(sub: Column): Column =
      coalesce(element_at(vlit, sub), lit(0.0))
    forwardCols(words, pOf)
      .withColumn("alpha_n",
        element_at(array((0 to MaxWordLen).map(k => col(s"a$k")): _*),
          length(col("word")) + 1))
      .drop((0 to MaxWordLen).map(k => s"a$k"): _*)
  }

  def emRound(words: DataFrame, probs: Map[String, Double])
      : Seq[(String, Double)] = {
    val vlit = typedLit(probs)
    def pOf(sub: Column): Column =
      coalesce(element_at(vlit, sub), lit(0.0))
    var df = forwardCols(words, pOf)
    // backward, as forward over the reversed word: b_m covers the
    // last m characters; piece lookup un-reverses the slice
    df = df.withColumn("rw", reverse(col("word")))
      .withColumn("b0", lit(1.0))
    for (m <- 1 to MaxWordLen) {
      val terms = (1 to math.min(MaxPiece, m)).map { j =>
        col(s"b${m - j}") *
          pOf(reverse(col("rw").substr(lit(m - j + 1), lit(j))))
      }
      df = df.withColumn(s"b$m", terms.reduceLeft(_ + _))
    }
    val staged = df.select(col("word"), col("freq"),
      length(col("word")).as("n"),
      array((0 to MaxWordLen).map(k => col(s"a$k")): _*).as("aL"),
      array((0 to MaxWordLen).map(k => col(s"b$k")): _*).as("bL"))
    // posterior expected count of the piece at (i, j):
    //   alpha_i * p(piece) * beta_{n-i-j} / alpha_n
    val occ = staged
      .select(col("word"), col("freq"), col("n"), col("aL"), col("bL"),
        explode(slots(col("n"))).as("s"))
      .select(
        col("word").substr(col("s.i") + 1, col("s.j")).as("piece"),
        pOf(col("word").substr(col("s.i") + 1, col("s.j"))).as("p"),
        (col("freq").cast("double") *
          (((element_at(col("aL"), col("s.i") + 1) *
            pOf(col("word").substr(col("s.i") + 1, col("s.j")))) *
            element_at(col("bL"),
              col("n") - col("s.i") - col("s.j") + 1)) /
            element_at(col("aL"), col("n") + 1))).as("w"))
      .filter(col("p") > 0)
    val rows = occ.groupBy("piece").agg(sum("w").as("ec"))
      .collect() // ≤ vocab-size rows: bounded driver metadata
      .map(r => r.getString(0) -> qd(r.getDouble(1), 4))
      .sortBy(_._1)
    val total = rows.map(_._2).sum // piece-ASC left fold on the driver
    rows.map { case (pc, e) => pc -> qd(e / total, 6) }.toSeq
  }
}
