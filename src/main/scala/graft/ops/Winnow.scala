package graft.ops

import graft.functions.ShingleFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS local-fingerprinting algorithm): over the
  * positional k-gram key sequence, slide a w-window of consecutive
  * keys and SELECT the window minimum (ties → the RIGHTMOST minimal
  * position); the distinct (position, key) selections are the
  * document's fingerprints.
  *
  * Guarantee (the paper's correctness property): any token run shared
  * between two documents of length ≥ w + k − 1 contains at least one
  * whole w-window on both sides, whose minimum is selected on both —
  * so every sufficiently long match shares a fingerprint KEY, while
  * the expected density of selections is only 2/(w+1) of positions.
  * That is the knob full-enumeration k-gram fingerprinting (X61's
  * every-window keys) lacks: winnowing stores ~2/(w+1) of the index
  * at a bounded detection-length cost, the right trade for a
  * plagiarism/overlap INDEX over a 100 TB corpus.
  *
  * This is the STATELESS ("simple") winnowing variant — each window
  * picks its rightmost minimum independently. The paper's ROBUST
  * variant prefers re-selecting the previous window's pick and is
  * inherently sequential (selection depends on scan history); the
  * stateless form is order-free and parallel — the distributed
  * choice — with the same guarantee and slightly denser output.
  *
  * Scale shape: keys come from the one-pass Md5ShingleKeysAll kernel;
  * window minima are per-row HOFs (no shuffle, no explode of
  * w-windows); only the selected (doc_id, pos, key) fingerprints —
  * ~2/(w+1) of positions — ever leave the row. The md5-derived keys
  * make every selection SQL-replayable.
  */
object Winnow {

  /** Per-document fingerprint table: (doc_id, pos, fp_key) — `pos`
    * the 1-based k-gram position selected, `fp_key` its 60-bit md5
    * key. Documents with fewer than k tokens have no k-gram windows
    * and contribute no rows (the Md5ShingleKeysAll convention). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame =
    selected(docs, idCol, textCol, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .select(col("doc_id"), col("fp.p").as("pos"),
        col("fp.h").as("fp_key"))

  /** MOSS-style overlap report: document pairs ranked by the number
    * of DISTINCT fingerprint keys they share — the detection readout
    * the winnowing index exists for (Schleimer et al. §MOSS). Keys
    * shared by more than `keyCap` documents are dropped before the
    * pair join (boilerplate protection — the Dedup.capBuckets
    * contract: bounded quadratic cost per key, recall traded on
    * ubiquitous keys, recorded not hidden). Only (key, doc_id) longs
    * shuffle. */
  def sharedFingerprintPairs(docs: DataFrame, idCol: String,
      textCol: String, k: Int, w: Int, keyCap: Int = 100): DataFrame = {
    val sel = fingerprints(docs, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp_key")).distinct()
    val keyDf = sel.groupBy("fp_key").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= keyCap).select("fp_key")
    val capped = sel.join(keyDf, Seq("fp_key"), "left_semi")
    capped.as("a").join(capped.as("b"),
        col("a.fp_key") === col("b.fp_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-document selection summary: (doc_id, n_grams, n_fp,
    * density) — density = n_fp / n_grams, the observable the 2/(w+1)
    * expectation bounds. */
  def stats(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame =
    selected(docs, idCol, textCol, k, w)
      .select(col("doc_id"), col("n").cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fp"))
      .withColumn("density",
        when(col("n_grams") === 0L, lit(null).cast("double"))
          .otherwise(graft.functions.Num.qround(
            col("n_fp").cast("double") / col("n_grams").cast("double"),
            6)))

  /** (doc_id, n, fps: array<struct<h,p>>) — the distinct rightmost-
    * minimum selections per w-window, via the one-pass O(n)
    * [[graft.functions.WinnowSelect]] deque kernel (the HOF
    * slice-per-window form costs O(n·w) with per-window copies and
    * measured 22 s at sf0.1 — the kernel is the fused-scan shape the
    * repo's other per-row loops use). Effective window = min(w, n) so
    * a doc shorter than w still yields selections (one whole-doc
    * window); n = 0 (fewer than k tokens) yields an empty set. */
  private def selected(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1)
    docs.select(col(idCol).as("doc_id"),
        ShingleFunctions.md5ShingleKeysAll(col(textCol), k).as("ks"))
      .select(col("doc_id"), size(col("ks")).as("n"),
        graft.functions.WinnowFunctions.winnowSelect(col("ks"), w)
          .as("fps"))
  }
}
