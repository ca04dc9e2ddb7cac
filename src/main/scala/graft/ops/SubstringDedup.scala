package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document exact-substring dedup (Lee et al. 2021, corpus-wide
  * — X53's span semantics at global scope): a k-token window whose
  * exact text occurs anywhere earlier in the corpus (global
  * (doc_id, pos) order) marks its tokens for removal; overlapping
  * spans union; documents are rebuilt from survivors.
  *
  * Lee et al. build suffix arrays; the shuffle-native equivalent at
  * k-gram granularity keys every window with a positional 60-bit md5
  * shingle key ([[graft.functions.Md5ShingleKeysAll]]), so:
  *
  *   - winner election shuffles 16-byte (key, doc_id, pos) triples
  *     only — text never crosses a shuffle;
  *   - per-doc duplicate-position lists rejoin documents on doc_id
  *     (uniform keys, bounded by doc length);
  *   - the span-union rebuild is the fused
  *     [[graft.functions.SpanRebuild]] codegen kernel — O(n + d·k)
  *     per document. (The composed HOF rebuild re-evaluates its
  *     mark-set expression per position after projection collapse —
  *     measured >90% of query time; the kernel removes that cliff.)
  *
  * '''Collision bound (hash-key, not verified-text, identity).'''
  * Duplicate windows are identified purely by the 60-bit shingle key;
  * window text is never compared. By the birthday bound, W distinct
  * windows produce ≈ W²/2^61 false-positive key collisions: negligible
  * through ~10^7 windows (sf-scale corpora, < 1e-4 expected), but at
  * 100 TB (~10^12 windows) on the order of 10^5–10^6 windows — a
  * ~1e-7 fraction — would be falsely marked duplicate and their
  * non-duplicate tokens silently removed. For corpus curation that
  * loss is noise (Lee et al.'s own pipeline tolerates far larger
  * boundary effects); where exactness matters, widen the key or add a
  * verification join on the actual k-token window text for keys whose
  * group contains >1 distinct window string before electing winners —
  * that join shuffles only the colliding ~1e-7 of windows.
  */
object SubstringDedup {

  /** (doc_id, n_tokens, n_dup_windows, n_removed, cleaned_text) —
    * global first-occurrence-wins span dedup of `textCol` under
    * k-token windows. */
  def clean(df: DataFrame, idCol: String, textCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, "window size must be at least 2")
    val e = df.select(col(idCol),
        posexplode(graft.functions.ShingleFunctions
          .md5ShingleKeysAll(textCol, k)).as(Seq("p0", "key")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("key"))
    val winners = e.groupBy("key")
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
    val dups = e.join(winners, "key")
      .filter(!(col(s"w.$idCol") === col(idCol) &&
        col("w.pos") === col("pos")))
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("dups"))
    df.select(col(idCol), textCol.as("__text"))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol),
        graft.functions.SpanFunctions.spanRebuild(col("__text"),
          coalesce(col("dups"), array().cast("array<int>")), k).as("__s"))
      .select(col(idCol),
        col("__s.n_tokens").as("n_tokens"),
        col("__s.n_dup_windows").as("n_dup_windows"),
        col("__s.n_removed").as("n_removed"),
        col("__s.cleaned_text").as("cleaned_text"))
  }
}
