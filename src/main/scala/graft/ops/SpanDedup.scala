package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Intra-document repeated-span removal — the WITHIN-document
  * granularity of deduplication (Lee et al. 2021's exact-substring
  * observation, applied at token-window granularity): a k-token window
  * that already occurred earlier in the same document marks its tokens
  * for removal, and the document is rebuilt from the survivors.
  * Corpus-level dedup (minhash/exact, ops.Dedup) can't see this
  * pathology — generated boilerplate loops and scraper stutter repeat
  * INSIDE single documents.
  *
  * Scale contract: the production `clean` runs the fused
  * [[graft.functions.SpanDedupStats]] codegen kernel — one O(n·k)
  * hash-map pass per document, no shuffle, no explode. The composed
  * HOF form (`cleanComposed`) is kept as the independently-derived
  * cross-check (SpanDedupSpec pins kernel ≡ composed on random
  * corpora) and as the shape the DuckDB oracle replays; its per-row
  * cost is O(windows²) interpreted expression evals (~385 µs/doc at
  * the 1M-doc stress scale), which is why it is not the production
  * path. All positions are integers and window equality is exact
  * string equality, so both forms and the SQL oracle rebuild cleaned
  * text byte-for-byte.
  */
object SpanDedup {

  /** Adds (n_tokens, n_dup_windows, n_removed, cleaned_text) for
    * `textCol` under k-token windows, keeping `idCol` — fused-kernel
    * production path. */
  def clean(df: DataFrame, idCol: String, textCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, "window size must be at least 2")
    df.select(col(idCol),
        graft.functions.SpanFunctions.spanDedupStats(textCol, k).as("__s"))
      .select(col(idCol),
        col("__s.n_tokens").as("n_tokens"),
        col("__s.n_dup_windows").as("n_dup_windows"),
        col("__s.n_removed").as("n_removed"),
        col("__s.cleaned_text").as("cleaned_text"))
  }

  /** The composed expression-only HOF formulation — cross-check twin
    * of `clean`, quadratic per row in window count. */
  def cleanComposed(df: DataFrame, idCol: String, textCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, "window size must be at least 2")
    val emptyInts = array().cast("array<int>")
    val nW = greatest(size(col("__toks")) - (k - 1), lit(0))
    df.select(col(idCol), Text.tokens(textCol).as("__toks"))
      .withColumn("__wins",
        when(nW >= 1, transform(sequence(lit(1), nW),
          i => array_join(slice(col("__toks"), i, lit(k)), " ")))
          .otherwise(array().cast("array<string>")))
      .withColumn("__dups",
        when(size(col("__wins")) >= 1,
          filter(sequence(lit(1), size(col("__wins"))),
            i => array_position(col("__wins"),
              element_at(col("__wins"), i)) < i))
          .otherwise(emptyInts))
      .withColumn("__rm",
        flatten(transform(col("__dups"), i => sequence(i, i + (k - 1)))))
      .withColumn("__kept",
        when(size(col("__toks")) >= 1,
          filter(sequence(lit(1), size(col("__toks"))),
            p => !array_contains(col("__rm"), p)))
          .otherwise(emptyInts))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__dups")).cast("long").as("n_dup_windows"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_removed"),
        array_join(transform(col("__kept"),
          p => element_at(col("__toks"), p)), " ").as("cleaned_text"))
  }
}
