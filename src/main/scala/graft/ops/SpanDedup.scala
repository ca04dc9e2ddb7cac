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
  * Scale contract: expression-only array HOFs over the staged token
  * array — no shuffle, no explode, a pure scan; per-row cost is
  * O(windows²) string compares inside one task (documents are bounded;
  * the quadratic never crosses rows). Every stage is materialized as
  * an attribute so interpreted HOFs are not re-evaluated. All
  * positions are integers and window equality is exact string
  * equality, so a SQL oracle reproduces cleaned text byte-for-byte.
  */
object SpanDedup {

  /** Adds (n_tokens, n_dup_windows, n_removed, cleaned_text) for
    * `textCol` under k-token windows, keeping `idCol`. */
  def clean(df: DataFrame, idCol: String, textCol: Column,
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
