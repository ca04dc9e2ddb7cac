package graft.ops

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary construction + out-of-vocabulary coverage — the
  * tokenizer-fitting sanity pass a training-data pipeline runs before
  * committing to a vocab (what fraction of each document would map to
  * UNK?).
  *
  * Scale design (100 TB of text):
  *  - the token count is ONE shuffle with map-side partial aggregation
  *    (token → count), shuffling fixed-width (hash, count) pairs, never
  *    documents;
  *  - the top-k cut is a TakeOrdered over the AGGREGATED table (already
  *    ~vocab-cardinality sized) with a total order (count DESC, token
  *    ASC) — no global row_number window over raw data;
  *  - per-document coverage then BROADCASTS the k-row vocab and counts
  *    membership per token — the corpus is scanned once and never
  *    shuffles for the probe (same shape as the contamination check).
  */
object Vocab {

  /** Top-k tokens by frequency; ties at the cut break lexicographically
    * (deterministic, so the kept vocab is reproducible cross-engine). */
  def topK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)

  /** Per-document OOV stats against a (small, broadcast) vocabulary:
    * n_tokens, n_oov, oov_rate. Documents with zero tokens keep a row
    * (n_tokens = 0, NULL rate). */
  def oovStats(docs: DataFrame, vocab: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(Text.tokens(col(textCol)))
      .as("tok"))
    val marked = toks.join(broadcast(vocab.select(col("tok"),
      lit(1).as("in_vocab"))), Seq("tok"), "left")
    val stats = marked.groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") /
        nullif(col("n_tokens").cast("double"), lit(0.0)))
  }
}
