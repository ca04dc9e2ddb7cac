package graft.ops

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with overlap — the
  * retrieval/context-window preparation step (documents → model-sized
  * pieces) complementing sequence packing (ops.Packing, which
  * concatenates SMALL docs; this splits LARGE ones).
  *
  * Chunk starts step by `size − overlap`; a tail window is emitted
  * only when it contributes tokens beyond the previous chunk's
  * overlap (start ≤ n − overlap), so no chunk is a suffix of its
  * predecessor. All boundary arithmetic is integer and the chunk text
  * is a deterministic join, so the full output is oracle-checkable.
  *
  * Scale: pure per-row expression work (sequence/slice/posexplode) —
  * no shuffle, no state; a 100 TB corpus chunks in one scan. Output
  * rows carry the chunk text itself; downstream stages that only need
  * counts/ids should prune the column (the scan stays columnar).
  */
object Chunker {

  /** One row per (doc, chunk): chunk_id (1-based), start_tok,
    * n_chunk_tokens, chunk_text. Token-less docs yield no rows. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    val starts = filter(sequence(lit(1), n, lit(stride)),
      s => s === 1 || s <= n - overlap)
    df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      // the filter must precede `starts`: sequence(1, 0) throws, so
      // token-less docs can never reach the start computation
      .filter(org.apache.spark.sql.functions.size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"), starts.as("__starts"))
      .select(col(idCol), posexplode(col("__starts")).as(Seq("__pos", "__s")),
        col("__toks"))
      .select(col(idCol),
        (col("__pos") + 1).cast("long").as("chunk_id"),
        col("__s").cast("long").as("start_tok"),
        org.apache.spark.sql.functions.size(
          slice(col("__toks"), col("__s"), lit(size))).cast("long")
          .as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("__s"), lit(size)), " ")
          .as("chunk_text"))
  }
}
