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

  /** Content-defined chunking (X182 — rolling-window breakpoints,
    * the LBFS device of Muthitacharoen et al. 2001 and FastCDC's
    * ancestor): a chunk boundary falls after token p+k−1 whenever the
    * k-gram window key at position p ≡ 0 (mod `divisor`), so expected
    * chunk length ≈ divisor grams and — the whole point —
    * boundaries are SHIFT-RESISTANT: a token inserted at a document's
    * head realigns every boundary after the next cut, so chunk-hash
    * dedup catches duplicated content that fixed-offset chunking
    * (X29) and whole-doc exact dedup (X1) both miss. Stateless
    * windowed variant (no min/max chunk constraint): the boundary
    * predicate is pure per-position, hence one shuffle-free HOF scan
    * and an exact SQL replay. Keys are the portable positional md5
    * window keys (the X147 lane); chunk_hash is the portable 60-bit
    * md5 of the chunk text.
    *
    * @return one row per (doc, chunk): chunk_id (1-based), start_tok,
    *   n_chunk_tokens, chunk_hash, chunk_text. Token-less docs yield
    *   no rows; docs shorter than k tokens yield one whole-doc chunk. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, divisor: Int = 32): DataFrame = {
    require(k >= 1 && divisor >= 2)
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    val nk = org.apache.spark.sql.functions.size(col("__keys"))
    // gram positions whose window key cuts; the cut closes the chunk
    // at token p + k − 1
    val cutEnds = transform(
      filter(sequence(lit(1), greatest(nk, lit(1))),
        p => p <= nk && (element_at(col("__keys"), p) % divisor === 0)),
      p => p + (k - 1))
    val starts = filter(
      concat(array(lit(1)), transform(col("__cuts"), e => e + 1)),
      s => s <= n)
    df.select(col(idCol),
        graft.functions.Text.tokens(col(textCol)).as("__toks"),
        graft.functions.ShingleFunctions
          .md5ShingleKeysAll(col(textCol), k).as("__keys"))
      .filter(org.apache.spark.sql.functions.size(col("__toks")) > 0)
      .withColumn("__cuts", cutEnds)
      .select(col(idCol), col("__toks"), col("__cuts"),
        posexplode(starts).as(Seq("__pos", "__s")))
      .withColumn("__e",
        coalesce(element_at(filter(col("__cuts"),
          e => e >= col("__s")), 1),
          org.apache.spark.sql.functions.size(col("__toks"))))
      .select(col(idCol),
        (col("__pos") + 1).cast("long").as("chunk_id"),
        col("__s").cast("long").as("start_tok"),
        (col("__e") - col("__s") + 1).cast("long").as("n_chunk_tokens"),
        conv(substring(md5(array_join(slice(col("__toks"), col("__s"),
          col("__e") - col("__s") + 1), " ")), 1, 15), 16, 10)
          .cast("long").as("chunk_hash"),
        array_join(slice(col("__toks"), col("__s"),
          col("__e") - col("__s") + 1), " ").as("chunk_text"))
  }

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
