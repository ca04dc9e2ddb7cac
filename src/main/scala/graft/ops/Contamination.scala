package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination measurement — the standard pre-training
  * hygiene check: how much of each corpus document's k-gram set also
  * appears in a benchmark/eval set (n-gram overlap detection as used
  * for train/test decontamination in LLM data pipelines; 8-grams are
  * the common published choice).
  *
  * Construction: distinct word k-shingles per document, md5-derived
  * 60-bit shingle keys (portable — a SQL oracle reproduces them
  * bit-for-bit), the benchmark's shingle keys collapsed to a distinct
  * set and broadcast, then one hash-join + per-doc count.
  *
  * At 100 TB: the corpus side shuffles nothing — shingle keys are
  * joined map-side against the broadcast benchmark set and counts
  * partially aggregate before the per-doc shuffle (fixed-width
  * doc_id/count rows). A benchmark too large to broadcast degrades to
  * a shuffle hash join on the 8-byte key, never on shingle text.
  * Hash collisions (~2^-60 per cross pair) can overcount a hit;
  * the same trade the dedup family documents.
  */
object Contamination {

  /** Per-document overlap vs `benchmark`: (idCol, n_shingles, n_hits,
    * contamination = n_hits / n_shingles). Documents with an empty
    * shingle set get a NULL ratio. Shingle keys come from the one-pass
    * Md5ShingleKeys expression — value-identical to
    * `conv(substring(md5(shingle),1,15),16,10)` over exploded
    * wordShingles (cross-validated), minus the intermediate strings. */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val docSh = corpus.select(col(idCol).as("id"),
      explode(graft.functions.ShingleFunctions
        .md5ShingleKeys(col(textCol), k)).as("h"))
    val benchSh = benchmark
      .select(explode(graft.functions.ShingleFunctions
        .md5ShingleKeys(col(textCol), k)).as("h")).distinct()

    val perDoc = docSh
      .join(broadcast(benchSh.withColumn("__hit", lit(1))), Seq("h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_hits"))
    perDoc.select(col("id").as(idCol),
      col("n_shingles"), col("n_hits"),
      (col("n_hits").cast("double") /
        nullif(col("n_shingles").cast("double"), lit(0.0)))
        .as("contamination"))
  }
}
