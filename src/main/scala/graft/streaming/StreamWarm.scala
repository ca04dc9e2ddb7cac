package graft.streaming

import org.apache.spark.sql.SparkSession

/** One-time streaming-engine warm-up (VERDICT r17 #7): the FIRST
  * Structured Streaming query in a JVM pays fixed engine costs the
  * pipeline itself doesn't own — state-store provider init,
  * streaming-specific codegen, checkpoint metadata I/O paths, the
  * microbatch execution thread machinery. The two streaming bench
  * rows (q_stream_ann_ingest, q_stream_incremental_dedup) each spin
  * a full runtime, so whichever ran first absorbed that one-time tax
  * into ITS figure. This warm runs one trivial AvailableNow
  * microbatch over a one-row drop-folder once per JVM; Bench times
  * it before the query loop and discloses it (the warmAnnFits
  * pattern — the cost is reported, not hidden, and per-row figures
  * then measure the pipelines). Results are unaffected: the warm
  * touches only its own temp dir and checkpoint. */
object StreamWarm {
  // ADVICE r18: a compareAndSet flag flipped BEFORE the warm batch
  // finished let a concurrent second caller (the two streaming rows
  // under Verify's pool) proceed unwarmed, and a throwing warm was
  // never retried for the JVM's lifetime. ensure() now holds the
  // monitor until the warm query TERMINATES (so "ensure" ensures) and
  // only latches `warmed` on success — a failed warm is retried by
  // the next caller.
  @volatile private var warmed = false

  def ensure(s: SparkSession): Unit = synchronized {
    if (!warmed) {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-streamwarm")
      val src = tmp.resolve("src") // the parquet write creates it
      Seq(1L).toDF("x").coalesce(1).write.parquet(src.toString)
      val q = s.readStream
        .schema("x LONG")
        .parquet(src.toString)
        .writeStream
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      warmed = true // only after a SUCCESSFUL warm
    }
  }
}
