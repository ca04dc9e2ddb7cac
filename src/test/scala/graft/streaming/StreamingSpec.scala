package graft.streaming

import graft.{SparkSuite, Tables}
import graft.functions.Num
import org.apache.spark.sql.functions._

/** Streaming plans replayed over the bounded events table must agree
  * with their batch twins (stream/batch unification is the point of
  * Structured Streaming). */
class StreamingSpec extends SparkSuite {

  /** File streams need a directory: stage the single events.parquet
    * into a temp drop-folder, as a real ingest pipeline would. */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("windowedAgg stream result equals batch groupBy at completion") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val got = EventStream.runToCompletion(spark,
        EventStream.windowedAgg(stream), "win_test")
      .select(col("hour_start"), col("event_type"), col("n_events"),
        Num.qround(col("sum_value"), 6).as("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    val batch = Tables.events(spark, Sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Num.qround(sum("value"), 6).as("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    assert(got === batch)
  }

  test("stateful sessionizeStream equals the batch sessionization") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val got = EventStream.runToCompletion(spark,
        EventStream.sessionizeStream(stream), "sess_test",
        outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.queries.EventQueries.sessionize.fn(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("runningUserTotals matches batch per-user aggregation") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val got = EventStream.runToCompletion(spark,
        EventStream.runningUserTotals(stream), "user_test")
      .select(col("user_id"), col("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, Sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === batch)
  }
}
