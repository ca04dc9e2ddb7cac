package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ops.PrefixSum must be bit-identical to the single-partition global
  * window it replaces — same total order, same integer arithmetic —
  * across benign, skewed, and degenerate key distributions, while
  * never planning a partition-less Window. */
class PrefixSumSpec extends SparkSuite {
  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum("v").over(w))
      .select("id", "cum").as[(Long, Long)].collect().toMap
  }

  private def twoPass(df: org.apache.spark.sql.DataFrame,
      buckets: Int = 8) =
    PrefixSum.runningTotalDesc(df, "v", "score", "id", "cum", buckets)
      .select("id", "cum").as[(Long, Long)].collect().toMap

  test("matches the global window on a continuous key") {
    val rnd = new scala.util.Random(1)
    val df = (0L until 500L).map(i => (i, rnd.nextDouble(), 1L + i % 97))
      .toDF("id", "score", "v")
    assert(twoPass(df) === windowed(df))
  }

  test("matches under heavy ties (few distinct scores)") {
    val df = (0L until 300L).map(i => (i, (i % 3).toDouble, i % 11 + 1))
      .toDF("id", "score", "v")
    assert(twoPass(df) === windowed(df))
  }

  test("degenerate constant key collapses gracefully") {
    val df = (0L until 100L).map(i => (i, 0.5, 2L)).toDF("id", "score", "v")
    val got = twoPass(df)
    assert(got === windowed(df))
    assert(got(99L) === 200L) // last id in the (const, id asc) order
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Double, Long)].toDF("id", "score", "v")
    assert(twoPass(df).isEmpty)
  }

  test("single bucket still correct") {
    val df = (0L until 50L).map(i => (i, i.toDouble, 1L))
      .toDF("id", "score", "v")
    assert(twoPass(df, buckets = 1) === windowed(df))
  }

  test("plans no partition-less Window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (0L until 100L).map(i => (i, i / 7.0, 1L))
      .toDF("id", "score", "v")
    val sp = PrefixSum.runningTotalDesc(df, "v", "score", "id", "cum")
      .queryExecution.sparkPlan
    val bad = sp.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, s"partition-less window planned:\n$sp")
  }

  test("runningTotalsAsc on a unique key matches the global window") {
    val df = (0L until 400L).map(i => (i * 3 + i % 2, 1L, i % 5))
      .toDF("v", "na", "nb")
    val got = PrefixSum.runningTotalsAsc(df, Seq("na", "nb"), "v",
        Seq("ca", "cb"), buckets = 8)
      .select("v", "ca", "cb").as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("ca", sum("na").over(w))
      .withColumn("cb", sum("nb").over(w))
      .select("v", "ca", "cb").as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    assert(got === want)
  }

  test("tied keys: precondition now enforced at runtime (VERDICT r12 #3)") {
    // distinctScoreCol is REQUIRED unique. With ties, intra-block
    // cumulative values are nondeterministic (ROWS frame over a tied
    // order), so rather than letting the bit-identity claim silently
    // break, the per-bucket totals aggregate piggybacks an exact
    // count-vs-countDistinct probe and fails fast naming the key.
    val df = (0L until 300L).map(i => (i % 10, 1L)).toDF("v", "na")
    val ex = intercept[IllegalArgumentException] {
      PrefixSum.runningTotalsAsc(df, Seq("na"), "v",
        Seq("ca"), buckets = 4).collect()
    }
    assert(ex.getMessage.contains("tied values"))
    assert(ex.getMessage.contains("'v'"))
  }

  test("runningMaxExclusiveDesc matches the global exclusive window " +
      "on a unique key; top row gets Long.MinValue") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 400L)
      .map(i => (i, i * 0.37 + rnd.nextInt(3) * 0.001, rnd.nextInt(50).toLong))
      .toDF("id", "key", "v")
      .groupBy("key").agg(max("v").as("v"), max("id").as("id"))
    val w = Window.orderBy(col("key").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .withColumn("m", coalesce(max("v").over(w), lit(Long.MinValue)))
      .select("id", "m").as[(Long, Long)].collect().toMap
    val got = PrefixSum.runningMaxExclusiveDesc(df, "v", "key", "m", 8)
      .select("id", "m").as[(Long, Long)].collect().toMap
    assert(got === expected)
    assert(got.values.min === Long.MinValue) // the top-key row
    // no partition-less window in the two-pass plan
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = PrefixSum.runningMaxExclusiveDesc(df, "v", "key", "m", 8)
      .queryExecution.sparkPlan
    sp.collect { case wx: WindowExec => wx }
      .foreach(wx => assert(wx.partitionSpec.nonEmpty))
  }

  test("runningMaxExclusiveDesc rejects tied order keys") {
    val df = Seq((1L, 1.0, 5L), (2L, 1.0, 7L), (3L, 2.0, 1L))
      .toDF("id", "key", "v")
    val ex = intercept[IllegalArgumentException] {
      PrefixSum.runningMaxExclusiveDesc(df, "v", "key", "m", 4)
    }
    assert(ex.getMessage.contains("tied"))
  }
}
