package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def mkDf(rows: Seq[(Long, Long, Long)], value: Boolean = false)
      : DataFrame = {
    val base = rows.toDF("id", "k", "t_us")
    val withTs = base.withColumn("t", timestamp_micros(col("t_us")))
    if (value) withTs.withColumn("v", col("id").cast("double") * 10)
      .select("id", "k", "t", "v")
    else withTs.select("id", "k", "t")
  }

  private def naive(left: DataFrame, right: DataFrame,
      lower: Long, upper: Long): Set[(Long, Long)] =
    left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          unix_micros(col("r.t")) >= unix_micros(col("l.t")) + lower &&
          unix_micros(col("r.t")) <= unix_micros(col("l.t")) + upper)
      .select(col("l.id"), col("r.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("property: bucketized pairs ≡ naive inequality join (random data)") {
    for (seed <- 0 until 5) {
      val rnd = new scala.util.Random(seed)
      val left = mkDf((0 until 60).map(i =>
        (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(10000).toLong)))
      val right = mkDf((100 until 180).map(i =>
        (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(10000).toLong)),
        value = true)
      for ((lo, hi) <- Seq((0L, 500L), (1L, 997L), (-300L, 300L),
          (-800L, -100L), (0L, 0L))) {
        val got = RangeJoin.timeRangeJoin(left, right, Seq("k"),
            "t", "t", lo, hi, Seq("v"))
          .join(right.select(col("v"), col("id").as("rid")), Seq("v"))
          .select("id", "rid")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === naive(left, right, lo, hi),
          s"seed=$seed range=($lo,$hi)")
      }
    }
  }

  test("bucket boundaries: matches exactly on range endpoints survive") {
    val left = mkDf(Seq((1L, 1L, 1000L)))
    val right = mkDf(Seq((10L, 1L, 1000L), (11L, 1L, 1100L),
      (12L, 1L, 2000L), (13L, 1L, 2001L), (14L, 1L, 999L)), value = true)
    val got = RangeJoin.timeRangeJoin(left, right, Seq("k"), "t", "t",
        0L, 1000L, Seq("v"))
      .select("v").collect().map(_.getDouble(0)).toSet
    // [1000, 2000]: ids 10,11,12 → v = 100,110,120; 13 (2001) and
    // 14 (999) excluded
    assert(got === Set(100.0, 110.0, 120.0))
  }

  test("payload values ride along unchanged") {
    val left = mkDf(Seq((1L, 7L, 0L)))
    val right = mkDf(Seq((50L, 7L, 10L)), value = true)
    val out = RangeJoin.timeRangeJoin(left, right, Seq("k"), "t", "t",
      0L, 100L, Seq("v"))
    assert(out.columns.toSeq === Seq("id", "k", "t", "v"))
    assert(out.collect().head.getDouble(3) === 500.0)
  }
}
