package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSuite {
  import spark.implicits._

  test("bottom_k: k smallest DISTINCT values, ascending, across " +
      "partitions (partial-agg merge path)") {
    val df = spark.range(0, 10000, 1, 32)
      .select((col("id") % 1000).as("v")) // every value appears 10x
    val got = df.agg(SketchFunctions.bottomK(col("v"), 5).as("s"))
      .collect().head.getSeq[Long](0)
    assert(got === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("bottom_k: unsaturated groups return all distinct values; " +
      "nulls ignored") {
    val df = Seq(Some(7L), Some(3L), None, Some(7L)).toDF("v")
    val got = df.agg(SketchFunctions.bottomK(col("v"), 64).as("s"))
      .collect().head.getSeq[Long](0)
    assert(got === Seq(3L, 7L))
  }

  test("kmvEstimate: exact when unsaturated, close when saturated") {
    // unsaturated: estimate == distinct count exactly
    val small = spark.range(0, 40).select(
      Sampling60.hash(col("id")).as("h"))
    val est = small.agg(SketchFunctions.kmvEstimate(
        SketchFunctions.bottomK(col("h"), 64), 64).as("e"))
      .collect().head.getDouble(0)
    assert(est === 40.0)
    // saturated: 10k distinct, k=64 → expect within ~3 std errors
    // (1/sqrt(k) ≈ 12.5%) of the truth for this fixed hash
    val big = spark.range(0, 10000).select(
      Sampling60.hash(col("id")).as("h"))
    val est2 = big.agg(SketchFunctions.kmvEstimate(
        SketchFunctions.bottomK(col("h"), 64), 64).as("e"))
      .collect().head.getDouble(0)
    assert(math.abs(est2 - 10000.0) / 10000.0 < 0.4, s"estimate $est2")
  }

  test("bottom_k registered on the SQL surface") {
    graft.GraftExtensions.register(spark)
    spark.range(0, 100).createOrReplaceTempView("sketch_in")
    val got = spark.sql(
      "SELECT bottom_k(id, 3) AS s FROM sketch_in")
      .collect().head.getSeq[Long](0)
    assert(got === Seq(0L, 1L, 2L))
  }
}

/** The portable 60-bit md5 hash the KMV query feeds bottom_k. */
private object Sampling60 {
  def hash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit("kmv:"), key.cast("string"))), 1, 15),
      16, 10).cast("long")
}
