package graft.functions

import graft.SparkSuite
import graft.functions.TopKFunctions.topKRows
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSuite {
  import spark.implicits._

  private def flat(df: org.apache.spark.sql.DataFrame) = df
    .groupBy("key")
    .agg(topKRows(col("v"), col("id"), 3).as("top"))
    .select(col("key"), posexplode(col("top")))
    .select(col("key"), (col("pos") + 1).cast("long").as("rk"),
      col("col.ord").as("v"), col("col.id").as("id"))

  test("matches the row_number window formulation exactly") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 500L).map(i =>
      (s"k${rnd.nextInt(7)}", rnd.nextInt(40).toDouble, i))
      .toDF("key", "v", "id")
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3).select("key", "rk", "v", "id")
    assert(flat(df).except(expected).isEmpty &&
      expected.except(flat(df)).isEmpty)
  }

  test("result is partitioning-independent (partial merge path)") {
    val df = (1L to 300L).map(i => ("k", (i % 17).toDouble, i))
      .toDF("key", "v", "id")
    val a = flat(df).collect().toSeq
    val b = flat(df.repartition(13)).collect().toSeq
    assert(a === b)
    // ties on v=16 break by lowest id
    assert(a.map(_.getLong(3)) === Seq(16L, 33L, 50L))
  }

  test("groups smaller than k return all rows, ranked") {
    val df = Seq(("k", 1.0, 5L), ("k", 3.0, 2L)).toDF("key", "v", "id")
    val rows = flat(df).collect().map(r =>
      (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq === Seq((1L, 3.0, 2L), (2L, 1.0, 5L)))
  }

  test("aggregation is partial: shuffle carries heaps, not rows") {
    val df = (1L to 100L).map(i => ("k", i.toDouble, i)).toDF("key", "v", "id")
    val p = df.groupBy("key").agg(topKRows(col("v"), col("id"), 3).as("t"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_top_k_rows"), s"no map-side partial:\n$p")
  }
}
