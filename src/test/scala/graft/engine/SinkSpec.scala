package graft.engine

import graft.{SparkSuite, Tables}
import graft.ops.Skew
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSuite {

  test("partitioned write + read round-trips and prunes partitions") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-sink").toString + "/orders"
    val orders = Tables.orders(spark, Sf0001)
      .withColumn("status", col("o_orderstatus"))
    Sink.writePartitioned(orders, out, partitionCols = Seq("status"),
      sortCols = Seq("o_orderkey"))
    val back = Sink.read(spark, out)
    assert(back.count() === orders.count())
    // partition-pruned read: only the F directory is listed
    val pruned = back.filter(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ===
      orders.filter(col("o_orderstatus") === "F").count())
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"expected partition filter in:\n$plan")
  }

  test("saltedJoin returns exactly the plain-join result") {
    import spark.implicits._
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = Tables.orders(spark, Sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(li, o, "l_orderkey",
        leftUniqueCol = "l_linenumber", salts = 7)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }
}
