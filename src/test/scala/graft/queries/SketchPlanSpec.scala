package graft.queries

import graft.{SparkSuite, Tables}

/** Contracts of the X225–X228 operators beyond the oracle hash. */
class SketchPlanSpec extends SparkSuite {

  test("q_stream_hll ≡ q_hll_distinct: the native streaming aggregate " +
      "reproduces the relational registers exactly") {
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
        .sortBy(_._1).toSeq
    val batch = canon(WarehouseQueries.hllDistinct.fn(spark, Sf0001)
      .collect())
    val stream = canon(WarehouseQueries.streamHll.fn(spark, Sf0001)
      .collect())
    assert(batch.nonEmpty)
    assert(stream == batch,
      "streaming register merge diverged from groupBy-MAX registers")
  }

  test("q_range_partition_plan: partitions cover all rows, ranges are " +
      "disjoint and ordered, load is depth-bounded") {
    val rows = WarehouseQueries.rangePartitionPlan.fn(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 16)
    val total = Tables.orders(spark, Sf0001).count()
    assert(rows.map(_.getLong(4)).sum == total, "row conservation")
    val depth = (total + 15) / 16
    val maxKeyCount = Tables.orders(spark, Sf0001)
      .groupBy("o_custkey").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "min_key <= max_key")
      // a partition holds at most one atomic-key spill past the depth
      assert(r.getLong(4) <= depth + maxKeyCount - 1,
        s"pid ${r.getLong(0)} overloaded")
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) < b.getLong(1), "ranges overlap")
      case _ =>
    }
  }

  test("q_ndcg: ratios in [0,1], idcg positive, every purchasing " +
      "customer present") {
    val rows = RetrievalQueries.ndcgEval.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0, "idcg")
      assert(r.getDouble(1) >= 0.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9,
        s"cust ${r.getLong(0)} ndcg ${r.getDouble(3)}")
    }
    val purchasers = Tables.lineitem(spark, Sf0001)
      .join(Tables.orders(spark, Sf0001),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_custkey").distinct().count()
    assert(rows.length == purchasers)
  }

  test("q_golden_record: clusters are closed under the match relation, " +
      "one canonical each, survivorship rule holds") {
    val rows = SimilarityQueries.goldenRecord.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val clusters = rows.groupBy(_.getString(0))
    clusters.foreach { case (cid, members) =>
      assert(members.length >= 2, s"$cid: singleton cluster leaked in")
      assert(members.map(_.getString(1)).min == cid,
        "cluster_id is the least member")
      val canon = members.filter(_.getBoolean(3))
      assert(canon.length == 1, s"$cid: ${canon.length} canonicals")
      val expected = members.sortBy(r =>
        (-r.getLong(2), r.getString(1).length, r.getString(1))).head
      assert(canon.head.getString(1) == expected.getString(1),
        s"$cid survivorship")
    }
  }
}
