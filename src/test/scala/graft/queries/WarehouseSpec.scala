package graft.queries

import graft.{SparkSuite, Tables}

/** Contracts of the X210–X211 warehouse operators beyond the oracle
  * hash: SCD2 intervals must PARTITION each user's timeline, the PIT
  * join must be self-consistent, and the HLL estimate must actually
  * estimate. */
class WarehouseSpec extends SparkSuite {

  test("q_scd2_build: versions consecutive, intervals chain, one " +
      "is_current per user, adjacent types differ") {
    val rows = WarehouseQueries.scd2Build.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length), s"user $u")
      assert(sorted.count(_.getInt(5) == 1) == 1, s"user $u is_current")
      assert(sorted.last.getInt(5) == 1, s"user $u last row current")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // interval chain: valid_to(v) == valid_from(v+1)
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3),
            s"user $u chain")
          // a version row only exists when the type CHANGED
          assert(a.getString(2) != b.getString(2), s"user $u no-change row")
        case _ =>
      }
      assert(sorted.last.isNullAt(4), s"user $u open final interval")
    }
  }

  test("q_scd2_pit: every probe matches exactly one interval whose " +
      "type is the probe's own event type") {
    val rows = WarehouseQueries.scd2Pit.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "duplicate probe match — intervals overlap")
    val typeOf = Tables.events(spark, Sf0001)
      .select("event_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(r.getString(4) == typeOf(r.getLong(0)),
        s"event ${r.getLong(0)}: PIT picked a wrong-version dimension row")
    }
    // probe set size: every sampled event must land in SOME interval
    val nProbes = typeOf.keys.count(_ % 17 == 0)
    assert(rows.length == nProbes, "a probe fell outside all intervals")
  }

  test("q_merge_upsert: action classes partition the key space and " +
      "the deltas are applied exactly") {
    val base = Tables.customer(spark, Sf0001)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = WarehouseQueries.mergeUpsert.fn(spark, Sf0001).collect()
    val byAction = rows.groupBy(_.getString(2))
    val updates = base.keys.count(_ % 10 == 0)
    val deletes = base.keys.count(_ % 10 == 1)
    val inserts = base.keys.count(_ % 10 == 2)
    assert(byAction("update").length == updates)
    assert(byAction("insert").length == inserts)
    assert(byAction("keep").length == base.size - updates - deletes)
    assert(rows.length == base.size - deletes + inserts)
    byAction("update").foreach { r =>
      assert(r.getDouble(1) == base(r.getLong(0)) + 100.0)
    }
    byAction("insert").foreach { r =>
      val origKey = r.getLong(0) - 10000000L
      assert(origKey % 10 == 2 && base.contains(origKey))
      assert(r.getDouble(1) == origKey.toDouble * 1.5)
    }
    // no deleted key survives
    rows.foreach(r => assert(r.getLong(0) % 10 != 1 ||
      r.getString(2) == "insert"))
  }

  test("q_unpivot: wide->long round-trip matches the direct long " +
      "aggregate row for row") {
    val rows = WarehouseQueries.unpivotMelt.fn(spark, Sf0001).collect()
    val direct = Tables.orders(spark, Sf0001)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(graft.functions.Num.qround(
        org.apache.spark.sql.functions.sum("o_totalprice"), 2)
        .as("total"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(rows.length == direct.size, "melt dropped or invented cells")
    rows.foreach { r =>
      assert(r.getDouble(2) == direct((r.getString(0), r.getString(1))))
    }
  }

  test("q_cumulative_distinct: curve is monotone and ends at the " +
      "total distinct-user count") {
    val rows = WarehouseQueries.cumulativeDistinct.fn(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    var prev = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == prev + r.getLong(1), "running sum")
      prev = r.getLong(2)
    }
    val distinctUsers = Tables.events(spark, Sf0001)
      .select("user_id").distinct().count()
    assert(prev == distinctUsers)
  }

  test("q_data_contract: the clean fixture passes every declared " +
      "invariant with zero violations") {
    val rows = WarehouseQueries.dataContract.fn(spark, Sf0001).collect()
    assert(rows.length == 8)
    rows.foreach(r => assert(r.getLong(1) == 0L,
      s"${r.getString(0)}: ${r.getLong(1)} violations on clean data"))
  }

  test("q_ivm_agg: incremental merge reproduces the full recompute " +
      "and conserves rows") {
    val rows = WarehouseQueries.ivmAgg.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"${r.getString(0)} counts diverged")
      assert(r.getBoolean(6), s"${r.getString(0)} sums diverged")
    }
    val total = Tables.orders(spark, Sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("q_hll_distinct: register universe, estimate in range, error " +
      "bounded at m=256") {
    val rows = WarehouseQueries.hllDistinct.fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRows, exact) = (r.getLong(1), r.getLong(2))
      val (hit, zeros) = (r.getLong(3), r.getLong(4))
      assert(hit + zeros == 256, "register universe")
      assert(exact <= nRows)
      assert(hit <= exact, "cannot hit more registers than distinct keys")
      val est = r.getDouble(5)
      assert(est > 0.0)
      // m=256 → ~1.04/sqrt(m) ≈ 6.5% typical; allow 4σ headroom
      assert(r.getDouble(6) < 0.25,
        s"${r.getString(0)}: rel_err ${r.getDouble(6)}")
    }
  }
}
