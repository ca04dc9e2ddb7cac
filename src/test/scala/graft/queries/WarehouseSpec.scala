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
