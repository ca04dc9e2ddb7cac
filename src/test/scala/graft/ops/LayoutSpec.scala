package graft.ops

import graft.SparkSuite
import graft.functions.ZValue
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("ZValue kernel: known interleavings") {
    // x=0b1111, y=0 → z = 0b01010101; y=0b1111, x=0 → 0b10101010
    assert(ZValue.compute(15L, 0L, 4) === 0x55L)
    assert(ZValue.compute(0L, 15L, 4) === 0xAAL)
    assert(ZValue.compute(15L, 15L, 4) === 0xFFL)
    assert(ZValue.compute(0L, 0L, 4) === 0L)
    // bit i of x at position 2i: x=0b10 → z-bit 2·1 → value 4
    assert(ZValue.compute(2L, 0L, 4) === 4L)
    // bit i of y at position 2i+1: y=0b10 → z-bit 3 → value 8
    assert(ZValue.compute(0L, 2L, 4) === 8L)
    // bits cap: high bits beyond `bits` are dropped
    assert(ZValue.compute(16L, 0L, 4) === 0L)
  }

  test("z_value registered on the SQL surface and codegen-consistent") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT z_value(15L, 0L, 4) AS z").collect().head
    assert(r.getLong(0) === 0x55L)
  }

  test("every z-bucket bounds BOTH dimensions (the data-skipping " +
      "property)") {
    val events = graft.Tables.events(spark, Sf0001)
    val stats = Layout.zorderStats(events, "user_id", "event_id", bits = 4)
      .collect()
    val b = Layout.bounds(events, "user_id", "event_id")
    // each bucket is one (binA, binB) pair → extent ≤ one bin width
    val aWidth = math.ceil((b.aHi - b.aLo + 1) / 16.0)
    val bWidth = math.ceil((b.bHi - b.bLo + 1) / 16.0)
    stats.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // a_min ≤ a_max
      assert(r.getLong(3) - r.getLong(2) < aWidth,
        s"bucket ${r.getLong(0)} user extent too wide")
      assert(r.getLong(5) - r.getLong(4) < bWidth,
        s"bucket ${r.getLong(0)} event extent too wide")
    }
    // buckets partition the data: counts sum to the table size
    assert(stats.map(_.getLong(1)).sum === events.count())
  }

  test("zKey orders by locality: sorting on it groups bin pairs " +
      "contiguously") {
    val events = graft.Tables.events(spark, Sf0001)
    val b = Layout.bounds(events, "user_id", "event_id")
    val keyed = events.select(
        Layout.zKey(col("user_id"), col("event_id"), b, 4).as("z"))
      .orderBy("z").collect().map(_.getLong(0))
    assert(keyed.zip(keyed.tail).forall { case (x, y) => x <= y })
    assert(keyed.head >= 0L && keyed.last < 256L)
  }
}
