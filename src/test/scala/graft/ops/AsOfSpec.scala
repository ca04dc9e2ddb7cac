package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 400L),
    (4L, 20L, 100L), (5L, 30L, 500L))
    .toDF("id", "k", "t")
  private def right = Seq(
    (10L, 100L, 1.0), (10L, 200L, 2.0), (10L, 400L, 4.0),
    (20L, 150L, 9.0))
    .toDF("k", "t", "v")

  private def run(strict: Boolean = false,
      tol: Option[Long] = None): Map[Long, Option[Double]] =
    AsOf.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"),
        toleranceMicros = tol, strict = strict)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  test("latest at-or-before match per key; no match → NULL") {
    assert(run() === Map(
      1L -> Some(1.0),  // t=100 matches right t=100 (<= includes equal)
      2L -> Some(2.0),  // t=250 → latest is 200
      3L -> Some(4.0),  // t=400 → equal instant
      4L -> None,       // k=20: only right t=150 > 100
      5L -> None))      // k=30: no right rows at all
  }

  test("strict mode excludes same-instant rows") {
    assert(run(strict = true) === Map(
      1L -> None,        // equal t no longer eligible
      2L -> Some(2.0),
      3L -> Some(2.0),   // t=400 right row excluded, falls back to 200
      4L -> None, 5L -> None))
  }

  test("tolerance nulls out stale matches") {
    assert(run(tol = Some(60L)) === Map(
      1L -> Some(1.0),   // age 0
      2L -> Some(2.0),   // age 50 ≤ 60
      3L -> Some(4.0),   // age 0
      4L -> None, 5L -> None))
    assert(run(tol = Some(40L))(2L) === None) // age 50 > 40
  }

  test("all left rows and columns survive (left-outer semantics)") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() === 5)
    assert(out.columns.toSeq === Seq("id", "k", "t", "v"))
  }

  test("plan contains no join: single window pass over the union") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), s"unexpected join in:\n$physical")
    assert(physical.contains("Window"))
  }

  private def runBucketed(width: Long, strict: Boolean = false,
      tol: Option[Long] = None): Map[Long, Option[Double]] =
    AsOf.asofJoinBucketed(left, right, Seq("k"), "t", "t", Seq("v"),
        bucketMicros = width, toleranceMicros = tol, strict = strict)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  test("bucketed variant equals the plain as-of across bucket widths, " +
      "strict and tolerance modes") {
    for (width <- Seq(1L, 7L, 100L, 1000000L)) {
      assert(runBucketed(width) === run(), s"width=$width")
      assert(runBucketed(width, strict = true) === run(strict = true),
        s"width=$width strict")
      assert(runBucketed(width, tol = Some(60L)) === run(tol = Some(60L)),
        s"width=$width tol=60")
      assert(runBucketed(width, tol = Some(40L)) === run(tol = Some(40L)),
        s"width=$width tol=40")
    }
  }

  test("bucketed variant equals the plain as-of on a degenerate hot key") {
    val n = 20000
    val hotLeft = spark.range(n)
      .select(col("id"), lit(1L).as("k"), (col("id") * 3 + 1).as("t"))
    val hotRight = spark.range(n)
      .select(lit(1L).as("k"), (col("id") * 7).as("t"),
        col("id").cast("double").as("v"))
    val plain = AsOf.asofJoin(hotLeft, hotRight, Seq("k"), "t", "t",
        Seq("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // width 1000 → the single key spreads over ~140 buckets
    val bucketed = AsOf.asofJoinBucketed(hotLeft, hotRight, Seq("k"),
        "t", "t", Seq("v"), bucketMicros = 1000L).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bucketed === plain)
  }

  test("degenerate hot key: one key owning every row stays correct " +
      "(single-task sort+scan, no pairwise blowup)") {
    // 50k left + 50k right rows, ALL on key 1 — the worst case the
    // scaladoc documents: the window serializes on one task but the
    // work is linear, and every left row still gets the exact latest
    // at-or-before right value (right t = 2i carries v = i, so left
    // t matches floor(t/2)).
    val n = 50000
    val hotLeft = spark.range(n)
      .select(col("id"), lit(1L).as("k"), (col("id") + 1).as("t"))
    val hotRight = spark.range(n)
      .select(lit(1L).as("k"), (col("id") * 2).as("t"),
        col("id").cast("double").as("v"))
    val out = AsOf.asofJoin(hotLeft, hotRight, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() === n.toLong)
    val wrong = out.filter(col("v") =!= floor(col("t") / 2))
    assert(wrong.count() === 0)
  }
}
