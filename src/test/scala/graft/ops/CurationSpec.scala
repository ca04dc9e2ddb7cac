package graft.ops

import graft.SparkSuite
import graft.functions.SketchFunctions
import org.apache.spark.sql.functions._

/** Kernel-level guarantees of the curation operators: the bloom filter
  * admits every build key (no false negatives — the property join
  * pruning correctness rests on), the Count-Min sketch never
  * underestimates and is partitioning-invariant (merge is exact), and
  * the profiler matches directly-computed stats. */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private val m = 512
  private val j = 3

  test("bloom: zero false negatives over every build key") {
    val build = (1L to 300L).toDF("k")
    val words = Bloom.buildBits(build, col("k"), m, j)
    val misses = build
      .filter(!Bloom.mightContain(col("k"), words, m, j)).count()
    assert(misses === 0L)
  }

  test("bloom: false-positive rate on disjoint probes is loaded, not 1") {
    val build = (1L to 100L).toDF("k")
    val words = Bloom.buildBits(build, col("k"), m, j)
    val probes = (10001L to 11000L).toDF("k")
    val fp = probes
      .filter(Bloom.mightContain(col("k"), words, m, j)).count()
    // load ~ 300/512 bits set -> fp ~ (0.44)^3 ~ 0.09; assert it prunes
    // most non-members but (being a bloom) may pass a few
    assert(fp < 300L, s"fp=$fp of 1000 — filter is not pruning")
  }

  test("bloom: bitset build is deterministic and partition-independent") {
    val a = Bloom.buildBits((1L to 200L).toDF("k").repartition(7),
      col("k"), m, j)
    val b = Bloom.buildBits((1L to 200L).toDF("k").repartition(2),
      col("k"), m, j)
    assert(a.toSeq === b.toSeq)
  }

  private val cmsD = 4
  private val cmsW = 64

  private def cmsOf(df: org.apache.spark.sql.DataFrame): Array[Long] = {
    val cells = array((0 until cmsD).map(r =>
      Bloom.hashMod(s"cms$r:", col("k"), cmsW)): _*)
    df.agg(SketchFunctions.cmsSketch(cells, cmsD, cmsW).as("sk"))
      .collect()(0).getAs[scala.collection.Seq[Long]](0).toArray
  }

  test("cms: estimate >= exact for every key (one-sided error)") {
    // skewed multiset: key i appears i times, i in 1..50
    val data = (1L to 50L).flatMap(i => Seq.fill(i.toInt)(i)).toDF("k")
    val sketch = cmsOf(data)
    val exact = (1L to 50L).map(i => i -> i).toMap
    exact.foreach { case (k, n) =>
      val est = (0 until cmsD).map { r =>
        val pos = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"cms$r:$k".getBytes("UTF-8"))
            .take(8).map("%02x".format(_)).mkString.take(15), 16) % cmsW
        sketch(r * cmsW + pos.toInt)
      }.min
      assert(est >= n, s"key $k: est $est < exact $n")
    }
  }

  test("cms: sketch is partitioning-invariant (exact merge)") {
    val data = (1L to 500L).map(i => i % 37).toDF("k")
    assert(cmsOf(data.repartition(8)).toSeq ===
      cmsOf(data.repartition(1)).toSeq)
  }

  test("cms: total mass per row equals input row count") {
    val data = (1L to 321L).toDF("k")
    val sketch = cmsOf(data)
    (0 until cmsD).foreach { r =>
      val mass = (0 until cmsW).map(c => sketch(r * cmsW + c)).sum
      assert(mass === 321L, s"row $r mass $mass")
    }
  }

  test("profile matches directly computed stats") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")),
      (4L, Some("a"))).toDF("id", "s")
    val got = Profile.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(got("id") === ((4L, 0L, 4L, "1", "4")))
    assert(got("s") === ((4L, 1L, 2L, "a", "c")))
  }
}
