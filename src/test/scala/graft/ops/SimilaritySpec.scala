package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("dot/norm/cosine basic algebra") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("dot"),
        Similarity.norm(col("a")).as("na"),
        Similarity.cosine(col("a"), col("b")).as("cos"))
    val r = df.collect().head
    assert(r.getDouble(0) === 2.0)
    assert(r.getDouble(1) === 3.0)
    assert(math.abs(r.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-15)
  }

  test("cosine of zero vector is NULL, not NaN") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("cos"))
    assert(df.collect().head.isNullAt(0))
  }

  test("bruteForceTopK: exact ranks, no self-matches, k respected") {
    val e = Tables.embeddings(spark, Sf0001)
    val got = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
    val rows = got.collect()
    assert(rows.length === 15) // 3 queries × 5
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // ranks 1..5 per query, cosine non-increasing within a query
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq === (1L to 5L))
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }
  }

  test("lshTopK returns a subset ranking consistent with brute force") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 10, planes = 4)
      .select("query_id", "neighbor_id", "cosine").collect()
    // every LSH hit's cosine must equal the exact cosine for that pair
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(c === r.getDouble(2)))
    }
    assert(lsh.nonEmpty)
  }

  test("probeMasks: popcount-bounded XOR mask enumeration") {
    assert(Similarity.probeMasks(4, 0) === Seq(0L))
    assert(Similarity.probeMasks(4, 1) === Seq(0L, 1L, 2L, 4L, 8L))
    assert(Similarity.probeMasks(6, 2).size === 1 + 6 + 15)
    assert(Similarity.probeMasks(6, 2).forall(m =>
      java.lang.Long.bitCount(m) <= 2 && m < 64))
  }

  test("multiprobe lshTopK: recall dominates single-probe, cosines exact") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def hits(maxFlips: Int): Int =
      Similarity.lshTopK(e, q, "vec_id", "embedding",
          "vec_id", "embedding", k = 10, planes = 6, maxFlips = maxFlips)
        .select("query_id", "neighbor_id", "cosine").collect()
        .map { r =>
          // any candidate the exact ranking also has must score identically
          brute.get((r.getLong(0), r.getLong(1)))
            .foreach(c => assert(c === r.getDouble(2)))
          r
        }
        .count(r => brute.contains((r.getLong(0), r.getLong(1))))
    val Seq(h0, h1, h2) = Seq(0, 1, 2).map(hits)
    assert(h0 <= h1 && h1 <= h2, s"recall not monotone: $h0 $h1 $h2")
    assert(h2 > h0, "multiprobe found no additional true neighbors")
  }

  test("ivfTopK: subset of brute-force with exact cosines, decent recall") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.filter(col("vec_id") < 5)
    val index = Similarity.fitIvf(e, "embedding", "vec_id", nlist = 8)
    assert(index.centroids.length === 8)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 10, index, nprobe = 4)
      .select("query_id", "neighbor_id", "cosine").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(c === r.getDouble(2)))
    }
    // probing half the lists should recover a majority of true top-10s
    val recall = ivf.count(r =>
      brute.contains((r.getLong(0), r.getLong(1)))).toDouble /
      brute.size
    assert(recall >= 0.3, s"IVF recall $recall")
  }

  test("hyperplaneBucket is deterministic across evaluations") {
    val e = Tables.embeddings(spark, Sf0001).limit(50)
    val b1 = e.select(col("vec_id"),
      Similarity.hyperplaneBucket(col("embedding"), 8, 42L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = e.select(col("vec_id"),
      Similarity.hyperplaneBucket(col("embedding"), 8, 42L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === b2)
  }

  test("fused HyperplaneBuckets kernel is bit-identical to the " +
      "composed per-plane expression, every table") {
    val e = Tables.embeddings(spark, Sf0001).limit(100)
    val tables = 12
    val planes = 6
    // composed reference: one hyperplaneBucket expression per table
    // with the per-table seed derivation embeddingPairs uses
    val composed = e.select(col("vec_id") +:
        (0 until tables).map(t =>
          Similarity.hyperplaneBucket(col("embedding"), planes,
            42L + t * 7919L).as(s"b$t")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to tables).map(r.getLong(_)).toSeq)
      .toMap
    val fused = e.select(col("vec_id"),
        graft.functions.HashFunctions.hyperplaneBuckets(col("embedding"),
          planes, tables, 42L).as("bs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused === composed)
  }

  test("fused NearestCentroid kernel is bit-identical to the composed " +
      "array_position(array_max) form, ties included") {
    val e = Tables.embeddings(spark, Sf0001)
    val index = Similarity.fitIvf(e, "embedding", "vec_id", nlist = 16)
    val composed = e.select(col("vec_id"),
        Similarity.nearestCentroidComposed(index.centroids,
          col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fused = e.select(col("vec_id"),
        index.assignExpr(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fused === composed)
    // first-max tie-break: duplicated centroids must yield the LOWER id
    val dupCents = Array(index.centroids(3), index.centroids(3))
    val tied = e.limit(20).select(
        graft.functions.ArrayFunctions.nearestCentroid(col("embedding"),
          dupCents).as("c"))
      .collect().map(_.getInt(0))
    assert(tied.forall(_ === 0))
  }

  test("Int8Quantize: known values, zero vector, max-abs maps to ±127") {
    import graft.functions.ArrayFunctions.int8Quantize
    val df = Seq(
      Seq(1.0f, -0.5f, 0.25f, 0.0f),
      Seq(0.0f, 0.0f, 0.0f, 0.0f),
      Seq(-2.0f, 1.0f, 2.0f, -1.0f)).toDF("v")
      .select(int8Quantize(col("v")).as("q"))
    val got = df.collect().map(_.getSeq[Int](0))
    // scale = 1/127: -0.5 → floor(-63.5 + 0.5) = -63; 0.25 → floor(32.25) = 32
    assert(got(0) === Seq(127, -63, 32, 0))
    assert(got(1) === Seq(0, 0, 0, 0))
    // half-up: -1/(2/127) = -63.5 → floor(-63.0) = -63 (toward +∞)
    assert(got(2) === Seq(-127, 64, 127, -63))
  }

  test("Int8Quantize kernel matches an independent driver-side " +
      "reimplementation on the fixture corpus") {
    val e = Tables.embeddings(spark, Sf0001)
    val fused = e.select(col("vec_id"),
        graft.functions.ArrayFunctions.int8Quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val reference = e.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        val maxAbs = v.map(math.abs).max
        val q = if (maxAbs == 0.0) v.map(_ => 0) else {
          val scale = maxAbs / 127.0
          v.map(x => math.max(-127.0,
            math.min(127.0, math.floor(x / scale + 0.5))).toInt)
        }
        r.getLong(0) -> q
      }.toMap
    assert(fused === reference)
    assert(fused.values.flatten.forall(q => q >= -127 && q <= 127))
  }

  test("int8TopK: valid ranks and quantized cosine tracks exact cosine") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val int8 = Similarity.int8TopK(e, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 10).collect()
    val byQ = int8.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { rs =>
      assert(rs.sortBy(_.getLong(2)).map(_.getLong(2)).toSeq === (1L to 10L))
    }
    // 64-dim int8 quantization distorts cosine by well under 0.05
    val allPairs = Similarity.int8TopK(e, q, "vec_id", "embedding",
        "vec_id", "embedding", k = Int.MaxValue)
      .select("query_id", "neighbor_id", "cosine").collect()
    allPairs.foreach { r =>
      val ex = exact.get((r.getLong(0), r.getLong(1)))
      ex.foreach(c => assert(math.abs(c - r.getDouble(2)) < 0.05))
    }
    // recall@10 of the quantized ranking vs exact: ≥ 8/10 per query
    val exactTop = exact.keySet
    byQ.foreach { case (_, rs) =>
      val hits = rs.count(r => exactTop((r.getLong(0), r.getLong(1))))
      assert(hits >= 8, s"int8 recall@10 too low: $hits/10")
    }
  }

  test("int8_quantize and int_array_dot are registered on the SQL surface") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT int_array_dot(q, q) AS n2, q FROM (
           SELECT int8_quantize(array(3.0F, -1.5F, 0.0F)) AS q)""")
      .collect().head
    assert(r.getSeq[Int](1) === Seq(127, -63, 0))
    assert(r.getLong(0) === 127L * 127 + 63L * 63)
  }
}
