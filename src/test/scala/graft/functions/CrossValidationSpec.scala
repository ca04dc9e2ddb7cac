package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Property-style cross-validation: every custom expression must agree
  * with the built-in Catalyst formulation it replaced — on random
  * inputs, bit-for-bit where it claims bit-parity. Seeded loops, no
  * external generators. */
class CrossValidationSpec extends SparkSuite {
  import spark.implicits._

  test("ArrayDot ≡ aggregate(zip_with(·,·,*)) on random float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b").select(
      ArrayFunctions.arrayDot(col("a"), col("b")).as("custom"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("builtin"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact, not approx
    }
  }

  test("JaccardSim ≡ size(array_intersect)/size(array_union) on random string sets") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((
      Seq.fill(rnd.nextInt(30) + 1)(s"w${rnd.nextInt(40)}"),
      Seq.fill(rnd.nextInt(30) + 1)(s"w${rnd.nextInt(40)}")))
    val df = rows.toDF("a", "b").select(
      ArrayFunctions.jaccardSim(col("a"), col("b")).as("custom"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b"))).cast("double")).as("builtin"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
    }
  }

  test("ShingleHashes set size ≡ distinct wordShingles size on real docs") {
    val docs = graft.Tables.documents(spark, Sf0001).limit(200)
    val df = docs.select(
      size(ShingleFunctions.shingleHashes(col("text"), 3)).as("custom"),
      size(array_distinct(Text.wordShingles(col("text"), 3))).as("builtin"))
    df.collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("JaccardSim sorted-merge path ≡ hash path ≡ builtin on long sets") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(300) {
      def arr() = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(60).toLong)
      (arr().sorted, arr().sorted, arr(), arr()) // sorted + unsorted twins
    }
    val df = rows.toDF("sa", "sb", "ua", "ub").select(
      ArrayFunctions.jaccardSim(col("sa"), col("sb")).as("merged"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))).cast("double")).as("builtin"),
      ArrayFunctions.jaccardSim(col("ua"), col("ub")).as("hash_unsorted"),
      (size(array_intersect(col("ua"), col("ub"))).cast("double") /
        size(array_union(col("ua"), col("ub"))).cast("double"))
        .as("builtin_unsorted"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("MinHashBandBuckets ≡ per-band combine of MinHashSignature slices") {
    val docs = graft.Tables.documents(spark, Sf0001).limit(100)
    val (bands, rows) = (32, 4)
    val df = docs.select(
      HashFunctions.minhashSignature(
        ShingleFunctions.shingleHashes(col("text"), 3), bands * rows)
        .as("sig"),
      HashFunctions.minhashBandBuckets(
        ShingleFunctions.shingleHashes(col("text"), 3), bands, rows)
        .as("buckets"))
    df.collect().foreach { r =>
      val sig = r.getSeq[Long](0)
      val buckets = r.getSeq[Long](1)
      assert(buckets.length === bands)
      val expected = (0 until bands).map { b =>
        var h = Mix64.mix(b.toLong + 0x9e3779b97f4a7c15L)
        sig.slice(b * rows, (b + 1) * rows).foreach(v => h = Mix64.mix(h ^ v))
        h
      }
      assert(buckets === expected)
    }
  }

  test("Md5ShingleKeys ≡ conv(substring(md5(wordShingles),1,15),16,10)") {
    val docs = graft.Tables.documents(spark, Sf0001).limit(150)
      .union(Seq((9001L, "one two three", "en", "t", 13L),
        (9002L, "   leading  and   multiple   spaces\ttabs\ntoo ", "en", "t", 10L),
        (9003L, "short", "en", "t", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val df = docs.select(
      ShingleFunctions.md5ShingleKeys(col("text"), 8).as("fused"),
      transform(Text.wordShingles(col("text"), 8),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
        .as("builtin"))
    df.collect().foreach { r =>
      val fused = r.getSeq[Long](0).toSet
      val builtin = r.getSeq[Long](1).toSet
      assert(fused === builtin)
      assert(r.getSeq[Long](0).length === builtin.size) // value-distinct
    }
  }

  test("Md5ShingleKeysAll: positional, duplicates kept, <k empty") {
    val df = Seq(
      "a b c d a b c",   // windows: abc bcd cda dab abc — abc repeats
      "x y",             // fewer than k tokens -> zero windows
      "").toDF("text")
      .select(ShingleFunctions.md5ShingleKeysAll(col("text"), 3).as("ks"),
        // composed POSITIONAL mirror: md5 over each space-joined
        // window, duplicates kept (wordShingles is distinct, so build
        // the windows directly)
        when(size(Text.tokens(col("text"))) >= 3,
          transform(sequence(lit(1), size(Text.tokens(col("text"))) - 2),
            i => conv(substring(md5(array_join(
              slice(Text.tokens(col("text")), i, lit(3)), " ")),
              1, 15), 16, 10).cast("long")))
          .otherwise(array().cast("array<long>"))
          .as("composed"),
        ShingleFunctions.md5ShingleKeys(col("text"), 3).as("distinctks"))
      .collect()
    val Array(r0, r1, r2) = df
    // positional length n-k+1, window order matches the composed mirror
    assert(r0.getSeq[Long](0).length === 5)
    assert(r0.getSeq[Long](0) === r0.getSeq[Long](1))
    // duplicate window keeps both positions (same key at 1 and 5)
    assert(r0.getSeq[Long](0).head === r0.getSeq[Long](0)(4))
    // and the distinct variant collapses them
    assert(r0.getSeq[Long](2).toSet === r0.getSeq[Long](0).toSet)
    assert(r0.getSeq[Long](2).length === 4)
    // <k tokens: positional gives NO windows (no whole-doc fallback)
    assert(r1.getSeq[Long](0).isEmpty)
    assert(r2.getSeq[Long](0).isEmpty)
  }

  test("MinHash similarity estimate converges to exact Jaccard") {
    val rnd = new scala.util.Random(13)
    // random set pairs with known overlap structure
    (1 to 10).foreach { _ =>
      val base = (1 to 200).map(i => s"t$i")
      val keep = rnd.nextInt(150) + 40
      val other = base.take(keep) ++ (1000 to 1000 + (200 - keep)).map(i => s"t$i")
      val df = Seq((base.mkString(" "), other.mkString(" ")))
        .toDF("a", "b").select(
          HashFunctions.minhashSignature(
            ShingleFunctions.shingleHashes(col("a"), 1), 256).as("sa"),
          HashFunctions.minhashSignature(
            ShingleFunctions.shingleHashes(col("b"), 1), 256).as("sb"),
          ArrayFunctions.jaccardSim(
            ShingleFunctions.shingleHashes(col("a"), 1),
            ShingleFunctions.shingleHashes(col("b"), 1)).as("exact"))
      val r = df.collect().head
      val sa = r.getSeq[Long](0)
      val sb = r.getSeq[Long](1)
      val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
      val exact = r.getDouble(2)
      // 256 hashes: σ ≈ sqrt(j(1-j)/256) ≤ 0.032; allow 4σ
      assert(math.abs(est - exact) < 0.13,
        s"minhash est $est vs exact $exact")
    }
  }

  test("SimHash hamming distance tracks similarity ordering") {
    val base = (1 to 100).map(i => s"t$i").mkString(" ")
    val near = ((1 to 95) ++ (900 to 904)).map(i => s"t$i").mkString(" ")
    val far = (500 to 600).map(i => s"t$i").mkString(" ")
    val df = Seq((base, near, far)).toDF("a", "b", "c").select(
      HashFunctions.simhash64(ShingleFunctions.tokenHashes(col("a"))).as("ha"),
      HashFunctions.simhash64(ShingleFunctions.tokenHashes(col("b"))).as("hb"),
      HashFunctions.simhash64(ShingleFunctions.tokenHashes(col("c"))).as("hc"))
    val r = df.collect().head
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(r.getLong(0), r.getLong(1)) < ham(r.getLong(0), r.getLong(2)))
  }
}
