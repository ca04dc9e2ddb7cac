package graft.queries

import graft.{SparkSuite, Tables}
import graft.ops.{AnnIndex, Shard}
import org.apache.spark.sql.functions._

/** X300 persisted ANN index: build-once/serve-many, served rankings ≡
  * inline-trained rankings, torn index writes invisible. */
class AnnIndexSpec extends SparkSuite {

  private def qRows(d: String) =
    Tables.embeddings(spark, d).filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  test("build-once ≡ train-inline rankings; serve path never retrains") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annidx").toString
    try {
      val emb = Tables.embeddings(spark, Sf0001)
      AnnIndex.ensureBuilt(emb, dir)
      val (commit1, _) = Shard.readTablesManifest(spark, dir)
      // build-once: a second ensure is a no-op (same commit id)
      AnnIndex.ensureBuilt(emb, dir)
      val (commit2, _) = Shard.readTablesManifest(spark, dir)
      assert(commit1 === commit2, "ensureBuilt retrained an existing index")
      assert(new java.io.File(s"$dir/data").listFiles().length === 1)

      // served rankings equal the inline-trained X292 path bit for bit
      val served = AnnIndex.topK(AnnIndex.load(spark, dir),
          qRows(Sf0001), k = 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._3, t._2))
      val inline = ClusterQueries.ivfPqTopK(spark, Sf0001, k = 10,
          nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._3, t._2))
      assert(served.length === inline.length)
      served.zip(inline).foreach { case (a, b) => assert(a === b) }

      // TORN INDEX WRITE: a new build crashes after the codes table,
      // before the manifest swap — the serve path must not see one row
      Tables.embeddings(spark, Sf0001).limit(3)
        .select(col("vec_id"), lit(0).as("list_id"),
          lit(0).as("k0"), lit(0).as("k1"), lit(0).as("k2"),
          lit(0).as("k3"))
        .write.parquet(s"$dir/data/torn/codes")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/.manifest.json.torn.tmp"),
        """{"commit":"torn","tables":["codes"],"files":[{"table":"codes","path":"data/torn/codes/x.parquet","bytes":1}]}""")
      val (commit3, _) = Shard.readTablesManifest(spark, dir)
      assert(commit3 === commit1, "torn write became visible")
      val servedAfter = AnnIndex.topK(AnnIndex.load(spark, dir),
          qRows(Sf0001), k = 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(servedAfter.toSet ===
        served.map(t => (t._1, t._2)).toSet,
        "torn index write changed served results")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("artifact audit: every corpus vector coded exactly once, " +
      "codebook shapes pinned") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annidx2").toString
    try {
      val emb = Tables.embeddings(spark, Sf0001)
      AnnIndex.build(emb, dir)
      val loaded = AnnIndex.load(spark, dir)
      assert(loaded.centroids.length === AnnIndex.Nlist)
      loaded.centroids.foreach(c => assert(c.length === 64))
      assert(loaded.codebooks.length === AnnIndex.Subs)
      loaded.codebooks.foreach { b =>
        assert(b.length === 4)
        b.foreach(cv => assert(cv.length === 16))
      }
      val n = emb.count()
      assert(loaded.codes.count() === n)
      assert(loaded.codes.select("vec_id").distinct().count() === n)
      // codes in range, lists in range
      val bad = loaded.codes.filter(
        col("list_id") < 0 || col("list_id") >= AnnIndex.Nlist ||
        col("k0") < 0 || col("k0") > 3 || col("k1") < 0 || col("k1") > 3 ||
        col("k2") < 0 || col("k2") > 3 || col("k3") < 0 || col("k3") > 3)
      assert(bad.count() === 0)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
