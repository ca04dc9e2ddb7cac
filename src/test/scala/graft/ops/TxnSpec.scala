package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** X299 multi-table atomic commit: the two-table transaction contract
  * — readers resolve every table of the set through ONE manifest, so
  * they see either both new tables or both old ones. Simulates the
  * exact crash window the protocol exists for: table 1 of commit B
  * fully written, table 2 never started, manifest never swapped. */
class TxnSpec extends SparkSuite {

  test("writeTablesAtomic: both-or-neither across a crash between " +
      "table writes") {
    val docs = Tables.documents(spark, Sf0001).select(
      col("doc_id"), col("source"), col("n_chars"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-txn").toString
    try {
      // commit A: the old consistent pair (90% of the corpus + its
      // verdict sidecar)
      val oldDocs = docs.filter(col("doc_id") % 10 =!= 7)
      val oldVerd = oldDocs.select(col("doc_id"),
        (col("doc_id") * 2).as("canonical_id"))
      Shard.writeTablesAtomic(
        Seq("docs" -> oldDocs, "verdicts" -> oldVerd), dir,
        commitId = "a")
      def docIds() = Shard.readTableViaManifest(spark, dir, "docs")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      def verdIds() = Shard.readTableViaManifest(spark, dir, "verdicts")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val expectedOld = oldDocs.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(docIds() === expectedOld)
      assert(verdIds() === expectedOld, "pair A inconsistent")

      // CRASH WINDOW: commit B writes its full docs table, then dies
      // before the verdicts table and before the manifest swap
      docs.write.parquet(s"$dir/data/b/docs")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/.manifest.json.b.tmp"),
        """{"commit":"b","tables":["docs","verdicts"],"files":[{"table":"docs","path":"data/b/docs/x.parquet","bytes":1}]}""")
      // readers still see pair A — and CONSISTENTLY: both tables from
      // the same commit, row sets equal
      assert(docIds() === expectedOld,
        "half-written commit leaked into docs readers")
      assert(verdIds() === expectedOld,
        "half-written commit leaked into verdicts readers")

      // a COMPLETED commit B swaps both tables at once
      val verd = docs.select(col("doc_id"),
        (col("doc_id") * 3).as("canonical_id"))
      Shard.writeTablesAtomic(
        Seq("docs" -> docs, "verdicts" -> verd), dir, commitId = "b2")
      val expectedAll = docs.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(docIds() === expectedAll)
      assert(verdIds() === expectedAll)
      val canon = Shard.readTableViaManifest(spark, dir, "verdicts")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      canon.foreach { case (id, c) => assert(c === id * 3) }
      // commit ids are single-use here too
      val ex = intercept[IllegalArgumentException] {
        Shard.writeTablesAtomic(Seq("docs" -> docs), dir, commitId = "b2")
      }
      assert(ex.getMessage.contains("single-use"))
      // GC drops the superseded commit A and the abandoned half-commit
      // b, keeps the live b2
      Shard.gcOldCommits(spark, dir)
      val left = new java.io.File(s"$dir/data").listFiles().map(_.getName)
      assert(left.toSet === Set("b2"), s"GC left: ${left.toSeq}")
      assert(docIds() === expectedAll)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
