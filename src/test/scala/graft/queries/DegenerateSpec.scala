package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-corpus guards (VERDICT r12 #2): the one known
  * cross-engine divergence class left after round 12 was an
  * unexercised denominator — an empty 'en' slice (q_ks_test), a
  * zero-edge graph (q_graph_shape), zero candidate pairs on either
  * side (q_lsh_dedup_eval). The guards shipped with the queries
  * (NULLIF in the oracle SQL, when-zero literals in the Spark plans);
  * these cases actually FEED each degenerate slice and pin the NULL
  * the guard promises — the same NULL the oracle's NULLIF yields, so
  * a future regression to Infinity/NaN (Spark) vs inf (DuckDB) fails
  * here, not in a production corpus. */
class DegenerateSpec extends SparkSuite {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Write a documents.parquet fixture dir and return the dir path. */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]):
      String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_degen_").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t, l, s, n) =>
        org.apache.spark.sql.Row(id, t, l, s, n)
      }, 1), docSchema)
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_ks_test: empty 'en' slice → NULL ecdf_a/crit, not Infinity") {
    // three docs, none English: n_a = 0, so ecdf_a, d, ks_crit and
    // exceeds must all be NULL (the NULLIF lane), while ecdf_b stays
    // a real ratio
    val dir = docsDir(Seq(
      (1L, "le chat noir dort", "fr", "web", 18L),
      (2L, "der hund lauft schnell heute", "de", "web", 28L),
      (3L, "el gato come pescado fresco", "es", "web", 27L)))
    val rows = SparkEntry.queries("q_ks_test")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("ecdf_a")))
      assert(r.isNullAt(r.fieldIndex("d")))
      assert(r.isNullAt(r.fieldIndex("ks_crit")))
      assert(r.isNullAt(r.fieldIndex("exceeds")))
      assert(!r.isNullAt(r.fieldIndex("ecdf_b")))
      assert(r.getLong(r.fieldIndex("n_a")) === 0L)
    }
  }

  test("q_graph_shape: zero-edge graph → NULL reciprocity/assortativity") {
    val dir = docsDir(Seq.empty)
    val r = SparkEntry.queries("q_graph_shape")(spark, dir).head()
    assert(r.getLong(r.fieldIndex("n_edges")) === 0L)
    assert(r.getLong(r.fieldIndex("n_recip")) === 0L)
    assert(r.isNullAt(r.fieldIndex("reciprocity")))
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("q_lsh_dedup_eval: zero pairs on both sides → NULL precision/recall") {
    // three pairwise-disjoint texts: no LSH candidate survives the
    // 0.4 threshold and the exact side is empty too, so both ratio
    // denominators hit the when-zero lane
    val dir = docsDir(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "web", 35L),
      (2L, "one two three four five six seven", "en", "web", 33L),
      (3L, "rot blau gruen gelb weiss schwarz", "en", "web", 33L)))
    val r = SparkEntry.queries("q_lsh_dedup_eval")(spark, dir).head()
    assert(r.getLong(r.fieldIndex("n_lsh")) === 0L)
    assert(r.getLong(r.fieldIndex("n_exact")) === 0L)
    assert(r.getLong(r.fieldIndex("n_hit")) === 0L)
    assert(r.isNullAt(r.fieldIndex("precision")))
    assert(r.isNullAt(r.fieldIndex("recall")))
  }
}
