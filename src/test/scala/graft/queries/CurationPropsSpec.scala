package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Property tests for the round-6 curation operators — invariants the
  * row-level oracle can't state (cross-row structure, statistical
  * contracts). */
class CurationPropsSpec extends SparkSuite {

  test("q_leakage_split: no near-dup cluster straddles two splits") {
    val df = SimilarityQueries.leakageSplit.fn(spark, Sf0001)
    val spanning = df.groupBy("canonical_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    assert(spanning === 0L)
    // all three splits exist and train dominates at 80/10/10
    val sizes = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set("train", "valid", "test"))
    assert(sizes("train") > sizes("valid") + sizes("test"))
  }

  test("q_leakage_split: split is keyed on the cluster, not the doc") {
    val df = SimilarityQueries.leakageSplit.fn(spark, Sf0001)
    // duplicate docs (canonical != self) inherit their canonical's
    // split even when their OWN doc_id would hash elsewhere
    val dupes = df.filter(col("doc_id") =!= col("canonical_id"))
    assert(dupes.count() > 0, "fixture has no near-dup clusters")
    val canon = df.select(col("doc_id").as("canonical_id"),
      col("split").as("canon_split"))
    val mismatched = dupes.join(canon, "canonical_id")
      .filter(col("split") =!= col("canon_split")).count()
    assert(mismatched === 0L)
  }

  test("q_embed_rp: Rademacher projection preserves norms in expectation") {
    val proj = SimilarityQueries.embedRp.fn(spark, Sf0001)
    val projNorm = proj.groupBy("vec_id")
      .agg(sum(col("proj") * col("proj")).as("pn2"))
    val origNorm = graft.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double")).as("n2"))
    // E[||Px||^2] = k * ||x||^2 for k=16 ±1-rows; corpus mean ratio
    // should land near 16 (JL concentration at 500 vectors)
    val ratio = projNorm.join(origNorm, "vec_id")
      .agg(avg(col("pn2") / col("n2"))).head.getDouble(0)
    assert(ratio > 12 && ratio < 20, s"mean norm ratio $ratio")
  }

  test("q_embed_rp: projection is an exact fold (partitioning-proof)") {
    val a = SimilarityQueries.embedRp.fn(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val b = SimilarityQueries.embedRp
      .fn(spark, Sf0001) // plan rebuilt from scratch
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(a === b) // bit-exact, not approximately
    assert(a.size === 500 * 16)
  }
}
