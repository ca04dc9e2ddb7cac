package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** DSIR importance resampling: λ separates target-like from raw-like
  * documents, acceptance is deterministic, degenerate fits refuse. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  // target docs speak "aaa bbb", raw docs speak "xxx yyy" — maximal
  // bucket separation, so λ must rank every target-like doc above
  // every raw-like doc
  private def corpus() =
    (Seq.tabulate(20)(i => (i.toLong, "aaa bbb aaa bbb aaa", true)) ++
      Seq.tabulate(20)(i => ((i + 20).toLong, "xxx yyy xxx yyy xxx", false)))
      .toDF("doc_id", "text", "is_t")

  test("lambda weights rank target-like docs above raw-like docs") {
    val df = corpus()
    val m = Dsir.fit(df, col("text"), col("is_t"), 256)
    val scored = df
      .select(col("is_t"),
        element_at(Dsir.logWeightStats(col("text"), m), 1).as("lw"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1)))
    val tMin = scored.filter(_._1).map(_._2).min
    val rMax = scored.filterNot(_._1).map(_._2).max
    assert(tMin > 0.0 && rMax < 0.0,
      s"target min λ=$tMin must be > 0 > raw max λ=$rMax")
  }

  test("acceptance is deterministic and keeps target-like docs") {
    val df = corpus()
    val m = Dsir.fit(df, col("text"), col("is_t"), 256)
    def kept() = df
      .select(col("doc_id"), col("is_t"),
        (Dsir.hashUniform(col("doc_id"), "dsir:") <
          least(exp(element_at(Dsir.logWeightStats(col("text"), m), 1)),
            lit(1.0))).as("kept"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    val a = kept(); val b = kept()
    assert(a.toSeq === b.toSeq) // bit-exact reproducibility
    // with this separation every target doc has λ ≫ 0 (p = 1)
    assert(a.filter(_._2).forall(_._3))
    // and raw docs have λ ≪ 0 (p ≈ 0)
    assert(a.filterNot(_._2).forall(!_._3))
  }

  test("hashUniform lies strictly in (0,1) and varies by id") {
    val us = (0L until 100L).toDF("id")
      .select(Dsir.hashUniform(col("id"), "dsir:").as("u"))
      .as[Double].collect()
    assert(us.forall(u => u > 0.0 && u < 1.0))
    assert(us.distinct.length > 90)
  }

  test("fit refuses a single-class corpus") {
    val df = Seq((1L, "aaa", true), (2L, "bbb", true))
      .toDF("doc_id", "text", "is_t")
    val e = intercept[IllegalArgumentException] {
      Dsir.fit(df, col("text"), col("is_t"), 64)
    }
    assert(e.getMessage.contains("target and raw"))
  }
}
