package graft.plans

import graft.SparkSuite
import graft.functions.ArrayFunctions
import org.apache.spark.sql.functions._

class JaccardPrefilterRuleSpec extends SparkSuite {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    graft.GraftExtensions.register(spark)
    try f
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == JaccardPrefilterRule)
    }
  }

  private val df = Seq(
    (Seq("a", "b", "c"), Seq("a", "b", "c")),      // j = 1.0
    (Seq("a", "b", "c"), Seq("a", "b", "d")),      // j = 0.5
    (Seq("a"), Seq("a", "b", "c", "d", "e", "f")), // j ~ 0.17, sizes 1 vs 6
    (Seq("x"), Seq("y"))).toDF("sa", "sb")         // j = 0

  test("rule injects the size prefilter into jaccard threshold filters") {
    // direct application (a fully-local relation would be constant-
    // folded away before we could observe the filter)
    val analyzed = df.filter(
      ArrayFunctions.jaccardSim(col("sa"), col("sb")) >= 0.5)
      .queryExecution.analyzed
    val rewritten = JaccardPrefilterRule(analyzed).toString
    assert(rewritten.contains("size("), s"prefilter missing:\n$rewritten")
    assert(rewritten.contains("jaccard_sim"))
  }

  test("rule fires in a real optimized plan over a file source") {
    withRule {
      val docs = graft.Tables.documents(spark, Sf0001).limit(50)
      val sh = docs.select(col("doc_id"),
        graft.functions.ShingleFunctions.shingleHashes(col("text"), 3)
          .as("sh"))
      val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      val q = a.join(b, col("id_a") < col("id_b"))
        .filter(ArrayFunctions.jaccardSim(col("sh_a"), col("sh_b")) >= 0.9)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("size("), s"prefilter missing:\n$optimized")
      q.count() // plan executes
    }
  }

  test("rewritten filter result equals the unoptimized result") {
    val plain = df.filter(
        ArrayFunctions.jaccardSim(col("sa"), col("sb")) >= 0.17)
      .collect().map(_.getSeq[String](0)).toSet
    withRule {
      val got = df.filter(
          ArrayFunctions.jaccardSim(col("sa"), col("sb")) >= 0.17)
        .collect().map(_.getSeq[String](0)).toSet
      assert(got === plain)
    }
  }

  test("rule leaves hand-prefiltered conditions untouched (idempotence guard)") {
    withRule {
      val q = df.filter(size(col("sa")) >= size(col("sb")) &&
        ArrayFunctions.jaccardSim(col("sa"), col("sb")) >= 0.5)
      // one Size-bearing condition already present -> no double insert;
      // plan must still be valid and correct
      assert(q.count() === 2)
    }
  }
}
