package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** r20 contract: the fused multi-subspace PQ fit
  * ([[Lloyd.fitL2Multi]] — one exploded aggregate per round) must be
  * BIT-IDENTICAL per subspace to the solo [[Lloyd.fitL2]] chain it
  * replaces, on the real embedding corpus and the real subspace
  * slices the PQ family uses. */
class LloydSpec extends SparkSuite {

  test("fitL2Multi ≡ per-subspace fitL2 (codebooks exactly equal)") {
    val frame = graft.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    val subs = 0 until 4
    val solo = subs.map { sub =>
      Lloyd.fitL2(frame, slice(col("v"), 16 * sub + 1, 16),
        "vec_id", k = 4, dim = 16, iters = 2)
    }
    val fused = Lloyd.fitL2Multi(frame,
      subs.map(sub => slice(col("v"), 16 * sub + 1, 16)),
      "vec_id", k = 4, dim = 16, iters = 2)
    assert(fused.length === solo.length)
    subs.foreach { sub =>
      assert(fused(sub).length === solo(sub).length)
      fused(sub).zip(solo(sub)).zipWithIndex.foreach {
        case ((f, s), c) =>
          assert(f.toSeq === s.toSeq, s"sub $sub centroid $c")
      }
    }
  }
}
