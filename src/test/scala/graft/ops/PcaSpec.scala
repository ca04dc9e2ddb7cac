package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contracts of the X188 PCA stack: the DoubleVecSum moment
  * accumulator against a driver recompute (integer-valued doubles so
  * fold order cannot matter), the eigen-solve's defining properties
  * (unit norms, orthogonality, λ ordering), and the projection's
  * variance dominance on the real corpus. */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  test("DoubleVecSum: element-wise sum survives partition merges " +
      "(integer-valued doubles, exact under any fold order)") {
    val rows = (1 to 100).map(i =>
      Array(i.toDouble, (2 * i).toDouble, (i % 7).toDouble))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v")
    val got = df.agg(graft.functions.VecAggregates.vecSum(col("v"), 3))
      .head().getSeq[Double](0)
    val want = rows.transpose.map(_.sum)
    assert(got.toSeq === want.toSeq)
  }

  test("powerIter: recovers the dominant eigenvector of a known " +
      "2x2 matrix") {
    // [[2,1],[1,2]] has eigenpairs (3, [1,1]/sqrt2), (1, [1,-1]/sqrt2)
    val c = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (v, l) = Pca.powerIter(c, 2, 12)
    assert(math.abs(l - 3.0) < 1e-4)
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-4)
    assert(math.abs(v(0) - v(1)) < 1e-4)
  }

  test("fit on the corpus: unit-norm components, near-orthogonal, " +
      "lambda1 >= lambda2 >= 0; projection variances track lambdas") {
    val emb = graft.Tables.embeddings(spark, Sf0001)
    val m = Pca.fit(emb, "embedding", dims = 64, iters = 12)
    // qround(6) canonicalizes every per-round lane, so norms are
    // unit only to the rounding contract, not to machine epsilon
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(m.v1) - 1.0) < 1e-3)
    assert(math.abs(norm(m.v2) - 1.0) < 1e-3)
    val dot = m.v1.zip(m.v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 5e-3, s"components not orthogonal: $dot")
    assert(m.lambda1 >= m.lambda2 && m.lambda2 >= 0.0)
    // projection variance onto v_k estimates lambda_k (exact at
    // convergence; 12 qround'd rounds land within a loose band)
    val proj = Pca.project(emb, "vec_id", "embedding", m)
    val row = proj.agg(var_pop(col("pc1")), var_pop(col("pc2"))).head()
    assert(math.abs(row.getDouble(0) - m.lambda1) / m.lambda1 < 0.05)
    assert(row.getDouble(0) >= row.getDouble(1))
  }
}
