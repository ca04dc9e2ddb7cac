package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ArrayFunctions, VecAggregates}

/** FULL-CORPUS distributed spherical k-means by fixed-round Lloyd
  * iteration (X212) — the scale sibling of [[Similarity.fitIvf]]:
  * where the IVF fit collects a bounded 2048-row SAMPLE to the driver
  * and iterates there, this fit never moves a vector. Each round is
  * ONE map-side-combining pass over the corpus: every partition folds
  * its rows into k per-cluster (count, Σvec) buffers through
  * [[graft.functions.DoubleVecSum]] under a
  * [[graft.functions.ArrayFunctions.nearestCentroid]] codegen
  * assignment, partials merge pairwise, and only k·(dim+1) doubles
  * reach the driver — the centroid matrix is driver-resident metadata
  * that re-enters the next round's scan as literals. At 100 TB that
  * is k × 65 numbers per round regardless of corpus size.
  *
  * Determinism contract (the X66/X188/X189 pinned-round discipline):
  * the result is "`iters`-round Lloyd from the k lowest-id vectors",
  * not "the converged clustering". The per-cluster mean lanes are
  * merged-fold doubles → each dimension is qround(6) before the
  * (element-wise, hence bit-identical) L2 normalization, so any
  * engine replaying the same rounds lands on identical centroids.
  * Ties in the assignment argmax break first-max (lowest cluster id),
  * matching the oracle's `ORDER BY dot DESC, c ASC` row_number.
  * Empty clusters keep their previous centroid (the fitIvf rule). */
object Lloyd {

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Left-fold L2 normalization — same accumulation order as the
    * oracle's `list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)`
    * so the sqrt argument is bit-identical. */
  private[ops] def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** The shared Lloyd round body (VERDICT r13 #7 — `fit` and `fitL2`
    * previously carried near-identical copies): `iters` rounds where
    * each round is ONE map-side-combining groupBy(assign).agg(count,
    * vecSum) pass collecting ≤ k rows, means are qround(6) per
    * dimension, empty clusters keep their previous centroid, and
    * `finish` post-processes each new centroid (L2-normalize for the
    * spherical lane, identity for plain L2). */
  private def rounds(frame: DataFrame, sumVec: Column, k: Int, dim: Int,
      iters: Int, init: Array[Array[Double]],
      assign: Array[Array[Double]] => Column,
      finish: Array[Double] => Array[Double]): Array[Array[Double]] = {
    var cents = init
    for (_ <- 0 until iters) {
      val rows = frame
        .groupBy(assign(cents).as("c"))
        .agg(count(lit(1)).as("n"),
          VecAggregates.vecSum(sumVec, dim).as("s"))
        .collect() // ≤ k rows: bounded driver metadata
      val byC = rows.map(r =>
        r.getInt(0) -> (r.getLong(1), r.getSeq[Double](2).toArray)).toMap
      cents = Array.tabulate(k) { c =>
        byC.get(c) match {
          case Some((n, sum)) if n > 0 => finish(sum.map(x => q6(x / n)))
          case _ => cents(c)
        }
      }
    }
    cents
  }

  /** `iters` Lloyd rounds over the whole corpus; returns the final
    * L2-normalized centroid matrix (k × dim). `vecCol` may be
    * array<float> — widened exactly to double on both engines. */
  def fit(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, dim: Int, iters: Int): Array[Array[Double]] = {
    val init = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(init.length == k, s"corpus has < $k vectors")
    rounds(corpus, col(vecCol).cast("array<double>"), k, dim, iters,
      init.map(normalize),
      cents => ArrayFunctions.nearestCentroid(col(vecCol), cents),
      normalize)
  }

  /** ||v − c||² as a 0.0-init sequential zip-fold — identical
    * accumulation to the oracle's list_reduce(list_transform(...))
    * (0.0 + e₁ ≡ e₁, the recorded fold-equivalence), so per-row
    * distances are bit-identical cross-engine. Interpreted HOFs —
    * fine for the bounded k×subdim product-quantization tier (X236),
    * NOT for a 64-dim full-corpus hot path (the X189 lesson; that
    * path has the fused NearestCentroid kernel). */
  def sqDist(v: Column, c: Array[Double]): Column =
    aggregate(zip_with(v, typedLit(c.toSeq),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, t) => acc + t)

  /** argmin_c ||v − c||², first-min tie-break (array_position finds
    * the FIRST occurrence — mirrors the oracle's
    * `ORDER BY dist ASC, c ASC` row_number). */
  def assignL2(v: Column, cents: Array[Array[Double]]): Column = {
    val dists = array(cents.map(c => sqDist(v, c)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Plain-L2 (non-spherical) fixed-round Lloyd over an arbitrary
    * vector EXPRESSION — the product-quantization subspace fit
    * (X236): same one-aggregated-pass-per-round / qround(6)-mean
    * shape as [[fit]], but argmin Euclidean distance and NO
    * normalization (PQ codebooks are means, not directions). `vec`
    * must already be array<double>. */
  def fitL2(corpus: DataFrame, vec: Column, idCol: String,
      k: Int, dim: Int, iters: Int): Array[Array[Double]] = {
    val frame = corpus.select(col(idCol).as("__id"), vec.as("__v"))
    val init = frame.orderBy(col("__id")).limit(k)
      .select(col("__v")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(init.length == k, s"corpus has < $k vectors")
    rounds(frame, col("__v"), k, dim, iters, init,
      cents => assignL2(col("__v"), cents), identity)
  }

  /** [[fitL2]] over SEVERAL vector expressions in lock-step (r20 —
    * VERDICT r19 #4: the M=4 PQ subspace fits each paid their own
    * init collect plus one aggregate job per round; 4 × (1 + 2) jobs
    * per codebook family). The subspaces are independent, but every
    * round of every subspace scans the same rows — so ONE init
    * collect serves all M, and each round is ONE exploded (sub,
    * assign)-keyed aggregate collecting ≤ M·k bounded rows: iters+1
    * jobs instead of M·(iters+1). Per (sub, c) group the count/vecSum
    * buffers are fed the same values in the same partition-local
    * order as a solo [[fitL2]] run, means are q6'd identically, and
    * empty clusters keep their previous centroid — LloydSpec pins
    * per-subspace equality with [[fitL2]]. */
  def fitL2Multi(corpus: DataFrame, vecs: Seq[Column], idCol: String,
      k: Int, dim: Int, iters: Int): IndexedSeq[Array[Array[Double]]] = {
    val m = vecs.length
    require(m > 0, "fitL2Multi: no subspaces")
    val frame = corpus.select(col(idCol).as("__id") +:
      vecs.zipWithIndex.map { case (v, i) => v.as(s"__v$i") }: _*)
    val initRows = frame.orderBy(col("__id")).limit(k).collect()
    require(initRows.length == k, s"corpus has < $k vectors")
    var cents: IndexedSeq[Array[Array[Double]]] = (0 until m).map { i =>
      initRows.map(_.getSeq[Double](i + 1).toArray).toArray
    }.toIndexedSeq
    for (_ <- 0 until iters) {
      val exploded = frame.select(explode(array((0 until m).map { i =>
        struct(lit(i).as("sub"),
          assignL2(col(s"__v$i"), cents(i)).as("c"),
          col(s"__v$i").as("v"))
      }: _*)).as("e"))
      val rows = exploded
        .groupBy(col("e.sub").as("sub"), col("e.c").as("c"))
        .agg(count(lit(1)).as("n"),
          VecAggregates.vecSum(col("e.v"), dim).as("s"))
        .collect() // ≤ m·k rows: bounded driver metadata
      val bySub = rows.groupBy(_.getInt(0))
      cents = (0 until m).map { i =>
        val byC = bySub.getOrElse(i, Array.empty[org.apache.spark.sql.Row])
          .map(r => r.getInt(1) -> (r.getLong(2), r.getSeq[Double](3).toArray))
          .toMap
        Array.tabulate(k) { c =>
          byC.get(c) match {
            case Some((n, sum)) if n > 0 => sum.map(x => q6(x / n))
            case _ => cents(i)(c)
          }
        }
      }.toIndexedSeq
    }
    cents
  }
}
