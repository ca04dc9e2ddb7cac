package graft.ops

import graft.SparkSuite

/** Contracts of the X201 GBDT stack: the split search against a
  * hand-worked histogram, and genuine learning plus identity pins on
  * the corpus fit. */
class GbdtSpec extends SparkSuite {

  test("bestSplit: picks the gain-maximal threshold with the " +
      "deterministic tie-break") {
    // feature 1: residuals split cleanly at bin<=0 (sum -4|+4)
    // feature 2: no separation (both bins sum 0)
    val hist = Seq(
      (1, 0, 4L, -4.0), (1, 1, 4L, 4.0),
      (2, 0, 4L, 0.0), (2, 1, 4L, 0.0))
    val st = Gbdt.bestSplit(hist)
    assert(st.j === 1)
    assert(st.bin === 0)
    assert(st.vl === -1.0) // -4/4
    assert(st.vr === 1.0)
    // tie on gain (two identical features) -> lowest j wins
    val tied = Seq(
      (2, 0, 2L, -2.0), (2, 1, 2L, 2.0),
      (1, 0, 2L, -2.0), (1, 1, 2L, 2.0))
    assert(Gbdt.bestSplit(tied).j === 1)
  }

  test("corpus fit: learns the token-count curve and the model is " +
      "the literal chain it claims") {
    val out = graft.queries.TrainPrepQueries.gbdtStumps
      .fn(spark, Sf0001).collect()
    val ys = out.map(_.getAs[Double]("y"))
    val mae = out.map(_.getAs[Double]("abs_err")).sum / out.length
    val my = ys.sum / ys.length
    val sd = math.sqrt(ys.map(v => (v - my) * (v - my)).sum / ys.length)
    assert(mae < 0.5 * sd, s"mae $mae vs sd $sd — no learning")
    // the first stump must split on the dominant feature (n_chars)
    assert(out.head.getAs[Long]("r1_feat") === 1L)
    // pred and abs_err are consistent
    out.take(50).foreach { r =>
      assert(r.getAs[Double]("abs_err") ===
        math.abs(r.getAs[Double]("y") - r.getAs[Double]("pred")))
    }
  }
}
