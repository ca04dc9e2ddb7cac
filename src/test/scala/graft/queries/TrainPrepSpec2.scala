package graft.queries

import graft.SparkSuite

/** Contracts of the X198 target encoding and X199 permutation test:
  * leakage exclusion and verdict lanes against driver recomputes. */
class TrainPrepSpec2 extends SparkSuite {

  test("q_target_encode: te is the out-of-fold mean — never sees " +
      "the row's own fold") {
    val rows = TrainPrepQueries.targetEncode.fn(spark, Sf0001)
      .collect()
    // recompute (source, fold) stats from the output itself
    val bySf = rows.groupBy(r =>
      (r.getAs[String]("source"), r.getAs[Long]("fold")))
      .map { case (k, rs) =>
        k -> (rs.length.toLong, rs.map(_.getAs[Long]("y")).sum) }
    val byS = rows.groupBy(_.getAs[String]("source"))
      .map { case (k, rs) =>
        k -> (rs.length.toLong, rs.map(_.getAs[Long]("y")).sum) }
    val prior = rows.map(_.getAs[Long]("y")).sum.toDouble / rows.length
    rows.foreach { r =>
      val (nSf, sSf) = bySf((r.getAs[String]("source"),
        r.getAs[Long]("fold")))
      val (nS, sS) = byS(r.getAs[String]("source"))
      val want = (sS - sSf).toDouble / (nS - nSf).toDouble
      assert(r.getAs[Double]("te") === want)
      assert(r.getAs[Double]("te_sm") ===
        ((sS - sSf).toDouble + 10.0 * prior) /
          ((nS - nSf).toDouble + 10.0))
    }
  }

  test("q_did: the four cell means compose into did and z exactly") {
    val r = DiagnosticsQueries.did.fn(spark, Sf0001).head()
    val did = (r.getAs[Double]("mean_treat_post") -
      r.getAs[Double]("mean_treat_pre")) -
      (r.getAs[Double]("mean_ctrl_post") -
        r.getAs[Double]("mean_ctrl_pre"))
    assert(r.getAs[Double]("did") === did)
    assert(r.getAs[Double]("z") ===
      did / r.getAs[Double]("se"))
    // the treat group's LEVEL advantage must be differenced out:
    // |did| far below the raw treat-vs-ctrl gap
    val levelGap = r.getAs[Double]("mean_treat_post") -
      r.getAs[Double]("mean_ctrl_post")
    assert(math.abs(r.getAs[Double]("did")) < math.abs(levelGap))
  }

  test("q_perm_test: verdict lanes recompute from the replicate " +
      "ensemble and the p-value is the add-one rank") {
    val row = DiagnosticsQueries.permTest.fn(spark, Sf0001).head()
    val b = row.getAs[Long]("b_reps")
    val nExtreme = row.getAs[Long]("n_extreme")
    assert(row.getAs[Double]("p_perm") ===
      (1.0 + nExtreme) / (b + 1).toDouble)
    assert(nExtreme >= 0L && nExtreme <= b)
    assert(row.getAs[Double]("null_lo") <= row.getAs[Double]("null_hi"))
    // the hash split is null by construction: the observed uplift
    // should not be an extreme outlier of its own null ensemble
    assert(nExtreme > 0L,
      "observed uplift outside the entire null ensemble on a null split")
  }
}
