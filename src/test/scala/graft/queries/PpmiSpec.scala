package graft.queries

import graft.SparkSuite

/** Contracts of the X206 PPMI-SVD embeddings: spectral identities of
  * the emitted factors. */
class PpmiSpec extends SparkSuite {

  private lazy val rows = SimilarityQueries.ppmiSvd.fn(spark, Sf0001)
    .collect()

  test("lambda ordering and the sqrt-lambda scaling identities hold") {
    val l1 = rows.head.getAs[Double]("lambda1")
    val l2 = rows.head.getAs[Double]("lambda2")
    assert(l1 >= l2, s"$l1 < $l2")
    assert(l1 > 0.0, "top PPMI eigenvalue not positive")
    // e = v * sqrt(lambda) with v unit (to the qround contract):
    // sum(e1^2) ~ lambda1
    val s1 = rows.map(r => math.pow(r.getAs[Double]("e1"), 2)).sum
    assert(math.abs(s1 - l1) / l1 < 1e-2, s"sum e1^2 $s1 vs l1 $l1")
    if (l2 > 0.0) {
      val s2 = rows.map(r => math.pow(r.getAs[Double]("e2"), 2)).sum
      assert(math.abs(s2 - l2) / l2 < 1e-2, s"sum e2^2 $s2 vs l2 $l2")
      // per-round Gram-Schmidt makes the factors near-orthogonal
      val dot = rows.map(r =>
        r.getAs[Double]("e1") * r.getAs[Double]("e2")).sum
      assert(math.abs(dot) / math.sqrt(l1 * l2) < 0.05,
        s"factors not orthogonal: $dot")
    }
  }

  test("vocabulary ranks are dense and frequency-ordered") {
    val sorted = rows.sortBy(_.getAs[Long]("rnk"))
    assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
      (1L to rows.length).toSeq)
    val cnts = sorted.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }
}
