package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contracts of the X190 BH-FDR stack: the A&S p-value lane's
  * calibration, the BH step against a driver brute force (ties and
  * NULLs included), and the null/effect separation on the real
  * corpus family. */
class FdrSpec extends SparkSuite {
  import spark.implicits._

  test("pTwoSided: calibrated at the textbook points, monotone in |z|") {
    val df = Seq(0.0, 0.5, 1.0, 1.959964, 2.575829, 4.0)
      .toDF("z").withColumn("p", Fdr.pTwoSided(col("z")))
    val ps = df.orderBy("z").collect().map(_.getDouble(1))
    assert(math.abs(ps(0) - 1.0) < 1e-6)       // z=0 -> p=1
    assert(math.abs(ps(3) - 0.05) < 1e-6)      // z=1.96 -> p=.05
    assert(math.abs(ps(4) - 0.01) < 1e-6)      // z=2.576 -> p=.01
    assert(ps.sliding(2).forall { case Array(a, b) => b < a })
    // NULL z propagates
    val pn = Seq[Option[Double]](None).toDF("z")
      .select(Fdr.pTwoSided(col("z"))).head()
    assert(pn.isNullAt(0))
  }

  test("bh: matches a driver brute force with ties and NULL p") {
    // m=5 non-null tests; t2/t3 tie at 0.02; alpha=0.1
    // sorted: (t1,.001,r1) (t2,.02,r2) (t3,.02,r3) (t4,.04,r4) (t5,.9,r5)
    // crit:    .02         .04         .06         .08         .10
    // p<=crit: yes         yes         yes         yes         no
    // kstar=4 -> t1..t4 rejected, t5 retained, t6 (NULL) all-NULL
    val df = Seq(
      ("t1", Some(0.001)), ("t2", Some(0.02)), ("t3", Some(0.02)),
      ("t4", Some(0.04)), ("t5", Some(0.9)), ("t6", None))
      .toDF("test_id", "p").localCheckpoint(true)
    val out = Fdr.bh(df, "test_id", "p", alpha = 0.1)
      .orderBy("test_id").collect()
    val byId = out.map(r => r.getString(0) -> r).toMap
    assert(byId("t1").getAs[Long]("bh_rank") === 1L)
    assert(byId("t2").getAs[Long]("bh_rank") === 2L) // tie-break by id
    assert(byId("t3").getAs[Long]("bh_rank") === 3L)
    Seq("t1", "t2", "t3", "t4").foreach { id =>
      assert(byId(id).getAs[Long]("rejected") === 1L, id) }
    assert(byId("t5").getAs[Long]("rejected") === 0L)
    assert(byId("t6").isNullAt(byId("t6").fieldIndex("bh_rank")))
    assert(byId("t6").isNullAt(byId("t6").fieldIndex("rejected")))
    // crit lane: rank * alpha / m, floored 1e-9
    assert(byId("t4").getAs[Double]("bh_crit") === 0.08)
  }

  test("bh: rejection set is always a prefix of the p-sorted order " +
      "on the real corpus family") {
    val out = graft.queries.DiagnosticsQueries.bhFdr
      .fn(spark, Sf0001).collect()
    val nonNull = out.filter(!_.isNullAt(out.head.fieldIndex("p")))
      .map(r => (r.getAs[Double]("p"), r.getAs[Long]("bh_rank"),
        r.getAs[Long]("rejected")))
      .sortBy(_._2)
    // ranks are 1..m and rejections form a prefix
    assert(nonNull.map(_._2).toSeq === (1L to nonNull.length).toSeq)
    val flags = nonNull.map(_._3)
    val firstKeep = flags.indexOf(0L)
    if (firstKeep >= 0)
      assert(flags.drop(firstKeep).forall(_ == 0L), flags.toSeq)
  }
}
