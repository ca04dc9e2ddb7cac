package graft.queries

import graft.SparkSuite

/** Contracts of the X193 isotonic calibration: monotonicity, the
  * PAV block-mean conservation law, and equality of the minimax
  * characterization with the classical stack-based PAV algorithm. */
class IsotonicSpec extends SparkSuite {

  private lazy val out = TextQueries.isotonic.fn(spark, Sf0001)
    .collect()
    .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_pos"), r.getAs[Double]("iso_rate")))
    .sortBy(_._1)

  /** Classical PAV: merge adjacent blocks while a violator exists;
    * block value = pooled Σc/Σn. */
  private def stackPav(ns: Seq[Long], cs: Seq[Long]): Seq[Double] = {
    case class Block(n: Long, c: Long, size: Int) {
      def mean: Double = c.toDouble / n.toDouble
    }
    val st = scala.collection.mutable.Stack[Block]()
    ns.zip(cs).foreach { case (n, c) =>
      var b = Block(n, c, 1)
      while (st.nonEmpty && st.top.mean >= b.mean) {
        val t = st.pop()
        b = Block(t.n + b.n, t.c + b.c, t.size + b.size)
      }
      st.push(b)
    }
    st.toSeq.reverse.flatMap(b => Seq.fill(b.size)(b.mean))
  }

  test("iso_rate is nondecreasing in bin order") {
    val iso = out.map(_._4).toSeq
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
  }

  test("conservation: within each pooled block, sum(iso*n) = sum(pos)") {
    // blocks = maximal runs of equal iso values
    var i = 0
    while (i < out.length) {
      var j = i
      while (j + 1 < out.length && out(j + 1)._4 == out(i)._4) j += 1
      val n = out.slice(i, j + 1).map(_._2).sum
      val c = out.slice(i, j + 1).map(_._3).sum
      assert(out(i)._4 === c.toDouble / n.toDouble,
        s"block [${out(i)._1}..${out(j)._1}]")
      i = j + 1
    }
  }

  test("minimax fit equals classical stack PAV") {
    val pav = stackPav(out.map(_._2), out.map(_._3))
    assert(out.map(_._4).toSeq === pav)
  }
}
