package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Benjamini–Hochberg false-discovery-rate control over a family of
  * hypothesis tests (X190 — Benjamini & Hochberg 1995: the
  * multiple-comparisons step every per-segment experiment readout
  * needs and X124/X136/X177 individually lack; running m tests at
  * α each inflates the family-wise false-positive rate to
  * 1−(1−α)^m, BH bounds the expected FALSE-DISCOVERY share at α by
  * admitting exactly the largest prefix of the p-sorted tests whose
  * p_(i) ≤ i·α/m).
  *
  * Scale shape: the per-test statistics are distributed conditional
  * aggregates (rows never leave the cluster); the BH step itself
  * operates on m rows where m = the number of test DEFINITIONS — a
  * literal of the query, metadata-sized by construction — so it runs
  * on the driver as a bounded collect and the verdicts re-enter the
  * plan as literal maps (the Bloom/IVF device). No window, no join.
  *
  * p-values are the Abramowitz & Stegun 26.2.17 polynomial tail of
  * the standard normal (|error| < 7.5e-8 — and cross-engine equality
  * needs only that both engines run the SAME literal polynomial):
  * p = 2·φ(|z|)·Σ b_i k^i, k = 1/(1 + 0.2316419|z|). The exp inside
  * φ is the one transcendental lane — p floors at 1e-9 on both
  * engines (the X139 device) BEFORE ranking, so the BH order compares
  * quantized lanes. */
object Fdr {

  /** A&S 26.2.17 constants, shared with the oracle SQL. */
  val B: Seq[Double] = Seq(
    0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
  val K0 = 0.2316419
  val TwoPi = 6.283185307179586

  /** Two-sided normal p-value of a z column, floored 1e-9; NULL z
    * propagates. Powers of k are explicit product chains (k, k·k,
    * (k·k)·k, …) — never libm `pow`, whose rounding is not
    * cross-engine reproducible; every multiply here is a single IEEE
    * op, so the whole lane is bit-identical up to the one `exp`. */
  def pTwoSided(z: Column): Column = {
    val az = abs(z)
    val k1 = lit(1.0) / (lit(1.0) + lit(K0) * az)
    val k2 = k1 * k1
    val k3 = k2 * k1
    val k4 = k3 * k1
    val k5 = k4 * k1
    val poly = lit(B(0)) * k1 + lit(B(1)) * k2 + lit(B(2)) * k3 +
      lit(B(3)) * k4 + lit(B(4)) * k5
    val phi = exp(-az * az / lit(2.0)) / sqrt(lit(TwoPi))
    Num.qround(lit(2.0) * phi * poly, 9)
  }

  /** Oracle twin of [[pTwoSided]] — same product chains, same
    * association order, kept adjacent so the lanes stay in sync.
    * `z` must be a plain column reference (it is repeated). */
  def pTwoSidedSql(z: String): String = {
    val k1 = s"(1.0 / (1.0 + $K0 * ABS($z)))"
    val k2 = s"($k1 * $k1)"
    val k3 = s"($k2 * $k1)"
    val k4 = s"($k3 * $k1)"
    val k5 = s"($k4 * $k1)"
    val poly = s"${B(0)} * $k1 + ${B(1)} * $k2 + ${B(2)} * $k3 + " +
      s"${B(3)} * $k4 + ${B(4)} * $k5"
    Num.qroundSql(
      s"""2.0 * (exp(-ABS($z) * ABS($z) / 2.0) / SQRT($TwoPi)) * ($poly)""",
      9)
  }

  /** BH step: given the tests frame carrying (`idCol`: unique string,
    * `pCol`: floored p, possibly NULL), returns the frame with
    * bh_rank (1-based over non-null p ascending, id tie-break),
    * bh_crit = qround(rank·α/m, 9), and rejected (NULL p → NULL rank
    * and rejected). One bounded collect of m rows. */
  def bh(tests: DataFrame, idCol: String, pCol: String,
      alpha: Double): DataFrame = {
    val rows = tests.select(col(idCol), col(pCol)).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None
        else Some(r.getDouble(1))))
    val ranked = rows.collect { case (id, Some(p)) => (id, p) }
      .sortBy { case (id, p) => (p, id) }
      .zipWithIndex.map { case ((id, p), i) => (id, p, i + 1L) }
    val m = ranked.length
    def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def crit(rank: Long): Double = q9(rank * alpha / m)
    val kstar = ranked.filter { case (_, p, r) => p <= crit(r) }
      .map(_._3).sorted.lastOption.getOrElse(0L)
    val rankMap = ranked.map { case (id, _, r) => id -> r }.toMap
    val rejMap = ranked
      .map { case (id, _, r) => id -> (if (r <= kstar) 1L else 0L) }
      .toMap
    val rk = element_at(typedLit(rankMap), col(idCol))
    tests
      .withColumn("bh_rank", rk)
      .withColumn("bh_crit",
        Num.qround(rk.cast("double") * lit(alpha) / lit(m.toDouble), 9))
      .withColumn("rejected",
        element_at(typedLit(rejMap), col(idCol)))
  }
}
