package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contracts of the X192 Shapley attribution: the subset-sum formula
  * against the 4!-permutation definition, and the efficiency
  * identity. */
class ShapleySpec extends SparkSuite {

  private val bits =
    Seq("click" -> 1, "view" -> 2, "signup" -> 4, "error" -> 8)

  /** Observed coalition values at sf0.001, exactly as the query
    * builds them: user-day units, mask>0, v = conv/n, default 0. */
  private lazy val v: Map[Int, Double] = {
    val maskC = bits.map { case (t, b) =>
      max(when(col("event_type") === t, lit(b)).otherwise(lit(0))) * 1
    }.reduce(_ + _)
    graft.Tables.events(spark, Sf0001)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(maskC.as("mask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      .filter(col("mask") > 0).groupBy("mask")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(2).toDouble / r.getLong(1))
      .toMap.withDefaultValue(0.0)
  }

  private lazy val out = EventQueries.shapley.fn(spark, Sf0001)
    .collect().map(r => r.getAs[String]("channel") ->
      r.getAs[Double]("phi")).toMap

  test("phi equals the average marginal over all 4! coalition orders") {
    val chans = bits.map(_._2)
    val perms = chans.permutations.toSeq
    bits.foreach { case (name, bit) =>
      val brute = perms.map { order =>
        val before = order.takeWhile(_ != bit)
          .foldLeft(0)(_ | _)
        v(before | bit) - v(before)
      }.sum / perms.size
      assert(math.abs(out(name) - brute) < 1e-6,
        s"$name: query ${out(name)} vs permutation $brute")
    }
  }

  test("efficiency: phis sum to v(full) - v(empty)") {
    val full = bits.map(_._2).sum
    assert(math.abs(out.values.sum - (v(full) - 0.0)) < 5e-6)
  }
}
