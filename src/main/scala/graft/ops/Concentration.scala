package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration statistics over grouped magnitudes (X111).
  *
  * Gini WITHOUT ranking individuals: members compress to
  * (level, multiplicity) rows first — one keyed aggregate — and the
  * rank-weighted sum Σ rank·x uses the closed form for a tied block
  * whose m members occupy ranks R_prev+1 … R_prev+m:
  *
  *   Σ ranks·x over the block = x·(m·R_prev + m(m+1)/2)
  *
  * all in exact longs (the halving is a shiftright — m(m+1) is always
  * even — never a float divide). The only window runs over the
  * DISTINCT-LEVEL table ordered by level, whose cardinality is the
  * number of distinct magnitudes — collapsed by orders of magnitude
  * from the member universe (the X75 rank-statistic shape). Final
  * Gini = 2Σrx/(nΣx) − (n+1)/n is element-wise off exact integers.
  */
object Concentration {

  /** Per-group Gini of `valueCol` (positive integral magnitudes, one
    * row per member). Returns (group, n_members, total, gini). */
  def giniByGroup(members: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = members.groupBy(col(groupCol), col(valueCol).as("__lvl"))
      .agg(count(lit(1)).as("__m"))
    val w = Window.partitionBy(groupCol).orderBy("__lvl")
      .rowsBetween(Window.unboundedPreceding, -1)
    v.withColumn("__rprev", coalesce(sum("__m").over(w), lit(0L)))
      .groupBy(groupCol)
      .agg(sum("__m").as("n_members"),
        sum(col("__lvl") * col("__m")).as("total"),
        sum(col("__lvl") * (col("__m") * col("__rprev") +
          shiftright(col("__m") * (col("__m") + 1), 1))).as("__srx"))
      .select(col(groupCol), col("n_members"), col("total"),
        ((lit(2.0) * col("__srx").cast("double")) /
          (col("n_members").cast("double") * col("total").cast("double"))
         - (col("n_members").cast("double") + lit(1.0)) /
           col("n_members").cast("double")).as("gini"))
  }
}
