package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Final wide-table assembly (SURVEY §3 E3, ref `:846-856`, `:1079-1089`).
  *
  * The reference joins the lunch and breakfast claim files on
  * (school name, claim date, zero-padded district id), computing the
  * padding INSIDE the join predicate. Here the normalized key is
  * precomputed as a column so Catalyst plans a plain equi-join
  * (sort-merge or broadcast-hash) and the padded key is computed once
  * per row, not once per comparison (SURVEY §4).
  */
object Assemble {

  /** Equi-join two claim files on the reference's three-part key.
    * Column names are the *clean* (post-dictionary) names. At 100 TB:
    * both sides shuffle-partition on the composite key once; AQE
    * handles skew (many rows per school-date only under data errors).
    */
  def joinClaims(lunch: DataFrame, breakfast: DataFrame,
      schoolCol: String = "school name",
      dateCol: String = "claim date",
      districtCol: String = "district id",
      joinType: String = "inner"): DataFrame = {
    val l = lunch.withColumn("__jk_district",
      Derive.zeroPad(col(s"`$districtCol`"), 6))
    val b0 = breakfast.withColumn("__jk_district",
      Derive.zeroPad(col(s"`$districtCol`"), 6))
    // Disambiguate overlapping non-key columns: suffix the breakfast side
    // (the reference's SELECT a.*, b.* keeps both copies; parquet needs
    // unique names).
    val overlap = (l.columns.toSet intersect b0.columns.toSet) --
      Set(schoolCol, dateCol, "__jk_district")
    val b = overlap.foldLeft(b0)((df, c) =>
      df.withColumnRenamed(c, s"${c}_b"))
    l.join(b, Seq(schoolCol, dateCol, "__jk_district"), joinType)
      .drop("__jk_district")
  }

  /** Final DISTINCT wide table (ref `:1079`). */
  def finalTable(joined: DataFrame): DataFrame = joined.distinct()
}
