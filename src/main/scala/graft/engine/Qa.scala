package graft.engine

import org.apache.spark.sql.DataFrame

/** The reference's QA harness (SURVEY §2g SO1 + §5, ref `:1094-1127`):
  * golden-output agreement measured as |produced ∩ expected| against
  * the two row counts, with set (deduplicating) INTERSECT semantics —
  * Spark's `intersect` matches T-SQL's exactly.
  */
object Qa {
  final case class Agreement(countA: Long, countB: Long, countCommon: Long) {
    /** matching rows / produced rows (PDF p.25 agreement metric). */
    def ratio: Double =
      if (countA == 0) 0.0 else countCommon.toDouble / countA
  }

  /** Compare two tables the reference way (ref `:1116-1126`). Columns
    * are aligned by position on the right side, as INTERSECT does. */
  def agreement(a: DataFrame, b: DataFrame): Agreement = {
    val bAligned = b.toDF(a.columns: _*)
    Agreement(a.count(), b.count(), a.intersect(bAligned).count())
  }
}
