package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals (global prefix sums) without the
  * single-partition global window.
  *
  * `SUM(v) OVER (ORDER BY k)` is the textbook scale-killer: Spark plans
  * a `WindowExec` with an empty partition spec, which funnels the whole
  * dataset through ONE task. The standard fix is the two-pass form —
  * split the global order into contiguous ranges, cumsum each range
  * independently, then shift every range by the total of all ranges
  * before it. Here:
  *
  *  1. sample quantile boundaries of the leading order key
  *     (`approxQuantile` — one bounded stats pass), inline them as
  *     literals in a CASE bucket expression, so bucket assignment is a
  *     deterministic per-row expression and every row with the same key
  *     lands in the same bucket;
  *  2. cumsum WITHIN buckets via `Window.partitionBy(bucket)` — a
  *     partitioned window, parallel across buckets;
  *  3. per-bucket totals are one aggregate whose result is
  *     bucket-count-sized (driver metadata by construction); their
  *     exclusive prefix sums ride back into the plan as a map literal.
  *
  * The result is bit-identical to the one-window form (same total
  * order, same integer/double arithmetic); only the plan shape changes.
  * Degenerate key distributions (few distinct values) collapse
  * neighbouring buckets — correctness is unaffected, parallelism
  * degrades gracefully to the number of distinct leading keys.
  */
object PrefixSum {

  /** Running total of `valueCol` over the order
    * (`scoreCol` DESC, `tieCol` ASC) — the "best rows first"
    * order of budgeted corpus selection (X52). Emits `out` as the
    * inclusive cumulative sum; no partition-less window in the plan.
    *
    * `valueCol` must be an integral type (byte/short/int/long): the
    * per-bucket totals are read back as exact longs, and the
    * "bit-identical to the one-window form" guarantee only holds for
    * integer addition (float sums are fold-order-sensitive, so a
    * two-pass float cumsum would NOT reproduce the single-window
    * result bit-for-bit). Enforced up front rather than failing with
    * a ClassCastException mid-collect.
    *
    * @param buckets target parallelism of the cumsum stage; the
    *                boundary/offset tables are `buckets`-sized driver
    *                metadata by construction.
    */
  def runningTotalDesc(df: DataFrame, valueCol: String, scoreCol: String,
      tieCol: String, out: String, buckets: Int = 32): DataFrame = {
    val vt = df.schema(valueCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(vt.typeName),
      s"runningTotalDesc requires an integral valueCol (got $vt): " +
        "float prefix sums are fold-order-sensitive and would not be " +
        "bit-identical to the single-window form")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // pass 0 (bounded stats): sampled boundaries of the leading key
    // (buckets <= 1 -> no boundaries -> everything in bucket 0)
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(scoreCol, probs, 0.001)
        .distinct.sorted.reverse // descending, like the order
    // bucket = #boundaries strictly above this score → bucket 0 holds
    // the top scores; equal scores always share a bucket, so buckets
    // are contiguous ranges of the DESC order
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(scoreCol) < b, 1).otherwise(0)
    }
    val withB = df.withColumn("__psb", bucket)
    // pass 1 (bounded agg): per-bucket totals → exclusive prefix
    // offsets, computed on the driver over ≤`buckets` rows
    val totals = withB.groupBy("__psb")
      .agg(sum(col(valueCol)).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = totals
      .scanLeft((0, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => b -> acc }
      .toMap
    // pass 2: partitioned cumsum + literal offset
    val w = Window.partitionBy("__psb")
      .orderBy(col(scoreCol).desc, col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .withColumn(out,
        sum(col(valueCol)).over(w) +
          coalesce(element_at(typedLit(offsets), col("__psb")), lit(0L)))
      .drop("__psb")
  }

  /** Ascending running totals of SEVERAL integral value columns over
    * the total order (`distinctScoreCol` ASC): the ECDF building block
    * (X113 — a two-sample KS needs BOTH samples' cumulative counts over
    * the SAME merged value order, and computing them in one two-pass
    * sweep halves the shuffles vs two independent cumsums). Same device
    * as [[runningTotalDesc]]: sampled boundary buckets → partitioned
    * cumsum per column → per-bucket totals (a `buckets`-sized driver
    * collect) ride back as exclusive-prefix literal maps. Bit-identical
    * to the one-window form (integer addition only — enforced).
    *
    * PRECONDITION (doc-visible in the param name — ADVICE r11):
    * `distinctScoreCol` must be UNIQUE per row. It alone is the total
    * order, and a ROWS frame over a tied order is nondeterministic:
    * tied keys yield unspecified cumulative values AT the tied rows
    * (the running total after a tied block is still exact — addition
    * commutes — but how it distributes within the block is not;
    * pinned in PrefixSumSpec "tied keys"). Callers feed
    * grouped/distinct-value tables, where uniqueness holds by
    * construction — and it is now ENFORCED at runtime (VERDICT r12
    * #3): the per-bucket totals aggregate (which runs anyway)
    * piggybacks an exact `count(*) vs count(distinct key)` probe per
    * bucket — equal keys always share a bucket, so per-bucket
    * distinctness is global distinctness — and a tied key fails fast
    * with the offending bucket instead of silently breaking the
    * bit-identity claim. Zero extra Spark jobs. */
  def runningTotalsAsc(df: DataFrame, valueCols: Seq[String],
      distinctScoreCol: String, outs: Seq[String],
      buckets: Int = 32): DataFrame = {
    val scoreCol = distinctScoreCol
    require(valueCols.nonEmpty && valueCols.size == outs.size)
    valueCols.foreach { vc =>
      val vt = df.schema(vc).dataType
      require(Seq("byte", "short", "integer", "long").contains(vt.typeName),
        s"runningTotalsAsc requires integral value columns (got $vt for " +
          s"$vc): float prefix sums are fold-order-sensitive")
    }
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(scoreCol, probs, 0.001).distinct.sorted
    // bucket = #boundaries strictly below this score (ascending order)
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(scoreCol) > b, 1).otherwise(0)
    }
    val withB = df.withColumn("__psb", bucket)
    val nv = valueCols.size
    val totalRows = withB.groupBy("__psb")
      .agg(sum(col(valueCols.head)).as("__t0"),
        valueCols.tail.zipWithIndex.map { case (vc, i) =>
          sum(col(vc)).as(s"__t${i + 1}")
        } ++ Seq(count(lit(1)).as("__n"),
          countDistinct(col(scoreCol)).as("__d")): _*)
      .collect()
    totalRows.foreach { r =>
      require(r.getLong(nv + 1) == r.getLong(nv + 2),
        s"runningTotalsAsc: order key '$scoreCol' has tied values " +
          s"(bucket ${r.getInt(0)}: ${r.getLong(nv + 1)} rows, " +
          s"${r.getLong(nv + 2)} distinct keys) — a ROWS frame over a " +
          "tied order is nondeterministic at the tied rows; feed a " +
          "unique key (see PrefixSumSpec \"tied keys\")")
    }
    val totals = totalRows
      .map(r => r.getInt(0) -> valueCols.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    val w = Window.partitionBy("__psb").orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = valueCols.zip(outs).zipWithIndex
      .foldLeft(withB) { case (acc, ((vc, o), i)) =>
        val offsets: Map[Int, Long] = totals
          .scanLeft((0, 0L)) { case ((_, a), (b, t)) => (b, a + t(i)) }
          .sliding(2).collect { case Array((_, a), (b, _)) => b -> a }
          .toMap
        acc.withColumn(o,
          sum(col(vc)).over(w) +
            coalesce(element_at(typedLit(offsets), col("__psb")), lit(0L)))
      }
    out.drop("__psb")
  }

  /** EXCLUSIVE running MAX of an integral column over the total order
    * (`orderCol` DESC, unique) — `out` = max of `valueCol` over all
    * rows whose order key is STRICTLY GREATER; Long.MinValue at the
    * top row. The skyline/Pareto building block (X260: a point is on
    * the 2-D frontier iff its y exceeds the max y of every strictly
    * larger x). Same two-pass device as [[runningMaxAsc]], with the
    * window frame ending at the PREVIOUS row — which is only
    * deterministic over a unique order, so `orderCol` uniqueness is
    * enforced by the per-bucket totals probe exactly like
    * [[runningTotalsAsc]] (equal keys always share a bucket). */
  def runningMaxExclusiveDesc(df: DataFrame, valueCol: String,
      orderCol: String, out: String, buckets: Int = 32): DataFrame = {
    val vt = df.schema(valueCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(vt.typeName),
      s"runningMaxExclusiveDesc requires an integral valueCol (got $vt)")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.001)
        .distinct.sorted.reverse // descending, like the order
    // bucket 0 holds the largest keys; equal keys share a bucket
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) < b, 1).otherwise(0)
    }
    val withB = df.withColumn("__psb", bucket)
    val probeRows = withB.groupBy("__psb")
      .agg(max(col(valueCol)).as("__m"), count(lit(1)).as("__n"),
        countDistinct(col(orderCol)).as("__d"))
      .collect()
    probeRows.foreach { r =>
      require(r.getLong(2) == r.getLong(3),
        s"runningMaxExclusiveDesc: order key '$orderCol' has tied " +
          s"values (bucket ${r.getInt(0)}: ${r.getLong(2)} rows, " +
          s"${r.getLong(3)} distinct keys) — an exclusive frame over " +
          "a tied order is nondeterministic; feed a distinct-key table")
    }
    val maxima = probeRows.map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix max of PRIOR buckets (prior = larger keys)
    val offsets: Map[Int, Long] = maxima
      .scanLeft((0, Long.MinValue)) { case ((_, acc), (b, m)) =>
        (b, math.max(acc, m))
      }
      .sliding(2).collect { case Array((_, acc), (b, _)) => b -> acc }
      .toMap
    val w = Window.partitionBy("__psb").orderBy(col(orderCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB
      .withColumn(out,
        greatest(
          coalesce(max(col(valueCol)).over(w), lit(Long.MinValue)),
          coalesce(element_at(typedLit(offsets), col("__psb")),
            lit(Long.MinValue))))
      .drop("__psb")
  }

  /** Ascending running MAX of an integral column over the total order
    * (`orderCol` ASC, unique) — the out-of-order-depth building block
    * (X117: lateness = running max of event time over arrival order,
    * minus own event time). Same two-pass device; max is
    * order-insensitive, so the bucketed form is trivially identical
    * to the one-window form. Per-bucket maxima ride back as an
    * exclusive prefix-max literal map; buckets before the first row
    * fall back to Long.MinValue (no prior row → the row's own value
    * wins, exactly like the single-window form's first row). */
  def runningMaxAsc(df: DataFrame, valueCol: String, orderCol: String,
      out: String, buckets: Int = 32): DataFrame = {
    val vt = df.schema(valueCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(vt.typeName),
      s"runningMaxAsc requires an integral valueCol (got $vt)")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) > b, 1).otherwise(0)
    }
    val withB = df.withColumn("__psb", bucket)
    val maxima = withB.groupBy("__psb")
      .agg(max(col(valueCol)).as("__m"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix max per bucket
    val offsets: Map[Int, Long] = maxima
      .scanLeft((0, Long.MinValue)) { case ((_, acc), (b, m)) =>
        (b, math.max(acc, m))
      }
      .sliding(2).collect { case Array((_, acc), (b, _)) => b -> acc }
      .toMap
    val w = Window.partitionBy("__psb").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .withColumn(out,
        greatest(max(col(valueCol)).over(w),
          coalesce(element_at(typedLit(offsets), col("__psb")),
            lit(Long.MinValue))))
      .drop("__psb")
  }
}
