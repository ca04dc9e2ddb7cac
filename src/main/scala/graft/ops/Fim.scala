package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) training-example transform (public recipe:
  * Bavarian et al. 2022, "Efficient Training of Language Models to
  * Fill in the Middle"): split each document at two random character
  * cuts into (prefix, middle, suffix) and emit the reordered
  * sentinel-tagged sequences — PSM `<PRE>p<SUF>s<MID>m` and the joined
  * SPM `<PRE><SUF>s<MID>p·m` — applying the transform to a fixed
  * fraction of documents and passing the rest through untouched.
  *
  * Determinism: both cut points and the apply/skip gate derive from
  * md5 of the document id — the cuts via the exact (2h+1)/2⁵³ uniform
  * ([[Dsir.hashUniform]]; floor(u·(n+1)) is one IEEE multiply + floor,
  * bit-identical cross-engine), the gate via an INTEGER 32-bit bucket
  * compare ([[Sampling.hashBucket]] — no float literal near the
  * boundary, the decimal-lane-safe form). So the transform is a pure
  * function of (id, text): reproducible across cluster sizes,
  * re-runs, and engines, which is what lets a SQL oracle rebuild every
  * output byte.
  *
  * At 100 TB this is a shuffle-free scan: three md5 calls and
  * substring arithmetic per row, no state, no window, no join.
  */
object Fim {

  final val Pre = "<PRE>"
  final val Suf = "<SUF>"
  final val Mid = "<MID>"

  /** Adds (fim_applied, lo, hi, psm, spm). `rate` is quantized to the
    * 2³² hash-bucket grid like [[Sampling.hashSample]]. */
  def transform(df: DataFrame, idCol: String, textCol: String,
      rate: Double, salt: String): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0,1]")
    val id = col(idCol)
    val text = col(textCol)
    val n = length(text).cast("long")
    val cut = (u: Column) =>
      floor(u * (n + 1L).cast("double")).cast("long")
    val a = cut(Dsir.hashUniform(id, salt + "a:"))
    val b = cut(Dsir.hashUniform(id, salt + "b:"))
    val gate = Sampling.hashBucket(id, salt + "g:") <
      lit((rate * 4294967296L).toLong)
    val lo = least(a, b)
    val hi = greatest(a, b)
    val prefix = text.substr(lit(1L), lo)
    val middle = text.substr(lo + 1L, hi - lo)
    val suffix = text.substr(hi + 1L, n - hi)
    df.withColumn("fim_applied", gate)
      .withColumn("lo", when(gate, lo).otherwise(0L))
      .withColumn("hi", when(gate, hi).otherwise(0L))
      .withColumn("psm", when(gate,
          concat(lit(Pre), prefix, lit(Suf), suffix, lit(Mid), middle))
        .otherwise(text))
      .withColumn("spm", when(gate,
          concat(lit(Pre), lit(Suf), suffix, lit(Mid), prefix, middle))
        .otherwise(text))
  }
}
