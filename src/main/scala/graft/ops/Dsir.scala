package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (public recipe: Xie et
  * al. 2023, "Data Selection for Language Models via Importance
  * Resampling" — the DSIR device): fit hashed bag-of-ngrams feature
  * distributions for a small TARGET domain and for the rest of the raw
  * corpus, weight every document by its per-bucket log likelihood
  * ratio λ(x) = Σ_f [ln p̂_tgt(b(f)) − ln p̂_raw(b(f))], and keep a
  * document with probability min(1, e^{λ(x)−τ}) decided by a
  * DETERMINISTIC md5-derived uniform — hash-gated acceptance, so the
  * "random" resample is reproducible, shard-stable, and replayable in
  * ANSI SQL (no RNG state, no seed plumbing).
  *
  * Scale contract (100 TB): the fit is ONE fixed-width shuffle
  * (per-bucket conditional sums — ≤ `buckets` driver rows, the same
  * bound as the NB trainer in [[Scoring]]); scoring + acceptance are
  * a shuffle-free scan through the fused `HashedBagStats` kernel with
  * the λ table inlined as a literal. No global rank, no window, no
  * join — every keep/drop decision is per-row, so the operator is
  * embarrassingly parallel at any corpus size (the reason DSIR-style
  * selection is practical where Gumbel top-k global sampling is not).
  */
object Dsir {

  /** Per-bucket log-likelihood-ratio table (driver metadata, ≤
    * `buckets` entries) with the bucket count it was hashed under. */
  final case class DsirModel(lambda: Map[Long, Double], buckets: Int)

  /** Fit λ from one conditional-count pass: target vs rest feature
    * totals per hash bucket, add-1 smoothed over the OCCUPIED bucket
    * set (the same smoothing universe the NB trainer uses, so both
    * engines derive identical tables from identical counts). */
  def fit(docs: DataFrame, textCol: Column, isTarget: Column,
      buckets: Int): DsirModel = {
    val cc = docs.select(isTarget.as("t"),
        explode(graft.functions.ScoringFunctions
          .hashedBagBuckets(textCol, buckets, "qc:")).as("b"))
      .select(col("t"), col("b").cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("t"), 1L).otherwise(0L)).as("ct"),
           sum(when(!col("t"), 1L).otherwise(0L)).as("cr"))
      .collect()
    val nt = cc.map(_.getLong(1)).sum.toDouble
    val nr = cc.map(_.getLong(2)).sum.toDouble
    require(nt > 0 && nr > 0,
      s"Dsir.fit: target and raw must both contribute features " +
        s"(target=$nt, raw=$nr) — λ is undefined otherwise")
    val nb = cc.length.toDouble
    val lambda = cc.map { r =>
      r.getLong(0) -> (math.log((r.getLong(1) + 1.0) / (nt + nb)) -
        math.log((r.getLong(2) + 1.0) / (nr + nb)))
    }.toMap
    DsirModel(lambda, buckets)
  }

  /** [λ(x), featureCount] as one fused kernel walk (see
    * [[Scoring.inlineStats]] — λ is a margin under weight table λ). */
  def logWeightStats(textCol: Column, m: DsirModel): Column =
    Scoring.inlineStats(textCol, m.buckets, m.lambda)

  /** Deterministic uniform in (0,1): the first 52 bits of md5(salt‖id)
    * as integer h, mapped to (2h+1)/2⁵³ — midpoints of the 2⁵² dyadic
    * cells. Everything up to the final divide is INTEGER arithmetic
    * (2h+1 < 2⁵³ is exactly representable; dividing by a power of two
    * is exact), so the uniform is bit-identical in any engine with md5
    * — the property that makes acceptance replayable. (An earlier
    * `h + 0.5` form was NOT portable: a SQL `0.5` literal is DECIMAL
    * in DuckDB, and decimal-lane addition rounds differently.) */
  def hashUniform(id: Column, salt: String): Column =
    (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 13),
      16, 10).cast("long") * 2 + 1).cast("double") / 9007199254740992.0
}
