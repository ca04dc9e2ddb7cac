package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ShingleFunctions

/** Prefix-filtered exact set-similarity join (X134 — PPJoin-lite,
  * Chaudhuri et al. 2006 / Xiao et al. 2008): ALL pairs with Jaccard ≥
  * τ over word-k-shingle sets, WITHOUT the all-pairs product.
  *
  * The pruning theorem: order every set by one GLOBAL token order
  * (rarest-first — ascending document frequency, key tie-break); two
  * sets can only reach Jaccard ≥ τ if their PREFIXES — the first
  * |A| − ⌈τ·|A|⌉ + 1 tokens — share at least one token. So candidate
  * generation is an EQUI-join on exploded prefix tokens (rarest tokens
  * join narrowest — df-ascending prefixes are exactly the
  * low-fan-out end of the index), and only candidates pay the exact
  * verification. Lossless by construction; the q_setjoin_prefix oracle
  * PROVES it per run by computing the naive all-pairs ground truth and
  * hash-comparing.
  *
  * Scale shape: shingle df is one keyed aggregate; prefix explosion
  * emits O(Σ prefix) rows (≈ (1−τ)·corpus tokens); the candidate join
  * is key-partitioned; verification joins fixed candidate ids back to
  * the set arrays (two id-keyed joins) and intersects in-memory per
  * pair. ⌈τ·n⌉ is exact integer arithmetic (τ = 3/5 → (3n+4)/5) — no
  * float in the pruning decision.
  */
object SetJoin {

  /** Pairs (id_a < id_b, inter, size_a, size_b, jaccard) with
    * jaccard ≥ tauNum/tauDen over distinct word-k-shingle md5 keys.
    * τ is carried as an exact integer fraction so the prefix length
    * ⌈τ·n⌉ = (tauNum·n + tauDen − 1) / tauDen never touches a float. */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, tauNum: Int = 3, tauDen: Int = 5): DataFrame =
    // r20: widen the raw docs before the md5-shingle projection — the
    // eval corpus is one parquet split and this heavy per-doc kernel
    // ran serial (Skew.widen no-ops at corpus scale)
    prefixJaccardPairsFromSets(
      Skew.widen(docs).select(col(idCol).as("id"),
        ShingleFunctions.md5ShingleKeys(col(textCol), shingleK).as("sh")),
      tauNum, tauDen)

  /** [[prefixJaccardPairs]] over an ALREADY-shingled frame `(id, sh:
    * array<long>)` of DISTINCT per-doc keys — the shared-shingle-pass
    * entry point (q_lsh_dedup_eval feeds one localCheckpoint'ed
    * shingle frame to this and to the MinHash pipeline). The key
    * function only has to be injective on shingles: the prefix-filter
    * theorem, the df-rarest global order, and the exact Jaccard all
    * operate on the sets themselves, so the verified pair set is
    * keying-independent (the internal candidate pruning order may
    * differ — lossless either way). */
  def prefixJaccardPairsFromSets(sets: DataFrame, tauNum: Int = 3,
      tauDen: Int = 5): DataFrame = {
    val ex = sets.select(col("id"), explode(col("sh")).as("t"))
    val df = ex.groupBy("t").agg(count(lit(1)).as("df"))
    // global rarest-first order: re-collect each set sorted by
    // (df, key) — struct sort is field-lexicographic
    val ordered = ex.join(df, "t")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("t"))))
        .as("ord"))
      .select(col("id"),
        transform(col("ord"), x => x.getField("t")).as("sh"),
        size(col("ord")).as("n"))
      // consumed 3x (prefix explode + both verify sides); the lineage
      // above it is the explode + df join + collect_list/sort — the
      // exact side's whole cost — so materialize once (r13 sf1 stage
      // decomposition)
      .localCheckpoint(true)
    // prefix length n − ⌈τ·n⌉ + 1, exact integers
    val plen = col("n") -
      floor((lit(tauNum) * col("n") + (tauDen - 1)) / tauDen).cast("int") + 1
    val prefixes = ordered
      .filter(col("n") > 0)
      .select(col("id"), explode(slice(col("sh"), lit(1), plen)).as("t"))
    // r20: the per-pair set-intersection verify below is the join's
    // one compute-dense stage, and its INPUT bytes are tiny (id
    // pairs), so AQE's byte-sized coalescing ran it as ~1 task —
    // pin its width to the cluster's cores (Skew.widenExec)
    val cands = Skew.widenExec(prefixes.as("a").join(prefixes.as("b"),
        col("a.t") === col("b.t") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct())
    // exact verification for candidates only: two id-keyed joins pull
    // the full sets; intersection is per-pair in-memory
    val withSets = cands
      .join(ordered.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("n").as("size_a")), "id_a")
      .join(ordered.select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("n").as("size_b")), "id_b")
    withSets
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= lit(tauNum.toDouble / tauDen))
      .select(col("id_a"), col("id_b"), col("inter"),
        col("size_a").cast("long").as("size_a"),
        col("size_b").cast("long").as("size_b"), col("jaccard"))
  }
}
