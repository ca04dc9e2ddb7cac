package graft.ops

/** Process-local memo for DETERMINISTIC, driver-sized training
  * artifacts (VERDICT r16 #8 — per-family shared training: the ANN
  * eval family re-trained the same IVF centroids / PQ codebooks /
  * OPQ permutation once per query row; every one of those fits is a
  * pure function of (sf dir, fit parameters) — pinned samples, pinned
  * iteration counts, deterministic tie-breaks — so recomputing them
  * per row buys zero information and costs the bench wall real
  * minutes).
  *
  * Contract: values MUST be (a) deterministic for their key — caching
  * is then observationally invisible, every query's result is
  * bit-identical with or without it (the DuckDB oracle re-derives the
  * same fits from first principles either way); and (b) bounded
  * driver metadata (centroid arrays, codebooks, permutations) — NEVER
  * DataFrames, whose lifecycle the cache must not own. Keys embed the
  * data directory, so concurrent SFs in one JVM don't collide.
  *
  * This is the in-memory sibling of the committed-artifact pattern
  * (AnnIndex/AnnGraph manifests): those persist corpus-sized state
  * across processes; this holds driver-sized state within one. At
  * 100 TB the production form IS the manifest; the memo exists so an
  * eval SESSION (bench, verify — many queries, one JVM) prices
  * training once, reported separately, and serving per row. */
object FitCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Compute-once by key. `f` may run Spark jobs; the result must be
    * a deterministic driver-sized value. */
  def memo[T <: AnyRef](key: String)(f: => T): T =
    cache.computeIfAbsent(key, _ => f).asInstanceOf[T]

  /** Test hook: drop everything (determinism specs re-fit). */
  def clear(): Unit = cache.clear()
}
