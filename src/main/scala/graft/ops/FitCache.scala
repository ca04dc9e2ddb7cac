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
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Compute-once by key. `f` may run Spark jobs; the result must be
    * a deterministic driver-sized value.
    *
    * Concurrency (r18 — Verify runs queries in parallel): the
    * compute runs OUTSIDE the map's bin locks, under a per-key
    * monitor. `computeIfAbsent` with a Spark-job-running lambda would
    * hold a hash-bin lock for seconds (stalling unrelated keys that
    * share the bin) and is outright forbidden to re-enter the map —
    * some fits build their inputs from OTHER memoized fits (the OPQ
    * permutation feeds the permuted-PQ frame), which under bin
    * collision is ConcurrentHashMap's "recursive update" error. Two
    * threads racing the same key serialize on its lock and compute
    * once; different keys never block each other. */
  def memo[T <: AnyRef](key: String)(f: => T): T = {
    val hit = cache.get(key)
    if (hit != null) return hit.asInstanceOf[T]
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = cache.get(key)
      if (again != null) again.asInstanceOf[T]
      else {
        val v = f
        cache.put(key, v)
        v
      }
    }
  }

  /** Test hook: drop everything (determinism specs re-fit). */
  def clear(): Unit = { cache.clear(); locks.clear() }
}
