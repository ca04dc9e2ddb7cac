package graft.ops

import graft.functions.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank power iteration over an edge list — the domain-graph
  * authority signal crawl curation ranks sources by (the public
  * Common Crawl ranking recipe: harmonic centrality / PageRank over
  * the domain link graph; Page et al. 1999).
  *
  * Shape per round (the honest 100 TB shape, not a driver loop): join
  * ranks to edges on src (shuffle keyed by src), aggregate
  * contributions by dst (second keyed shuffle), left-join back to the
  * node list so sinks keep receiving teleport mass. Ranks and degrees
  * are fixed-width (node, double) rows — the corpus never re-shuffles
  * — and the whole `iters`-round computation is ONE lazy plan: the
  * scalar aggregates (node count, dangling mass) ride along as 1-row
  * cross joins that Spark broadcasts, so there are no driver-side
  * actions between rounds.
  *
  * Float discipline: each round's rank is qround(6)-canonicalized
  * (contribution sums are fold-order-sensitive aggregates — the
  * standard discipline), so round t+1 starts from bit-identical ranks
  * on any engine; the dangling mass is qround'd the same way.
  * Teleport/damping constants enter as the EXACT doubles the caller's
  * oracle interpolates (1.0 − damping is computed in binary, not
  * re-parsed from a decimal literal).
  */
object PageRank {

  /** @return one row per node: (v, pr) after `iters` damped rounds
    *   from the uniform start 1/N. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e0.select(col("src").as("v"))
      .union(e0.select(col("dst").as("v"))).distinct()
    val deg = e0.groupBy(col("src").as("v"))
      .agg(count(lit(1)).as("deg"))
    val e = e0.join(deg.select(col("v").as("src"), col("deg")), "src")
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    var r = nodes.crossJoin(nn)
      .select(col("v"), (lit(1.0) / col("n")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, e("src") === r("v"))
        .select(e("dst").as("v"),
          (col("pr") / col("deg").cast("double")).as("c"))
        .groupBy("v").agg(sum("c").as("c"))
      val dangling = r.join(deg, Seq("v"), "left_anti")
        .agg(Num.qround(coalesce(sum("pr"), lit(0.0)), 6).as("dm"))
      r = nodes.join(contrib, Seq("v"), "left")
        .crossJoin(nn).crossJoin(dangling)
        .select(col("v"), Num.qround(
          lit(1.0 - damping) / col("n") + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dm") / col("n")),
          6).as("pr"))
    }
    r
  }
}
