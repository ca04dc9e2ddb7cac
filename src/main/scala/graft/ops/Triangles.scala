package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting and local clustering coefficient over an
  * edge list — the graph-cohesion signal next to the rankings
  * (X66/X69) and communities (X73): link-farm/spam domains show
  * near-clique neighbourhoods (high clustering), organic hubs don't
  * (Becchetti et al. 2008 use exactly this for web-spam detection).
  *
  * The graph is undirected and simple: distinct canonical (min, max)
  * pairs, self-loops dropped. Triangles are enumerated with the
  * DEGREE-ORDERED ORIENTATION (the standard distributed-scale device,
  * Suri & Vassilvitskii 2011's MapReduce form): orient every edge from
  * its (degree, id)-smaller endpoint to the larger, making wedge
  * enumeration O(Σ outdeg²) with outdeg bounded by O(√E) instead of
  * the unbounded in-degree of hubs — a star's 10⁶-neighbour hub
  * generates ZERO wedges because all its edges point inward. Each
  * triangle {x,y,z} is found exactly once, at its orientation apex.
  * All shuffles carry fixed-width (long, long) rows.
  */
object Triangles {

  /** @return one row per node of the INPUT graph — including nodes
    *   whose only incident edges are self-loops, which the simple
    *   graph drops; they emit degree 0 / 0 triangles / null
    *   clustering so the node universe agrees with the other graph
    *   ops ([[Communities.labelPropagation]] retains them) —
    *   (v, degree, n_triangles, clustering) where clustering =
    *   2T / (deg·(deg−1)), null for degree < 2. */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e0.select(col("src").as("v"))
      .union(e0.select(col("dst").as("v"))).distinct()
    val und = e0.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val degSimple = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val deg = nodes.join(degSimple, Seq("v"), "left")
      .select(col("v"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint(true)
    // degree-ordered orientation: from the (deg, id)-smaller endpoint
    val dd = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val dir = dd.select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("from"), col("b").as("to")))
          .otherwise(struct(col("b").as("from"), col("a").as("to")))
          .as("e"))
      .select(col("e.from").as("from"), col("e.to").as("to"))
      .localCheckpoint(true)
    // wedges at the apex: unordered pairs of out-neighbours
    val e1 = dir.select(col("from").as("u"), col("to").as("v"))
    val e2 = dir.select(col("from").as("u"), col("to").as("w"))
    val wedges = e1.join(e2, "u").filter(col("v") < col("w"))
    // close the wedge through the canonical undirected edge
    val tri = wedges.join(und,
      least(col("v"), col("w")) === col("a") &&
        greatest(col("v"), col("w")) === col("b"))
      .select(col("u"), col("v"), col("w"))
    val tn = tri.select(explode(array(col("u"), col("v"), col("w")))
        .as("v"))
      .groupBy("v").agg(count(lit(1)).as("t"))
    deg.join(tn, Seq("v"), "left")
      .select(col("v"), col("deg").as("degree"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        ((coalesce(col("t"), lit(0L)) * 2).cast("double") /
          nullif(col("deg") * (col("deg") - 1), lit(0L)))
          .as("clustering"))
  }
}
