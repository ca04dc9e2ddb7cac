package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Round-13 spatial operator (SURVEY §2l X217): grid-bucketed
  * proximity self-join — the geohash-style device that turns "all
  * point pairs within radius r" from an all-pairs product into an
  * equi-join on neighboring grid cells.
  */
object GeoQueries {

  /** Grid-bucketed spatial nearest-pairs join (X217 — the standard
    * distributed spatial join: bucket points into r-sized grid cells,
    * expand ONE side to its 3×3 cell neighborhood, equi-join on the
    * cell key, then apply the exact radius predicate as a residual —
    * candidates are bounded by cell occupancy, never |n|², the same
    * capBuckets shape as the X2 LSH bands). Points are deterministic
    * md5-derived coordinates on a 10°×10° region (the X12 hash
    * device — exact dyadic rationals, so the cell keys and the
    * radius predicate are EXACT integer/rational lanes on both
    * engines; no trig in any join or filter path). The one
    * transcendental lane is the REPORTED haversine km (identical
    * expression tree, qround(6)); output = the 200 nearest pairs
    * under the total order (km, a, b).
    *
    * 100× check: cell width = radius ⇒ occupancy scales with point
    * density, the neighbor expansion is a constant 9×, and the final
    * top-200 is a TakeOrderedAndProject (per-partition heaps, no
    * global sort). */
  val geoPairs = QueryDef(
    "q_geo_pairs", {
      def coord(salt: String) =
        s"""(CAST(CAST('0x' || substring(md5('$salt' ||
             CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
             * 10.0 / 4294967296.0)"""
      val hdlat = "sin((((alat - blat) * pi()) / 180.0) / 2.0)"
      val hdlon = "sin((((alon - blon) * pi()) / 180.0) / 2.0)"
      val hterm = s"""($hdlat * $hdlat +
        cos((alat * pi()) / 180.0) * cos((blat * pi()) / 180.0) *
        $hdlon * $hdlon)"""
      Some(s"""WITH pts AS (
               SELECT c_custkey AS id,
                      ${coord("geo-lat:")} AS lat,
                      ${coord("geo-lon:")} AS lon
               FROM customer),
             cells AS (
               SELECT id, lat, lon,
                      CAST(FLOOR(lon) AS BIGINT) AS cx,
                      CAST(FLOOR(lat) AS BIGINT) AS cy
               FROM pts),
             offs AS (
               SELECT dx.o AS dx, dy.o AS dy
               FROM (VALUES (-1), (0), (1)) dx(o),
                    (VALUES (-1), (0), (1)) dy(o)),
             aexp AS (
               SELECT c.id, c.lat, c.lon,
                      c.cx + o.dx AS kx, c.cy + o.dy AS ky
               FROM cells c CROSS JOIN offs o),
             cand AS (
               SELECT a.id AS custkey_a, b.id AS custkey_b,
                      a.lat AS alat, a.lon AS alon,
                      b.lat AS blat, b.lon AS blon
               FROM aexp a JOIN cells b
                 ON a.kx = b.cx AND a.ky = b.cy AND a.id < b.id
               WHERE (a.lat - b.lat) * (a.lat - b.lat) +
                     (a.lon - b.lon) * (a.lon - b.lon) < 0.25)
             SELECT custkey_a, custkey_b,
                    ${Num.qroundSql(
                      s"2.0 * 6371.0 * asin(sqrt($hterm))", 6)} AS km
             FROM cand
             ORDER BY km ASC, custkey_a ASC, custkey_b ASC
             LIMIT 200""")
    },
    (s, d) => {
      def coord(saltCol: String) =
        Sampling.hashBucket(col("c_custkey"), saltCol).cast("double") *
          10.0 / 4294967296.0
      val pts = Tables.customer(s, d).select(
          col("c_custkey").as("id"),
          coord("geo-lat:").as("lat"), coord("geo-lon:").as("lon"))
        .withColumn("cx", floor(col("lon")).cast("long"))
        .withColumn("cy", floor(col("lat")).cast("long"))
        .localCheckpoint(true) // both join sides read this frame
      val offs = Seq(-1, 0, 1).flatMap(dx =>
        Seq(-1, 0, 1).map(dy => (dx, dy)))
      val offArr = array(offs.map { case (dx, dy) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)
      val aExp = pts.select(col("id").as("custkey_a"),
          col("lat").as("a_lat"), col("lon").as("a_lon"),
          col("cx"), col("cy"), explode(offArr).as("o"))
        .select(col("custkey_a"), col("a_lat"), col("a_lon"),
          (col("cx") + col("o.dx")).as("kx"),
          (col("cy") + col("o.dy")).as("ky"))
      val b = pts.select(col("id").as("custkey_b"),
        col("lat").as("b_lat"), col("lon").as("b_lon"),
        col("cx").as("kx"), col("cy").as("ky"))
      val dlat = col("a_lat") - col("b_lat")
      val dlon = col("a_lon") - col("b_lon")
      val pi = lit(math.Pi)
      val hdlat = sin(((dlat * pi) / 180.0) / 2.0)
      val hdlon = sin(((dlon * pi) / 180.0) / 2.0)
      val hterm = hdlat * hdlat +
        cos((col("a_lat") * pi) / 180.0) *
        cos((col("b_lat") * pi) / 180.0) * hdlon * hdlon
      aExp.join(b, Seq("kx", "ky"))
        .filter(col("custkey_a") < col("custkey_b") &&
          dlat * dlat + dlon * dlon < 0.25)
        .select(col("custkey_a"), col("custkey_b"),
          Num.qround(lit(2.0) * 6371.0 * asin(sqrt(hterm)), 6).as("km"))
        .orderBy(col("km").asc, col("custkey_a").asc,
          col("custkey_b").asc)
        .limit(200)
    })

  val all: Seq[QueryDef] = Seq(geoPairs)
}
