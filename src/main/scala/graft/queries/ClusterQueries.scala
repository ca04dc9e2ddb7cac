package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{ArrayFunctions, Num}
import graft.ops.Lloyd
import org.apache.spark.sql.functions._

/** Round-13 corpus-organization operators (SURVEY §2l X212–X213):
  * full-corpus distributed k-means and greedy max-coverage document
  * selection — the two clustering/selection devices a curation
  * pipeline runs over the WHOLE corpus rather than a driver sample.
  */
object ClusterQueries {

  // DuckDB twins of the double-lane vector math (floats widened to
  // double up front so every element-wise lane is bit-identical).
  private def dotD(a: String, b: String) =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
          i -> $a[i] * $b[i]), (x, y) -> x + y)"""
  private def normD(v: String) = {
    val n = s"sqrt(list_reduce(list_transform($v, x -> x*x), (a,b) -> a+b))"
    s"CASE WHEN $n = 0 THEN $v ELSE list_transform($v, x -> x / $n) END"
  }

  /** One full-corpus Lloyd round in SQL mirroring [[Lloyd.fit]]:
    * first-max assignment (dot DESC, c ASC), per-(cluster, dim)
    * qround(6) means (the aggregated lane — fold order differs, the
    * quantizer pins it), left-fold L2 normalization, empty clusters
    * keep their centroid. */
  private def lloydIterSql(i: Int): String = s"""
asg_$i AS (
  SELECT e.vec_id, e.v, c.c,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY ${dotD("c.cv", "e.v")} DESC, c.c ASC) AS rn
  FROM corpusv e, cents_$i c),
best_$i AS (SELECT vec_id, v, c FROM asg_$i WHERE rn = 1),
m_$i AS (
  SELECT c, t.d,
         FLOOR(SUM(v[t.d]) / COUNT(*) * 1000000 + 0.5) / 1000000 AS m
  FROM best_$i, range(1, 65) t(d) GROUP BY c, t.d),
cm_$i AS (SELECT c, list(m ORDER BY d) AS mv FROM m_$i GROUP BY c),
cents_${i + 1} AS (
  SELECT o.c, CASE WHEN n.mv IS NULL THEN o.cv
              ELSE ${normD("n.mv")} END AS cv
  FROM cents_$i o LEFT JOIN cm_$i n ON n.c = o.c)"""

  /** Distributed full-corpus spherical k-means (X212 — Lloyd 1982 run
    * the way a 1000-executor cluster has to; see [[Lloyd]] for the
    * one-pass-per-round / k·(dim+1)-doubles-to-driver shape). k = 8,
    * 3 pinned rounds, init = the 8 lowest vec_ids normalized. The
    * report is the X89 balance readout computed from THIS fit: per
    * cluster n, mean and min cosine-to-centroid — centroids are unit
    * vectors so cos = dot/|v|, an element-wise lane that hashes raw
    * except the fold-order AVG (qround(6)). Empty clusters emit n = 0
    * (full cluster universe). The oracle replays all 3 rounds from
    * the same init — training included in the hash, the q_ann_ivf
    * discipline. */
  val kmeansLloyd = QueryDef(
    "q_kmeans_lloyd",
    Some(s"""WITH corpusv AS (
             SELECT vec_id,
                    list_transform(embedding, x -> CAST(x AS DOUBLE))
                      AS v
             FROM embeddings),
           inits AS (
             SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                      AS INTEGER) AS c, v
             FROM (SELECT vec_id, v FROM corpusv
                   ORDER BY vec_id LIMIT 8) i0),
           cents_0 AS (SELECT c, ${normD("v")} AS cv FROM inits),
           ${lloydIterSql(0)}, ${lloydIterSql(1)}, ${lloydIterSql(2)},
           fasg AS (
             SELECT e.vec_id, c.c,
                    ${dotD("c.cv", "e.v")} /
                      sqrt(${dotD("e.v", "e.v")}) AS cos,
                    ROW_NUMBER() OVER (PARTITION BY e.vec_id
                      ORDER BY ${dotD("c.cv", "e.v")} DESC, c.c ASC)
                      AS rn
             FROM corpusv e, cents_3 c),
           fbest AS (SELECT vec_id, c, cos FROM fasg WHERE rn = 1),
           rep AS (
             SELECT c, CAST(COUNT(*) AS BIGINT) AS n,
                    ${Num.qroundSql("AVG(cos)", 6)} AS avg_cos,
                    MIN(cos) AS min_cos
             FROM fbest GROUP BY c)
           SELECT u.c, COALESCE(r.n, 0) AS n, r.avg_cos, r.min_cos
           FROM (SELECT CAST(range AS INTEGER) AS c FROM range(0, 8)) u
           LEFT JOIN rep r ON r.c = u.c
           ORDER BY u.c"""),
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = Lloyd.fit(e, "embedding", "vec_id", k = 8, dim = 64,
        iters = 3)
      val dots = array(cents.map(ct =>
        ArrayFunctions.arrayDot(col("embedding"),
          typedLit(ct.toSeq))): _*)
      val assigned = e.select(
        ArrayFunctions.nearestCentroid(col("embedding"), cents).as("c"),
        (array_max(dots) / sqrt(ArrayFunctions.arrayDot(
          col("embedding"), col("embedding")))).as("cos"))
      val rep = assigned.groupBy("c")
        .agg(count(lit(1)).as("n"),
          Num.qround(avg("cos"), 6).as("avg_cos"),
          min("cos").as("min_cos"))
      val universe = s.range(0, 8)
        .select(col("id").cast("int").as("c"))
      universe.join(rep, Seq("c"), "left")
        .select(col("c"), coalesce(col("n"), lit(0L)).as("n"),
          col("avg_cos"), col("min_cos"))
        .orderBy("c")
    })

  /** Greedy max-coverage document selection (X213 — the classic
    * (1−1/e) greedy for submodular coverage, Nemhauser et al. 1978;
    * in LLM-data terms: "pick the k docs that together cover the most
    * distinct 3-gram shingles", the set-cover flavor of diversity
    * selection that SemDeDup (X42) approaches from the other side).
    * k = 5 pinned rounds; each round is ONE distributed anti-join of
    * the (doc, shingle) pair table against the covered-shingle set
    * plus a top-1 aggregate — never a materialized per-doc coverage
    * matrix. Ties break on lowest doc_id. All lanes are exact
    * integers (hash raw). The covered set is localCheckpoint'ed per
    * round so round r+1 doesn't replay rounds 1..r — at warehouse
    * scale: persist to storage. Oracle = the same 5 rounds unrolled
    * as CTE stages. */
  val coverageSelect = QueryDef(
    "q_coverage_select", {
      val rounds = (1 to 5).map { i =>
        val cov = s"cov_${i - 1}"
        val notPicked =
          if (i == 1) ""
          else s"AND p.doc_id NOT IN (SELECT doc_id FROM picked_${i - 1})"
        s"""g_$i AS (
             SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
             FROM pairs p LEFT JOIN $cov c ON p.sh = c.sh
             WHERE c.sh IS NULL $notPicked
             GROUP BY p.doc_id),
           w_$i AS (
             SELECT doc_id, gain FROM g_$i
             ORDER BY gain DESC, doc_id LIMIT 1),
           picked_$i AS (
             ${if (i == 1) s"SELECT doc_id FROM w_1"
               else s"SELECT doc_id FROM picked_${i - 1} UNION ALL " +
                 s"SELECT doc_id FROM w_$i"}),
           cov_$i AS (
             SELECT sh FROM $cov
             UNION
             SELECT p.sh FROM pairs p, w_$i w
             WHERE p.doc_id = w.doc_id)"""
      }.mkString(",\n")
      Some(s"""${SimilarityQueries.sqlShingleCte(3)},
             pairs AS (
               SELECT doc_id, unnest(shingles) AS sh FROM sh),
             cov_0 AS (SELECT sh FROM pairs WHERE false),
             $rounds
             SELECT * FROM (
               ${(1 to 5).map(i =>
                 s"""SELECT $i AS sel_round, w_$i.doc_id, w_$i.gain,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM cov_$i)
                       AS covered_total
                   FROM w_$i""").mkString(" UNION ALL ")}) uq
             ORDER BY sel_round""")
    },
    (s, d) => {
      val pairs = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.Text.wordShingles(col("text"), 3))
            .as("sh"))
        .localCheckpoint() // 5 rounds re-scan the pair table
      var covered = pairs.select("sh").limit(0).localCheckpoint()
      var pickedIds = Seq.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Long, Long)]
      for (r <- 1 to 5) {
        val gains = pairs
          .filter(if (pickedIds.isEmpty) lit(true)
            else !col("doc_id").isin(pickedIds: _*))
          .join(covered, Seq("sh"), "left_anti")
          .groupBy("doc_id").agg(count(lit(1)).as("gain"))
        val win = gains.orderBy(col("gain").desc, col("doc_id"))
          .limit(1).head()
        val (docId, gain) = (win.getLong(0), win.getLong(1))
        pickedIds = pickedIds :+ docId
        covered = covered
          .union(pairs.filter(col("doc_id") === docId).select("sh"))
          .distinct()
          .localCheckpoint()
        out += ((r, docId, gain, covered.count()))
      }
      import s.implicits._
      out.toSeq.toDF("sel_round", "doc_id", "gain", "covered_total")
        .orderBy("sel_round")
    })

  val all: Seq[QueryDef] = Seq(kmeansLloyd, coverageSelect)
}
