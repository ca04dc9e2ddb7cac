package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** The composed end-to-end crawl chain (X71): every stage already
  * exists and is individually oracle-green — this query runs them AS
  * ONE PIPELINE (warc.gz parse → HTML strip → language ID → exact
  * dedup → quality filter → shard manifest), which is what a real
  * crawl-curation job executes, and the oracle is the stages' SQL
  * composition (the X62 stream-curation device proved a 2-stage chain
  * composes; this is the full six).
  *
  * Fixture: documents dressed deterministically — doc_id % 10 == 9
  * rows get a CONSTANT body (the planted duplicate the dedup stage
  * must collapse; they split into two fingerprint groups because the
  * HTML dressing prepends visible words for doc_id % 4 == 1), then
  * every row is wrapped in the q_strip_html markup cases and written
  * as REAL per-record gzip WARC members (response + metadata), which
  * stage 1 walks and inflates back (X67b).
  *
  * Scale shape: stages 1–3 and 5 are shuffle-free scans (the WARC
  * byte walk is the accepted JDK boundary, same as X67b); the dedup
  * stage elects winners on (md5, doc_id) pairs only — fixed-width
  * rows, text never enters the winner shuffle — and verdicts rejoin
  * on uniform (fp, doc_id) keys (the X56 two-phase device); the
  * manifest is a 16-key aggregate. One linear plan, no driver
  * round-trips.
  */
object CrawlQueries {

  private val DupBody =
    "this page is a duplicated boilerplate crawl artifact that " +
      "appears many times across the web and should collapse to one copy"

  /** DuckDB-side token list over a named column. */
  private def toksSql(c: String) =
    s"""list_filter(string_split_regex($c, '\\s+'), t -> len(t) > 0)"""

  val crawlPipeline = QueryDef(
    "q_crawl_pipeline",
    Some {
      val scores = Text.LangProfiles.map { case (lang, markers) =>
        val set = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(lt, t -> t IN ($set))) AS s_$lang"
      }.mkString(",\n                   ")
      val best =
        s"GREATEST(${Text.LangProfiles.map("s_" + _._1).mkString(", ")})"
      s"""WITH f AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 9 THEN '$DupBody'
                          ELSE text END AS body
              FROM documents),
            p AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0 THEN
                       '<html><head><style>p { color: red; }</style>'
                       || '</head><body><p>' || body
                       || '</p><script>var x = 1 < 2;</script></body></html>'
                     WHEN doc_id % 4 = 1 THEN
                       'Tom &amp; Jerry &lt;3 ' || body || ' <br/>'
                     WHEN doc_id % 4 = 2 THEN
                       '<a href="http://x.y">' || body
                       || '</a> &nbsp;&quot;quoted&quot;'
                     ELSE body END AS html
              FROM f),
            -- stage 1 (gzip-WARC round trip) is byte-exact identity on
            -- html: the X67b prediction device
            s AS (
              SELECT doc_id,
                     trim(regexp_replace(
                       replace(replace(replace(replace(replace(replace(
                         replace(
                           regexp_replace(
                             regexp_replace(html,
                               '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>',
                               '', 'g'),
                             '<[^>]*>', ' ', 'g'),
                         '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                         '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
                         '&amp;', '&'),
                       '\\s+', ' ', 'g')) AS clean
              FROM p),
            l AS (
              SELECT doc_id, clean,
                     list_transform(${toksSql("clean")}, t -> lower(t)) AS lt
              FROM s),
            sc AS (
              SELECT doc_id, clean,
                   $scores
              FROM l),
            lk AS (
              SELECT doc_id, clean FROM sc WHERE $best > 0),
            fp AS (
              SELECT doc_id, clean,
                     md5(trim(regexp_replace(regexp_replace(lower(clean),
                       '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS h
              FROM lk),
            w AS (SELECT h, MIN(doc_id) AS keep_id FROM fp GROUP BY h),
            dd AS (
              SELECT fp.doc_id, fp.clean
              FROM fp JOIN w ON fp.h = w.h AND fp.doc_id = w.keep_id),
            q AS (
              SELECT doc_id, clean, ${toksSql("clean")} AS toks FROM dd),
            k AS (
              SELECT doc_id, toks FROM q
              WHERE len(toks) >= 15 AND len(toks) <= 100000
                AND CAST(list_reduce(list_transform(toks,
                      t -> len(t)), (a, b) -> a + b) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE) BETWEEN 2.0 AND 12.0
                AND CAST(len(regexp_replace(clean, '[A-Za-z0-9\\s]', '',
                      'g')) AS DOUBLE) / CAST(len(clean) AS DOUBLE) <= 0.3),
            sh AS (
              SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                     CAST('0x' || substring(md5('shard:'
                       || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       % 16 AS shard
              FROM k)
            SELECT shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(MIN(doc_id) AS BIGINT) AS min_doc,
                   CAST(MAX(doc_id) AS BIGINT) AS max_doc
            FROM sh GROUP BY shard ORDER BY shard"""
    },
    (s, d) => {
      import s.implicits._
      import graft.ops.Warc
      val body = when(col("doc_id") % 10 === 9, lit(DupBody))
        .otherwise(col("text"))
      val html = when(col("doc_id") % 4 === 0,
          concat(
            lit("<html><head><style>p { color: red; }</style></head><body><p>"),
            body,
            lit("</p><script>var x = 1 < 2;</script></body></html>")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("Tom &amp; Jerry &lt;3 "), body, lit(" <br/>")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("<a href=\"http://x.y\">"), body,
            lit("</a> &nbsp;&quot;quoted&quot;")))
        .otherwise(body)
      // stage 1: REAL per-record gzip members out, member-walk back in
      // (X67b); only the response payload continues down the chain
      val fetched = Tables.documents(s, d)
        .select(col("doc_id").cast("long"), html.as("html"), col("lang"),
          col("source"))
        .as[(Long, String, String, String)]
        .map { case (id, h, lang, source) =>
          val uri = s"http://corpus.local/doc/$id"
          val meta = s"lang: $lang\nsource: $source"
          Warc.gzipMember(
            Warc.recordBytes("response", uri, h.getBytes("UTF-8"))) ++
            Warc.gzipMember(
              Warc.recordBytes("metadata", uri, meta.getBytes("UTF-8")))
        }
        .flatMap { b =>
          Warc.parseGz(b).filter(_.recType == "response").map { r =>
            (r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong,
              new String(r.payload, "UTF-8"))
          }
        }
        .toDF("doc_id", "html")
      // stage 2: HTML → text (fused X55 kernel)
      val stripped = fetched.select(col("doc_id"),
        graft.functions.HtmlFunctions.stripHtml(col("html")).as("clean"))
      // stage 3: language ID gate (X8)
      val langKept = stripped
        .filter(Text.langId(col("clean")) =!= "und")
      // stage 4: exact dedup on the normalized fingerprint (X1/X19) —
      // winner election on fixed-width (h, doc_id) pairs only
      val withFp = langKept
        .withColumn("h", Text.fingerprintMd5(col("clean")))
      val winners = withFp.select(col("h"), col("doc_id"))
        .groupBy("h").agg(min("doc_id").as("doc_id"))
      val deduped = withFp.join(winners, Seq("h", "doc_id"), "left_semi")
      // stage 5: Gopher/C4 quality gate (X20)
      val toks = Text.tokens(col("clean"))
      val nToks = size(toks)
      val meanTokLen = aggregate(toks, lit(0),
        (acc, t) => acc + length(t)).cast("double") / nToks.cast("double")
      val symbolRatio =
        length(regexp_replace(col("clean"), "[A-Za-z0-9\\s]", ""))
          .cast("double") / length(col("clean")).cast("double")
      val kept = deduped
        .filter(nToks >= 15 && nToks <= 100000 &&
          meanTokLen.between(2.0, 12.0) && symbolRatio <= 0.3)
        .select(col("doc_id"), nToks.cast("long").as("n_tokens"))
      // stage 6: deterministic shard manifest (X47)
      graft.ops.Shard.assign(kept, "doc_id", 16)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("sum_tokens"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"))
        .orderBy("shard")
    })

  val all: Seq[QueryDef] = Seq(crawlPipeline)
}
