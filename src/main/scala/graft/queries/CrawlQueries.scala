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
  * manifest is a 16-key aggregate. The fingerprinted stage boundary
  * is snapshotted once (localCheckpoint) because two dedup branches
  * consume it; no other driver round-trips.
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
      // winner election on fixed-width (h, doc_id) pairs only. The
      // fingerprinted stream is consumed TWICE (winner election and
      // the rejoin probe side), and everything upstream of it is the
      // WARC byte walk + HTML strip — the chain's expensive scans — so
      // the stage boundary is materialized once (localCheckpoint, the
      // X32-style stage snapshot) instead of re-running the parse per
      // branch; this is also what stabilized the bench spread the r10
      // verdict flagged
      val withFp = langKept
        .withColumn("h", Text.fingerprintMd5(col("clean")))
        .localCheckpoint(true)
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

  /** Characters escaped when compiling a robots rule path to a regex
    * (every regex metachar except `*`, which becomes `.*`, and the
    * trailing `$` anchor, which is handled separately). */
  private val RxSpecials = Seq(
    "\\" -> "\\\\", "." -> "\\.", "(" -> "\\(", ")" -> "\\)",
    "[" -> "\\[", "]" -> "\\]", "{" -> "\\{", "}" -> "\\}",
    "+" -> "\\+", "?" -> "\\?", "^" -> "\\^", "|" -> "\\|", "$" -> "\\$")

  /** DuckDB expression: robots rule path `e` → anchored match regex.
    * Literal-escape chain, then `*` → `.*`; a trailing `$` on the rule
    * re-anchors the end. Mirrored operation-for-operation by the Spark
    * `robotsRx` below so the compiled patterns are byte-identical. */
  private def sqlRobotsRx(e: String): String = {
    val core = s"CASE WHEN ends_with($e, '$$') " +
      s"THEN substring($e, 1, len($e) - 1) ELSE $e END"
    val escaped = RxSpecials.foldLeft(core) { case (acc, (from, to)) =>
      s"replace($acc, '$from', '$to')"
    }
    s"""('^' || replace($escaped, '*', '.*') ||
        CASE WHEN ends_with($e, '$$') THEN '$$' ELSE '' END)"""
  }

  /** Spark twin of sqlRobotsRx. */
  private def robotsRx(e: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val anchored = e.endsWith("$")
    val core = when(anchored, e.substr(lit(1), length(e) - 1)).otherwise(e)
    val escaped = RxSpecials.foldLeft(core) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
    concat(lit("^"), replace(escaped, lit("*"), lit(".*")),
      when(anchored, "$").otherwise(""))
  }

  /** robots.txt parsing + URL permission evaluation (X82 — the crawl
    * POLICY boundary next to the WARC byte boundary: RFC 9309 / the
    * Google REP rules every crawler applies before a fetch even
    * happens). Per-domain robots files are planted deterministically
    * (a non-matching `archiver` group whose `Disallow: /` must NOT
    * leak onto us; a MERGED multi-agent header — consecutive
    * `User-agent: *` + `User-agent: helperbot` lines sharing one rule
    * group per RFC 9309 §2.1; allow-overrides, `*`-wildcard and
    * `$`-anchored rules; a domain-varying extra rule; and domains
    * with no `*` group at all). Groups are delimited by UA lines NOT
    * preceded by another UA line (lag over a per-domain window), and
    * rules are evaluated under the RFC's most-specific-match rule —
    * specificity = rule-path (pattern) length, Google's REP tie-break,
    * which keeps the match replayable in SQL — with allow beating
    * disallow on ties. `*` in a rule matches any char sequence and a
    * trailing `$` anchors the path end (§2.2.3); both engines compile
    * the rule to the same anchored regex via a literal escape chain.
    *
    * Scale shape: robots parsing is per-domain metadata (|domains| ×
    * lines rows); the evaluation joins URLs to rules on the domain
    * key (regex evaluated per joined pair, a bounded per-domain rule
    * set) and ranks matches in a per-URL window — fixed-width rows,
    * no text beyond paths. */
  val robotsEval = QueryDef(
    "q_robots_eval",
    Some(s"""WITH rb AS (
              SELECT source,
                     '# robots' || chr(10) ||
                     'User-agent: archiver' || chr(10) ||
                     'Disallow: /' || chr(10) ||
                     CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1)
                            AS INT) % 5 = 4
                          THEN 'User-agent: onlybot'
                          ELSE 'User-agent: *' END || chr(10) ||
                     'User-agent: helperbot' || chr(10) ||
                     'Disallow: /private' || chr(10) ||
                     'Allow: /private/ok' || chr(10) ||
                     'Disallow: /*.zip$$' || chr(10) ||
                     'Allow: /data/*/public' ||
                     CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1)
                            AS INT) % 3 = 0
                          THEN chr(10) || 'Disallow: /data'
                          ELSE '' END AS robots
              FROM (SELECT DISTINCT source FROM documents)),
            ln AS (
              SELECT source, CAST(i AS INT) AS idx, trim(l) AS l
              FROM (SELECT source,
                           unnest(string_split(robots, chr(10))) AS l,
                           generate_subscripts(
                             string_split(robots, chr(10)), 1) AS i
                    FROM rb)),
            lg AS (
              SELECT source, idx, l,
                     LAG(l) OVER (PARTITION BY source ORDER BY idx) AS prev
              FROM ln),
            g AS (
              SELECT source, idx, l,
                     CAST(SUM(CASE WHEN starts_with(l, 'User-agent: ')
                       AND NOT COALESCE(
                         starts_with(prev, 'User-agent: '), FALSE)
                       THEN 1 ELSE 0 END) OVER (PARTITION BY source
                       ORDER BY idx ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS gid
              FROM lg),
            ua AS (
              SELECT source, gid, substring(l, 13) AS agent
              FROM g WHERE starts_with(l, 'User-agent: ')),
            ru AS (
              SELECT source, gid, substring(l, 11) AS rpath,
                     0 AS is_allow
              FROM g WHERE starts_with(l, 'Disallow: ')
              UNION ALL
              SELECT source, gid, substring(l, 8) AS rpath, 1 AS is_allow
              FROM g WHERE starts_with(l, 'Allow: ')),
            sr AS (
              SELECT ru.source, ru.rpath, ru.is_allow,
                     ${sqlRobotsRx("ru.rpath")} AS rx
              FROM ru JOIN ua ON ua.source = ru.source
                AND ua.gid = ru.gid
              WHERE ua.agent = '*'),
            u AS (
              SELECT doc_id, source,
                     CASE CAST(doc_id % 8 AS INT)
                       WHEN 0 THEN '/home'
                       WHEN 1 THEN '/private'
                       WHEN 2 THEN '/private/ok/page'
                       WHEN 3 THEN '/private/secret'
                       WHEN 4 THEN '/data/x'
                       WHEN 5 THEN '/files/report.zip'
                       WHEN 6 THEN '/files/report.zip.html'
                       ELSE '/data/a/public' END AS path
              FROM documents),
            m AS (
              SELECT u.doc_id, r.rpath, r.is_allow,
                     ROW_NUMBER() OVER (PARTITION BY u.doc_id
                       ORDER BY len(r.rpath) DESC, r.is_allow DESC,
                                r.rpath) AS rn
              FROM u JOIN sr r ON u.source = r.source
                AND regexp_matches(u.path, r.rx))
            SELECT u.doc_id, u.source, u.path, m.rpath AS rule,
                   COALESCE(m.is_allow = 1, TRUE) AS allowed
            FROM u LEFT JOIN m ON m.doc_id = u.doc_id AND m.rn = 1
            ORDER BY u.doc_id"""),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
      val rb = docs.select("source").distinct().select(col("source"),
        concat(
          lit("# robots\nUser-agent: archiver\nDisallow: /\n"),
          when(srcNum % 5 === 4, "User-agent: onlybot")
            .otherwise("User-agent: *"),
          lit("\nUser-agent: helperbot"),
          lit("\nDisallow: /private\nAllow: /private/ok"),
          lit("\nDisallow: /*.zip$\nAllow: /data/*/public"),
          when(srcNum % 3 === 0, "\nDisallow: /data").otherwise(""))
          .as("robots"))
      val ln = rb.select(col("source"),
          posexplode(split(col("robots"), "\n")).as(Seq("i0", "l0")))
        .select(col("source"), (col("i0") + 1).as("idx"),
          trim(col("l0")).as("l"))
      val wl = Window.partitionBy("source").orderBy("idx")
      val w = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val isUa = col("l").startsWith("User-agent: ")
      val g = ln.select(col("source"), col("l"),
        sum(when(isUa && !coalesce(lag(col("l"), 1).over(wl)
            .startsWith("User-agent: "), lit(false)), 1L)
          .otherwise(0L)).over(w).as("gid"))
      val ua = g.filter(isUa)
        .select(col("source"), col("gid"),
          col("l").substr(lit(13), length(col("l"))).as("agent"))
      val ru = g.filter(col("l").startsWith("Disallow: "))
        .select(col("source"), col("gid"),
          col("l").substr(lit(11), length(col("l"))).as("rpath"),
          lit(0).as("is_allow"))
        .unionAll(g.filter(col("l").startsWith("Allow: "))
          .select(col("source"), col("gid"),
            col("l").substr(lit(8), length(col("l"))).as("rpath"),
            lit(1).as("is_allow")))
      val sr = ru.join(ua.filter(col("agent") === "*")
          .select("source", "gid"), Seq("source", "gid"))
        .select(col("source"), col("rpath"), col("is_allow"),
          robotsRx(col("rpath")).as("rx"))
      val u = docs.select(col("doc_id"), col("source"),
        (col("doc_id") % 8).cast("int").as("p8"))
        .select(col("doc_id"), col("source"),
          when(col("p8") === 0, "/home")
            .when(col("p8") === 1, "/private")
            .when(col("p8") === 2, "/private/ok/page")
            .when(col("p8") === 3, "/private/secret")
            .when(col("p8") === 4, "/data/x")
            .when(col("p8") === 5, "/files/report.zip")
            .when(col("p8") === 6, "/files/report.zip.html")
            .otherwise("/data/a/public").as("path"))
      val wm = Window.partitionBy("doc_id")
        .orderBy(length(col("rpath")).desc, col("is_allow").desc,
          col("rpath"))
      val m = u.join(sr, u("source") === sr("source") &&
          regexp_like(u("path"), col("rx")))
        .select(u("doc_id"), col("rpath"), col("is_allow"))
        .withColumn("rn", row_number().over(wm))
        .filter(col("rn") === 1)
      u.join(m.select(col("doc_id").as("mid"), col("rpath"),
          col("is_allow")), u("doc_id") === col("mid"), "left")
        .select(u("doc_id"), u("source"), u("path"),
          col("rpath").as("rule"),
          coalesce(col("is_allow") === 1, lit(true)).as("allowed"))
        .orderBy("doc_id")
    })

  // -------------------------------- X105 crawl frontier priority

  /** Crawl frontier prioritization (X105 — the scheduler policy that
    * consumes the graph signals: every frontier implementation
    * (Heritrix precedence, OPIC-style ordering) scores candidate
    * domains by authority × proximity; here priority = PageRank /
    * (1 + seed hop distance), unreached domains demoted to 0 — so the
    * crawler spends its budget near the trusted seeds on domains the
    * graph endorses. Pure composition (the X71 device): both inputs
    * are the EXISTING oracle-green X66 and X94 queries on the shared
    * domain graph; this adds one fixed-width join on the node key and
    * one elementwise divide (pr is already qround(6)'d, hops integer
    * — the priority hashes raw). */
  val frontierPriority = QueryDef(
    "q_frontier_priority",
    Some(s"""WITH pq AS (${CurationQueries.domainPagerank.oracle.get}),
            bq AS (${GraphQueries.domainBfs.oracle.get})
            SELECT pq.node, pq.pr, bq.hops,
                   CASE WHEN bq.hops IS NULL THEN 0.0
                        ELSE pq.pr / CAST(1 + bq.hops AS DOUBLE) END
                     AS priority
            FROM pq JOIN bq USING (node)
            ORDER BY node"""),
    (s, d) => {
      val pr = CurationQueries.domainPagerank.fn(s, d)
        .select(col("node"), col("pr"))
      val hops = GraphQueries.domainBfs.fn(s, d)
      pr.join(hops, "node")
        .select(col("node"), col("pr"), col("hops"),
          when(col("hops").isNull, lit(0.0))
            .otherwise(col("pr") /
              (lit(1) + col("hops")).cast("double")).as("priority"))
        .orderBy("node")
    })

  val all: Seq[QueryDef] = Seq(crawlPipeline, robotsEval,
    frontierPriority)
}
