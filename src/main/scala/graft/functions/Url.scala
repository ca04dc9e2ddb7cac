package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction (X70 — the
  * step every crawl pipeline runs before URL-level dedup and
  * per-domain curation: raw crawl URLs differ in scheme/host case,
  * default ports, duplicate slashes, tracking params, param order and
  * fragments while naming the same resource; and per-domain caps
  * (X39), calibration (X57) and rankings (X66/X69) group by the
  * REGISTRABLE domain, not the raw host).
  *
  * Defined — like [[graft.functions.HtmlFunctions.stripHtml]] — as a
  * replayable transform chain, every step expressible identically in
  * Spark and ANSI-ish SQL (regexp component extraction, list
  * filter/sort/rejoin), so the oracle replays the definition rather
  * than trusting a library. All steps are composed built-in
  * expressions: codegen-friendly, zero UDFs, shuffle-free.
  *
  * Canonicalization chain:
  *  1. scheme and host lowercased;
  *  2. fragment dropped;
  *  3. default port stripped (`:80` for http, `:443` for https);
  *  4. leading `www.` dropped;
  *  5. path: duplicate `/` collapsed, trailing `/` dropped (root
  *     becomes empty — `http://x.com/` ≡ `http://x.com`);
  *  6. query: `utm_*` tracking params dropped, the rest sorted
  *     byte-wise; an emptied query loses its `?`.
  *
  * Registrable domain: last two host labels, or last three when the
  * last two form a multi-part public suffix. The embedded suffix set
  * is a deliberately small stand-in for the Mozilla Public Suffix
  * List (the real op ships the full PSL as a broadcast literal set —
  * same plan shape, longer list).
  */
object Url {

  /** Multi-part public suffixes recognized by [[registrableDomain]].
    * Kept tiny and embedded; the production list is the PSL. */
  val MultiPartSuffixes: Seq[String] =
    Seq("ac.uk", "co.jp", "co.uk", "com.au", "org.uk")

  private def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def hostPort(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  private def rawPath(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  private def rawQuery(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Lowercased host with default port and leading `www.` stripped. */
  def canonicalHost(url: Column): Column = {
    val hp = hostPort(url)
    val noPort =
      when(scheme(url) === "http", regexp_replace(hp, ":80$", ""))
        .when(scheme(url) === "https", regexp_replace(hp, ":443$", ""))
        .otherwise(hp)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Path with duplicate slashes collapsed and the trailing slash
    * dropped (root path canonicalizes to the empty string). */
  def canonicalPath(url: Column): Column =
    regexp_replace(regexp_replace(rawPath(url), "/{2,}", "/"), "/$", "")

  /** Query with `utm_*` params dropped and the survivors sorted
    * byte-wise; empty when nothing survives. */
  def canonicalQuery(url: Column): Column = {
    val params = filter(split(rawQuery(url), "&"),
      p => length(p) > 0 && !p.startsWith("utm_"))
    concat_ws("&", array_sort(params))
  }

  /** The full canonical URL. */
  def canonicalize(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(scheme(url), lit("://"), canonicalHost(url),
      canonicalPath(url),
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Registrable domain of the canonical host: last two labels, or
    * last three when the last two are a multi-part public suffix.
    * Non-default ports survive in the canonical URL but are not part
    * of the domain, so any `:port` is stripped before label-splitting. */
  def registrableDomain(url: Column): Column = {
    val host = regexp_replace(canonicalHost(url), ":[0-9]+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(n <= 2, host)
      .when(lastTwo.isInCollection(MultiPartSuffixes), lastThree)
      .otherwise(lastTwo)
  }
}
