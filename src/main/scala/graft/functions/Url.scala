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
  * Registrable domain: public suffix (per the checked-in
  * [[PublicSuffix]] PSL snapshot — plain, wildcard and exception
  * rules, the publicsuffix.org algorithm) plus one more host label.
  * The rule table compiles to a bounded when-chain of Catalyst
  * `InSet` membership tests — one per (rule kind, label count), NOT
  * one per rule — so the full 9k-rule PSL ships as broadcast literal
  * sets with O(1) per-row lookups and the same shuffle-free plan.
  */
object Url {

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

  /** Registrable domain of the canonical host under the PSL snapshot
    * (publicsuffix.org algorithm): exception rules first (longest
    * first), then the longest matching plain/wildcard rule, default
    * rule `*`. The registrable domain is the prevailing suffix plus
    * one label; a host that IS a suffix (or a bare TLD) degrades to
    * itself so grouping keys stay non-null. Non-default ports survive
    * in the canonical URL but are not part of the domain, so any
    * `:port` is stripped before label-splitting. */
  def registrableDomain(url: Column): Column = {
    val host = regexp_replace(canonicalHost(url), ":[0-9]+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    // last k labels re-joined (guarded by n >= k at every use site —
    // concat_ws would silently skip the null element_at overflow)
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(labels, -i)): _*)
    // registrable = suffix of k labels + one more, degrading to the
    // host when nothing precedes the suffix
    def plusOne(k: Int): Column =
      when(n >= k + 1, lastK(k + 1)).otherwise(host)
    val ks = (PublicSuffix.MaxK to 1 by -1)
    val excs = ks.flatMap { k =>
      PublicSuffix.ExceptionsByK.get(k).map { rules =>
        // exception: the rule itself IS the registrable domain
        (n >= k && lastK(k).isInCollection(rules), lastK(k))
      }
    }
    val plains = ks.flatMap { k =>
      val plain = PublicSuffix.PlainByK.get(k).map { rules =>
        (n >= k && lastK(k).isInCollection(rules), plusOne(k))
      }
      val wild = PublicSuffix.WildcardTailsByK.get(k).map { tails =>
        // *.tail: the wildcard consumes one host label, so a k-label
        // suffix needs only the k-1 tail labels to match
        (n >= k && lastK(k - 1).isInCollection(tails), plusOne(k))
      }
      plain ++ wild
    }
    val dflt = when(n >= 2, lastK(2)).otherwise(host)
    (excs ++ plains).foldRight(dflt) { case ((cond, value), acc) =>
      when(cond, value).otherwise(acc)
    }
  }
}
