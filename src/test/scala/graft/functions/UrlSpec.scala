package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** X70 — URL canonicalization + registrable domain
  * ([[graft.functions.Url]]): literal in/out pairs for every rule the
  * scaladoc chain promises, including the r8-verdict-named edges
  * (`:80`/`:443` vs non-default ports, host-only URLs, queries that
  * empty after utm-filtering). */
class UrlSpec extends SparkSuite {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Url.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  private def dom(urls: String*): Seq[String] =
    urls.toDF("url").select(Url.registrableDomain(col("url")).as("d"))
      .collect().map(_.getString(0)).toSeq

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTP://WWW.Example.COM/Mixed/Case") ===
      Seq("http://example.com/Mixed/Case"))
  }

  test("default ports stripped: :80 for http, :443 for https") {
    assert(canon("http://example.com:80/a", "https://example.com:443/a") ===
      Seq("http://example.com/a", "https://example.com/a"))
  }

  test("default port of the OTHER scheme survives") {
    // :443 on http (and :80 on https) are NOT default — they stay
    assert(canon("http://example.com:443/a", "https://example.com:80/a") ===
      Seq("http://example.com:443/a", "https://example.com:80/a"))
  }

  test("non-default port survives canonicalization but not the domain") {
    assert(canon("http://example.com:8080/a") ===
      Seq("http://example.com:8080/a"))
    assert(dom("http://example.com:8080/a") === Seq("example.com"))
  }

  test("host-only URL: empty path, no trailing slash") {
    assert(canon("http://www.news.co.jp", "http://example.com/") ===
      Seq("http://news.co.jp", "http://example.com"))
  }

  test("duplicate slashes collapse; trailing slash drops") {
    assert(canon("http://example.com//a///b/") ===
      Seq("http://example.com/a/b"))
  }

  test("fragment dropped") {
    assert(canon("http://example.com/a#sec", "http://example.com/a?x=1#sec")
      === Seq("http://example.com/a", "http://example.com/a?x=1"))
  }

  test("utm_* params dropped, survivors sorted byte-wise") {
    assert(canon("http://example.com/a?utm_source=x&b=2&a=1") ===
      Seq("http://example.com/a?a=1&b=2"))
  }

  test("query that empties after utm-filtering loses its '?'") {
    assert(canon("http://example.com/a?utm_source=only",
      "http://example.com/a?") === Seq("http://example.com/a",
      "http://example.com/a"))
  }

  test("registrable domain: plain two-label host") {
    assert(dom("http://www.example.com/a") === Seq("example.com"))
  }

  test("registrable domain: deep subdomain collapses to last two labels") {
    assert(dom("https://a.b.c.example.com/x") === Seq("example.com"))
  }

  test("registrable domain: multi-part public suffixes take three labels") {
    assert(dom("http://shop.example.co.uk", "http://www.news.co.jp",
      "https://stats.data.ac.uk", "http://x.example.com.au") ===
      Seq("example.co.uk", "news.co.jp", "data.ac.uk", "example.com.au"))
  }

  test("registrable domain: single-label host is its own domain") {
    assert(dom("http://localhost/x") === Seq("localhost"))
  }

  test("PSL wildcard rule *.ck: any-label.ck is the public suffix") {
    assert(dom("http://foo.bar.ck/x", "http://deep.foo.bar.ck/x",
      "http://bar.ck/x") ===
      Seq("foo.bar.ck", "foo.bar.ck", "bar.ck")) // suffix degrades to self
  }

  test("PSL exception rule !www.ck beats the *.ck wildcard") {
    assert(dom("http://shop.www.ck/x", "http://a.b.www.ck/x") ===
      Seq("www.ck", "www.ck"))
  }

  test("PSL 3-label wildcard *.kawasaki.jp with !city exception") {
    assert(dom("http://blog.north.kawasaki.jp/x",
      "https://city.kawasaki.jp/x",
      "https://sub.city.kawasaki.jp/x",
      "http://north.kawasaki.jp/x") ===
      Seq("blog.north.kawasaki.jp", "city.kawasaki.jp",
        "city.kawasaki.jp", "north.kawasaki.jp"))
  }

  test("PSL 3-label plain rule (qld.edu.au) takes four labels") {
    assert(dom("http://school.qld.edu.au/x",
      "http://x.school.qld.edu.au/x") ===
      Seq("school.qld.edu.au", "school.qld.edu.au"))
  }

  test("PSL rule-table shape: exceptions/wildcards/plain grouped by k") {
    assert(PublicSuffix.ExceptionsByK(2).contains("www.ck"))
    assert(PublicSuffix.ExceptionsByK(3).contains("city.kawasaki.jp"))
    assert(PublicSuffix.WildcardTailsByK(2).contains("ck"))
    assert(PublicSuffix.WildcardTailsByK(3).contains("kawasaki.jp"))
    assert(PublicSuffix.PlainByK(2).contains("co.uk"))
    assert(PublicSuffix.PlainByK(3).contains("qld.edu.au"))
    // the expanded snapshot reaches the full PSL's depth: 4-label
    // plain rules (blob.core.windows.net) and the 5-label AWS China
    // compute wildcard
    assert(PublicSuffix.PlainByK(4).contains("blob.core.windows.net"))
    assert(PublicSuffix.WildcardTailsByK(5)
      .contains("compute.amazonaws.com.cn"))
    assert(PublicSuffix.MaxK === 5)
    // both sections feed Rules; ICANN-only remains separately readable
    assert(PublicSuffix.PrivateRules.contains("github.io"))
    assert(!PublicSuffix.IcannRules.contains("github.io"))
    assert(PublicSuffix.Rules.size ===
      PublicSuffix.IcannRules.size + PublicSuffix.PrivateRules.size)
  }

  test("private-section suffixes key tenants separately (r11 #3)") {
    assert(dom(
      "https://alice.github.io/proj", "https://bob.github.io/other",
      "https://deep.sub.alice.github.io/x", "https://github.io/") ===
      Seq("alice.github.io", "bob.github.io", "alice.github.io",
        "github.io"))
    assert(dom("http://myblog.blogspot.com/p/1",
      "http://app-1234.herokuapp.com/",
      "https://tenant.s3.amazonaws.com/bucket") ===
      Seq("myblog.blogspot.com", "app-1234.herokuapp.com",
        "tenant.s3.amazonaws.com"))
  }

  test("deep cloud suffixes: 4/5-label rules and wildcards (r11 #3)") {
    // plain 4-label rule: acct.blob.core.windows.net is registrable
    assert(dom("https://acct.blob.core.windows.net/c",
      "https://x.acct.blob.core.windows.net/c") ===
      Seq("acct.blob.core.windows.net", "acct.blob.core.windows.net"))
    // wildcard consumes one label: ec2-1-2-3-4.compute.amazonaws.com
    // is a public suffix, so one more label is the registrable domain
    assert(dom(
      "http://i-abc.ec2-1.compute.amazonaws.com/",
      "http://ec2-1.compute.amazonaws.com/") ===
      Seq("i-abc.ec2-1.compute.amazonaws.com",
        "ec2-1.compute.amazonaws.com"))
    // 5-label China variant
    assert(dom("http://host.ec2-1.compute.amazonaws.com.cn/") ===
      Seq("host.ec2-1.compute.amazonaws.com.cn"))
    // fastly's 4-label ssl suffixes
    assert(dom("https://site.global.ssl.fastly.net/a") ===
      Seq("site.global.ssl.fastly.net"))
  }

  test("new ICANN registries: ccTLD second levels and geo codes " +
      "(r11 #3)") {
    assert(dom("http://empresa.com.br/x", "http://city.ca.us/x",
      "http://dept.gc.ca/x", "http://u.ac.at/x",
      "http://firm.com.co/x", "http://min.gouv.sn/x",
      "http://pref.tokyo.jp/x", "http://host.in-addr.arpa/x") ===
      Seq("empresa.com.br", "city.ca.us", "dept.gc.ca", "u.ac.at",
        "firm.com.co", "min.gouv.sn", "pref.tokyo.jp",
        "host.in-addr.arpa"))
  }

  test("variants of one resource share one canonical form (the dedup key)") {
    val c = canon("http://example.com/item/3",
      "HTTP://WWW.Example.com:80//item//3/",
      "http://example.com/item/3?utm_source=feed#top",
      "http://www.example.com/item/3#section")
    assert(c.distinct === Seq("http://example.com/item/3"))
  }
}
