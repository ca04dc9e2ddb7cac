package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** StripHtml kernel semantics on crafted markup, plus the
  * kernel ≡ composed-regex-chain pin on random markup soup. */
class HtmlSpec extends SparkSuite {
  import spark.implicits._

  private def strip(texts: String*): Seq[String] =
    texts.toDF("t")
      .select(HtmlFunctions.stripHtml(col("t")))
      .as[String].collect().toSeq

  test("tags become spaces, text survives, whitespace collapses") {
    assert(strip("<p>hello <b>world</b></p>") === Seq("hello world"))
    assert(strip("a<br>b") === Seq("a b"))
  }

  test("script and style blocks are deleted wholly, content included") {
    assert(strip(
      "<style>p { color: red; }</style>keep<script>var x = 1 < 2;</script>")
      === Seq("keep"))
    assert(strip("<SCRIPT a=b>code</ScRiPt>tail") === Seq("tail"))
  }

  test("unclosed block start degrades to a plain tag") {
    // no </script>: the open tag is removed as a tag, content stays —
    // exactly what the regex chain does
    assert(strip("<script>alert(1) rest") === Seq("alert(1) rest"))
  }

  test("entities decode, &amp; last — no double decode") {
    assert(strip("Tom &amp; Jerry &lt;3") === Seq("Tom & Jerry <3"))
    assert(strip("&amp;lt; stays encoded") === Seq("&lt; stays encoded"))
    assert(strip("&quot;q&quot; &#39;a&#39; &apos;b&apos; x&nbsp;y")
      === Seq("\"q\" 'a' 'b' x y"))
    assert(strip("&unknown; kept") === Seq("&unknown; kept"))
  }

  test("angle-bracket pairing follows <[^>]*> exactly") {
    // '<'…'>' spans text like a tag would — the chain's defined quirk
    assert(strip("3 < 5 and x > y") === Seq("3 y"))
    // '<' with no '>' anywhere after it is literal
    assert(strip("tail< end") === Seq("tail< end"))
    assert(strip("x > y only") === Seq("x > y only"))
  }

  test("kernel equals the composed regex chain on random markup soup") {
    val rnd = new scala.util.Random(11)
    val pieces = Array(
      "plain words here", "<p>", "</p>", "<div class=\"x\">", "<br/>",
      "<script>", "</script>", "<style a=b>", "</style>", "var j<k;",
      "&amp;", "&lt;", "&amp;lt;", "&gt;", "&nbsp;", "&quot;", "&bogus;",
      "< loose", "loose >", "\n", "  ", "text & more", "<SCRIPT>",
      "</SCRIPT>", "<scripty>", "éclair café")
    val soups = Seq.tabulate(300) { _ =>
      Seq.fill(3 + rnd.nextInt(12))(pieces(rnd.nextInt(pieces.length)))
        .mkString(" ")
    }
    val rows = soups.toDF("t")
      .select(HtmlFunctions.stripHtml(col("t")).as("fused"),
        HtmlFunctions.stripHtmlComposed(col("t")).as("composed"))
      .collect()
    rows.zip(soups).foreach { case (r, soup) =>
      assert(r.getString(0) === r.getString(1), s"input: $soup")
    }
  }
}
