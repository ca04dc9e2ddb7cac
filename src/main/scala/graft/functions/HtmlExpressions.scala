package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML→text stripping for web-scraped corpora — the first transform
  * every crawl-derived training set runs (the C4/CCNet extraction
  * step, reduced to its deterministic core so a SQL oracle can replay
  * it byte-for-byte):
  *
  *   pass 1  <script…>…</script> and <style…>…</style> blocks are
  *           deleted wholly (case-insensitive, first matching close
  *           tag, dotall) — their CONTENT is code, not text;
  *   pass 2  remaining tags <[^>]*> become a single space (so
  *           `a<br>b` does not glue into `ab`), and the six
  *           ubiquitous entities &lt; &gt; &quot; &#39; &apos;
  *           &nbsp; decode (&nbsp; to a PLAIN space — a
  *           normalization choice: U+00A0 would survive whitespace
  *           collapse and poison tokenization), with &amp;→&
  *           decoded last so `&amp;lt;` yields the literal `&lt;`,
  *           never a double-decode;
  *   pass 3  whitespace runs collapse to one space; ends trimmed.
  *
  * Each pass is defined EXACTLY as a global regex/replace chain pass
  * (pass 1 = one alternation scan `<script[^>]*>.*?</script> |
  * <style[^>]*>.*?</style>`, leftmost-first; pass 2 = `<[^>]*>`→' '
  * then the entity replaces; pass 3 = `\s+`→' ' + trim) — HtmlSpec
  * pins the kernel against exactly that composed chain on random
  * markup soup, and the DuckDB oracle replays the same chain. The
  * kernel fuses the chain into three buffer walks with zero regex
  * machinery and no intermediate Column materializations — per-row
  * O(n), codegen'd, the scan-bound scale form.
  */
case class StripHtml(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_html"

  override def nullSafeEval(input: Any): Any =
    StripHtml.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StripHtml.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StripHtml {

  /** Matches Java regex `\s` (the set the collapse pass uses). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** If `text[from]` opens a `<name[^>]*>` whose matching
    * `</name>` (case-insensitive) exists, return the index just past
    * that close tag, else -1 (the regex alternation's match-or-advance
    * at this position). */
  private def blockEnd(text: String, from: Int, name: String): Int = {
    val n = text.length
    val afterName = from + 1 + name.length
    if (afterName > n) return -1
    if (!text.regionMatches(true, from + 1, name, 0, name.length)) return -1
    val gt = text.indexOf('>', afterName)
    if (gt < 0) return -1
    val close = "</" + name + ">"
    var k = gt + 1
    val last = n - close.length
    while (k <= last) {
      if (text.charAt(k) == '<' &&
          text.regionMatches(true, k, close, 0, close.length))
        return k + close.length
      k += 1
    }
    -1
  }

  private val entities: Array[(String, Char)] = Array(
    "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"', "&#39;" -> '\'',
    "&apos;" -> '\'', "&nbsp;" -> ' ', "&amp;" -> '&')

  def compute(s: UTF8String): UTF8String = {
    val text = s.toString
    val n = text.length
    // pass 1: delete script/style blocks (≡ the one global alternation
    // scan — non-matching '<' is copied and the scan advances)
    val p1 = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      var consumed = false
      if (c == '<') {
        val e1 = blockEnd(text, i, "script")
        val e = if (e1 >= 0) e1 else blockEnd(text, i, "style")
        if (e >= 0) { i = e; consumed = true }
      }
      if (!consumed) { p1.append(c); i += 1 }
    }
    // pass 2: tags → ' ', entities decoded (≡ `<[^>]*>`→' ' then the
    // replace chain with &amp; last — decoded chars are emitted, never
    // rescanned, which is exactly what chain ordering guarantees)
    val t1 = p1.toString
    val m = t1.length
    val p2 = new java.lang.StringBuilder(m)
    i = 0
    while (i < m) {
      val c = t1.charAt(i)
      if (c == '<') {
        val gt = t1.indexOf('>', i)
        if (gt >= 0) { p2.append(' '); i = gt + 1 }
        else { p2.append(c); i += 1 }
      } else if (c == '&') {
        var hit = -1
        var e = 0
        while (hit < 0 && e < entities.length) {
          val (pat, _) = entities(e)
          if (t1.regionMatches(false, i, pat, 0, pat.length)) hit = e
          e += 1
        }
        if (hit >= 0) { p2.append(entities(hit)._2); i += entities(hit)._1.length }
        else { p2.append(c); i += 1 }
      } else { p2.append(c); i += 1 }
    }
    // pass 3: collapse + trim
    val t2 = p2.toString
    val out = new java.lang.StringBuilder(t2.length)
    i = 0
    var pendingSpace = false
    while (i < t2.length) {
      val c = t2.charAt(i)
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

object HtmlFunctions {
  def stripHtml(text: Column): Column =
    ColumnBridge.column(StripHtml(ColumnBridge.expression(text)))

  /** The regex/replace chain the kernel is DEFINED as — kept as the
    * cross-check HtmlSpec pins the kernel against (and the shape the
    * DuckDB oracle mirrors). Each stage is a full global pass, which
    * is why the fused kernel exists: five regex Column evals and four
    * intermediate strings per row vs three buffer walks. */
  private[graft] def stripHtmlComposed(text: Column): Column = {
    import org.apache.spark.sql.functions._
    val noBlocks = regexp_replace(text,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", "")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (pat, rep)) =>
        replace(c, lit(pat), lit(rep))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
