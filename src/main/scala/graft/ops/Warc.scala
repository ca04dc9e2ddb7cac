package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) record
  * building and parsing: the ingest boundary where a crawl-data
  * pipeline starts. Records are framed by `Content-Length`, so a
  * parser never scans payload bytes for delimiters — a payload
  * containing `WARC/1.0` cannot confuse it, and records stream
  * independently (embarrassingly parallel per blob at 100 TB; the
  * same byte-parser pattern as the WAV/AVI walkers in [[Multimodal]]).
  */
object Warc {

  /** One WARC record as an expression: version line, headers,
    * Content-Length in OCTETS, blank line, payload, record separator.
    * Returns a STRING column (callers concat records then cast binary
    * once). */
  def record(recType: String, uri: Column, payload: Column): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: " + recType + "\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      lit("WARC-Date: 2026-01-01T00:00:00Z\r\n"),
      lit("Content-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))

  final case class WarcRecord(recType: String, targetUri: String,
      contentLength: Long, payload: Array[Byte])

  /** Strict sequential parse of concatenated records. Framing is
    * Content-Length-driven; malformed trailing bytes end the walk
    * (crawl archives truncate — a parser that throws loses the whole
    * split, one that stops loses one record). */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    val magic = "WARC/1.0\r\n".getBytes("US-ASCII")
    def startsWith(at: Int, pat: Array[Byte]): Boolean =
      at + pat.length <= bytes.length &&
        pat.indices.forall(j => bytes(at + j) == pat(j))
    def lineEnd(from: Int): Int = { // index of \r in \r\n, or -1
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    var i = 0
    var ok = true
    while (ok && i < bytes.length) {
      if (!startsWith(i, magic)) { ok = false }
      else {
        i += magic.length
        var headers = Map.empty[String, String]
        var inHeaders = true
        while (ok && inHeaders) {
          if (startsWith(i, Array[Byte]('\r', '\n'))) {
            i += 2; inHeaders = false
          } else {
            val e = lineEnd(i)
            if (e < 0) { ok = false }
            else {
              val line = new String(bytes, i, e - i, "US-ASCII")
              val c = line.indexOf(':')
              if (c > 0)
                headers += (line.substring(0, c).trim ->
                  line.substring(c + 1).trim)
              i = e + 2
            }
          }
        }
        if (ok) {
          val len = headers.get("Content-Length").flatMap(_.toLongOption)
          len match {
            case Some(n) if i + n + 4 <= bytes.length =>
              out += WarcRecord(
                headers.getOrElse("WARC-Type", ""),
                headers.getOrElse("WARC-Target-URI", ""),
                n, java.util.Arrays.copyOfRange(bytes, i, (i + n).toInt))
              i = (i + n).toInt + 4 // skip \r\n\r\n record separator
            case _ => ok = false
          }
        }
      }
    }
    out.toSeq
  }

  /** Lowercase md5 hex of payload bytes — the JVM twin of SQL
    * `md5(text)` (same bytes under UTF-8, same hex). */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }
}
