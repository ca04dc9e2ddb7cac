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
    * once).
    *
    * ISO 28500 §5 makes `WARC-Record-ID` and `WARC-Date` mandatory:
    * the date is a caller-supplied column (defaults to a fixed
    * timestamp so fixture blobs stay bit-deterministic), and the
    * record id is a deterministic `urn:uuid:` spliced from
    * md5(type, uri, date, payload-md5) — same record, same id, on
    * every engine and every run, which is what lets a byte-level
    * round-trip oracle exist at all (a random UUID would be
    * unreplayable). */
  def record(recType: String, uri: Column, payload: Column,
      date: Column = lit("2026-01-01T00:00:00Z")): Column = {
    val h = md5(concat(lit(recType), lit(" "), uri, lit(" "), date,
      lit(" "), md5(payload)))
    val recordId = concat(lit("<urn:uuid:"),
      substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
      substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
      substring(h, 21, 12), lit(">"))
    concat(
      lit("WARC/1.0\r\nWARC-Type: " + recType + "\r\n"),
      lit("WARC-Record-ID: "), recordId, lit("\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("Content-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
  }

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

  // ------------------------------------------------ .warc.gz members

  /** Parse a `.warc.gz` blob: real Common Crawl archives are NOT one
    * gzip stream but CONCATENATED PER-RECORD GZIP MEMBERS (ISO 28500
    * annex; the member boundary is what lets a reader seek to any
    * record without inflating the archive prefix, and lets a 100 TB
    * archive split across tasks at member boundaries). Walks members
    * with [[gunzipMembers]] and runs the Content-Length-framed record
    * walker over each member's plain bytes; a member holding several
    * records (legal, discouraged) still parses, and truncation follows
    * the same stop-don't-throw discipline as [[parse]]. */
  def parseGz(bytes: Array[Byte]): Seq[WarcRecord] =
    gunzipMembers(bytes).flatMap(parse)

  /** Split concatenated gzip members, inflating each independently and
    * walking to the next via the inflater's exact compressed-byte
    * count (+ the 8-byte CRC32/ISIZE trailer). Manual header walk
    * (RFC 1952: magic, CM=8, FLG with FEXTRA/FNAME/FCOMMENT/FHCRC,
    * MTIME/XFL/OS) because `GZIPInputStream` read-ahead buffering
    * hides member boundaries. Malformed or truncated trailing bytes
    * end the walk — a parser that throws loses the whole split, one
    * that stops loses one member. */
  def gunzipMembers(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    var ok = true
    def u8(p: Int): Int = bytes(p) & 0xff
    while (ok && i < bytes.length) {
      // ---- RFC 1952 member header
      if (i + 10 > bytes.length || u8(i) != 0x1f || u8(i + 1) != 0x8b ||
          u8(i + 2) != 8) { ok = false }
      else {
        val flg = u8(i + 3)
        var p = i + 10
        if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
          if (p + 2 > bytes.length) ok = false
          else p += 2 + (u8(p) | (u8(p + 1) << 8))
        }
        def skipZeroTerminated(): Unit = { // FNAME / FCOMMENT
          while (ok && p < bytes.length && bytes(p) != 0) p += 1
          if (p >= bytes.length) ok = false else p += 1
        }
        if (ok && (flg & 8) != 0) skipZeroTerminated()
        if (ok && (flg & 16) != 0) skipZeroTerminated()
        if (ok && (flg & 2) != 0) p += 2 // FHCRC
        if (ok && p <= bytes.length) {
          // ---- raw DEFLATE body
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(bytes, p, bytes.length - p)
          val buf = new Array[Byte](64 * 1024)
          val acc = new java.io.ByteArrayOutputStream()
          try {
            while (ok && !inf.finished()) {
              val n = inf.inflate(buf)
              if (n > 0) acc.write(buf, 0, n)
              else if (inf.needsInput()) ok = false // truncated member
            }
            if (ok) {
              val end = p + inf.getBytesRead.toInt + 8 // CRC32 + ISIZE
              if (end > bytes.length) ok = false // trailer truncated
              else { out += acc.toByteArray; i = end }
            }
          } catch {
            case _: java.util.zip.DataFormatException => ok = false
          } finally inf.end()
        } else ok = false
      }
    }
    out.toSeq
  }

  /** JVM twin of the [[record]] expression (same header bytes,
    * including the deterministic `urn:uuid:` record id) — for building
    * fixture members where the bytes must then pass through gzip,
    * which no Catalyst expression can do. */
  def recordBytes(recType: String, uri: String, payload: Array[Byte],
      date: String = "2026-01-01T00:00:00Z"): Array[Byte] = {
    val h = md5Hex((recType + " " + uri + " " + date + " " +
      md5Hex(payload)).getBytes("UTF-8"))
    val recordId = s"<urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}" +
      s"-${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}>"
    val head = ("WARC/1.0\r\nWARC-Type: " + recType + "\r\n" +
      "WARC-Record-ID: " + recordId + "\r\n" +
      "WARC-Target-URI: " + uri + "\r\n" +
      "WARC-Date: " + date + "\r\n" +
      "Content-Length: " + payload.length + "\r\n\r\n")
      .getBytes("US-ASCII")
    head ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** One gzip member around `bytes` (deterministic: Java's gzip header
    * is fixed MTIME=0/XFL=0, and DEFLATE at the default level is a
    * pure function of its input). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Lowercase md5 hex of payload bytes — the JVM twin of SQL
    * `md5(text)` (same bytes under UTF-8, same hex). */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }
}
