package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSuite {
  import spark.implicits._

  private def build(recs: (String, String, String)*): Array[Byte] =
    recs.map { case (t, uri, payload) =>
      s"WARC/1.0\r\nWARC-Type: $t\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
        payload + "\r\n\r\n"
    }.mkString.getBytes("UTF-8")

  test("multi-record blobs round-trip: types, uris, lengths, payloads") {
    val b = build(
      ("response", "http://x/1", "hello world"),
      ("metadata", "http://x/1", "lang: en"))
    val got = Warc.parse(b)
    assert(got.map(_.recType) === Seq("response", "metadata"))
    assert(got.map(_.targetUri).distinct === Seq("http://x/1"))
    assert(got.map(r => new String(r.payload, "UTF-8")) ===
      Seq("hello world", "lang: en"))
    assert(got.map(_.contentLength) === Seq(11L, 8L))
  }

  test("Content-Length framing: a payload containing WARC/1.0 cannot desync") {
    val evil = "WARC/1.0\r\nWARC-Type: fake\r\n\r\n not a record"
    val b = build(("response", "u1", evil), ("response", "u2", "tail"))
    val got = Warc.parse(b)
    assert(got.size === 2)
    assert(new String(got.head.payload, "UTF-8") === evil)
    assert(got(1).targetUri === "u2")
  }

  test("truncated trailing record drops, parsed prefix survives") {
    val ok = build(("response", "u1", "abc"))
    val b = ok ++ "WARC/1.0\r\nContent-Length: 99\r\n\r\nshort"
      .getBytes("UTF-8")
    val got = Warc.parse(b)
    assert(got.size === 1 && got.head.targetUri === "u1")
  }

  test("expression builder ≡ the JVM byte layout (the oracle contract)") {
    val df = Seq((7L, "payload text", "en")).toDF("doc_id", "text", "lang")
    val blob = df.select(
      concat(Warc.record("response",
        concat(lit("http://c/"), col("doc_id").cast("string")),
        col("text"))).cast("binary").as("b"))
      .collect().head.getAs[Array[Byte]](0)
    val expect = Warc.recordBytes("response", "http://c/7",
      "payload text".getBytes("UTF-8"))
    assert(java.util.Arrays.equals(blob, expect))
    val r = Warc.parse(blob)
    assert(r.size === 1 && r.head.contentLength === 12L &&
      Warc.md5Hex(r.head.payload) ===
        Warc.md5Hex("payload text".getBytes("UTF-8")))
  }

  test("record carries mandatory ISO 28500 headers, deterministically") {
    val b = Warc.recordBytes("response", "http://c/1",
      "abc".getBytes("UTF-8"))
    val s = new String(b, "US-ASCII")
    assert(s.contains("WARC-Date: 2026-01-01T00:00:00Z\r\n"))
    val id = "WARC-Record-ID: <urn:uuid:([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12})>\r\n".r
    assert(id.findFirstIn(s).isDefined)
    // same record → same id; different payload → different id
    val b2 = Warc.recordBytes("response", "http://c/1",
      "abc".getBytes("UTF-8"))
    assert(java.util.Arrays.equals(b, b2))
    val b3 = Warc.recordBytes("response", "http://c/1",
      "abd".getBytes("UTF-8"))
    assert(id.findFirstMatchIn(s).get.group(1) !==
      id.findFirstMatchIn(new String(b3, "US-ASCII")).get.group(1))
  }

  // ------------------------------------------------ .warc.gz members

  test("gz: concatenated per-record members round-trip") {
    val blob =
      Warc.gzipMember(Warc.recordBytes("response", "u1",
        "hello world".getBytes("UTF-8"))) ++
      Warc.gzipMember(Warc.recordBytes("metadata", "u1",
        "lang: en".getBytes("UTF-8")))
    val got = Warc.parseGz(blob)
    assert(got.map(_.recType) === Seq("response", "metadata"))
    assert(got.map(r => new String(r.payload, "UTF-8")) ===
      Seq("hello world", "lang: en"))
  }

  test("gz: one member holding several records still parses") {
    val member = Warc.gzipMember(
      Warc.recordBytes("response", "u1", "a".getBytes("UTF-8")) ++
        Warc.recordBytes("response", "u2", "bb".getBytes("UTF-8")))
    assert(Warc.parseGz(member).map(_.targetUri) === Seq("u1", "u2"))
  }

  test("gz: truncated trailing member drops, parsed prefix survives") {
    val m1 = Warc.gzipMember(Warc.recordBytes("response", "u1",
      "abc".getBytes("UTF-8")))
    val m2 = Warc.gzipMember(Warc.recordBytes("response", "u2",
      "def".getBytes("UTF-8")))
    val blob = m1 ++ m2.take(m2.length / 2)
    val got = Warc.parseGz(blob)
    assert(got.size === 1 && got.head.targetUri === "u1")
  }

  test("gz: garbage between members ends the walk without throwing") {
    val m1 = Warc.gzipMember(Warc.recordBytes("response", "u1",
      "abc".getBytes("UTF-8")))
    val blob = m1 ++ "not gzip at all".getBytes("UTF-8")
    val got = Warc.parseGz(blob)
    assert(got.size === 1 && got.head.targetUri === "u1")
  }

  test("gz: FNAME-flagged member header walks correctly") {
    // splice an FNAME (filename + NUL) into a standard member: set
    // FLG bit 3 and insert the name after the 10-byte fixed header
    val plain = Warc.recordBytes("response", "u9", "xyz".getBytes("UTF-8"))
    val m = Warc.gzipMember(plain)
    val named = m.take(3) ++ Array[Byte]((m(3) | 8).toByte) ++
      m.slice(4, 10) ++ "file.warc".getBytes("US-ASCII") ++
      Array[Byte](0) ++ m.drop(10)
    val got = Warc.parseGz(named)
    assert(got.size === 1 &&
      new String(got.head.payload, "UTF-8") === "xyz")
  }
}
