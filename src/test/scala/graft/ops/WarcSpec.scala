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
    val expect = build(("response", "http://c/7", "payload text"))
    assert(java.util.Arrays.equals(blob, expect))
    val r = Warc.parse(blob)
    assert(r.size === 1 && r.head.contentLength === 12L &&
      Warc.md5Hex(r.head.payload) ===
        Warc.md5Hex("payload text".getBytes("UTF-8")))
  }
}
