package graft.queries

import graft.SparkSuite

/** X294 byte-level BPE contract: byte-exact segmentation (the GPT-2
  * zero-<unk> guarantee), intra-character reassembly producing
  * valid-UTF-8 tokens, and the raw-single-byte fallback lane. */
class BpeBytesSpec extends SparkSuite {
  import spark.implicits._

  private def toks(seq: String): Seq[String] =
    seq.stripPrefix("|").stripSuffix("|").split("\\|\\|").toSeq

  private def hexToBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("segmentation is byte-lossless on multibyte words") {
    val words = Seq(("日本語", 50L), ("日本", 40L), ("🙂🙂", 30L),
      ("naïve", 20L), ("mixed日本text", 10L)).toDF("word", "freq")
    val (encoded, merges) = TextQueries.bpeTrainBytes(words, rounds = 6)
    assert(merges.size === 6)
    encoded.select("word", "seq").collect().foreach { r =>
      val bytes = toks(r.getString(1)).flatMap(hexToBytes)
      // concat of token bytes == the word's exact UTF-8 bytes: merge
      // boundaries can never lose, duplicate or reorder a byte, even
      // when a merge crosses a character boundary
      assert(bytes === r.getString(0).getBytes("UTF-8").toSeq,
        s"lossy segmentation for ${r.getString(0)}")
    }
  }

  test("single-char-word fixture: merges reassemble complete chars, " +
      "every token decodes to valid UTF-8 — no invalid boundaries") {
    // with one character per word, no pair can cross a char boundary,
    // so greedy merging rebuilds each char bottom-up: 2 merges for a
    // 3-byte CJK char, 3 for the 4-byte emoji, 1 for the 2-byte accent
    // = 8 rounds to full reassembly
    val words = Seq(("日", 50L), ("本", 40L), ("🙂", 30L), ("ï", 20L),
      ("a", 10L)).toDF("word", "freq")
    val (encoded, _) = TextQueries.bpeTrainBytes(words, rounds = 8)
    encoded.select("word", "seq").collect().foreach { r =>
      val ts = toks(r.getString(1))
      assert(ts.length === 1,
        s"word ${r.getString(0)} not fully merged: ${r.getString(1)}")
      val bytes = hexToBytes(ts.head)
      val decoded = new String(bytes, "UTF-8")
      // strict validity: decode → re-encode must round-trip (invalid
      // sequences would decode to U+FFFD and re-encode differently)
      assert(decoded.getBytes("UTF-8").toSeq === bytes.toSeq,
        s"token ${ts.head} is not valid UTF-8")
      assert(decoded === r.getString(0))
    }
  }

  test("UTF-8 fallback: never-merged symbols stay raw single bytes") {
    val words = Seq(("日本", 100L), ("zq", 1L)).toDF("word", "freq")
    val (encoded, merges) = TextQueries.bpeTrainBytes(words, rounds = 2)
    // both merges are spent on the dominant CJK word; the rare word
    // keeps its raw byte symbols — the zero-<unk> lane: EVERY string
    // is representable because the base alphabet is the bytes
    assert(merges.forall { case (_, l, r, _) =>
      !Set(l, r).exists(Set("7a", "71"))
    })
    val zq = encoded.filter($"word" === "zq").select("seq")
      .collect().head.getString(0)
    assert(toks(zq) === Seq("7a", "71"))
  }

  test("hex w0 encoding matches JVM UTF-8 bytes for 1-4 byte chars") {
    val words = Seq(("a", 1L), ("ï", 1L), ("日", 1L), ("🙂", 1L))
      .toDF("word", "freq")
    val (encoded, _) = TextQueries.bpeTrainBytes(words, rounds = 0)
    encoded.select("word", "seq").collect().foreach { r =>
      val expected = r.getString(0).getBytes("UTF-8")
        .map(b => f"${b & 0xff}%02x").mkString("|", "||", "|")
      assert(r.getString(1) === expected)
    }
  }
}
