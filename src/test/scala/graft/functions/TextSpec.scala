package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class TextSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens: whitespace split, empties removed") {
    val got = one("  a  b\tc ")
      .select(Text.tokens(col("text")).as("t")).collect()
      .head.getSeq[String](0)
    assert(got === Seq("a", "b", "c"))
  }

  test("wordShingles: k-grams distinct; short docs degrade to whole text") {
    val got = one("a b c d")
      .select(Text.wordShingles(col("text"), 3).as("s")).collect()
      .head.getSeq[String](0)
    assert(got === Seq("a b c", "b c d"))
    val short = one("a b")
      .select(Text.wordShingles(col("text"), 3).as("s")).collect()
      .head.getSeq[String](0)
    assert(short === Seq("a b"))
  }

  test("bpeish token count splits words and punctuation") {
    val got = one("don't stop, ever!")
      .select(Text.bpeishTokenCount(col("text")).as("n")).collect()
      .head.getLong(0)
    // don ' t stop , ever !  → 7
    assert(got === 7L)
  }

  test("normalized + fingerprint: case/punct/ws insensitive") {
    val df = Seq("Hello,  World!", "hello world", "other").toDF("text")
      .select(Text.fingerprintMd5(col("text")).as("fp")).collect()
      .map(_.getString(0))
    assert(df(0) === df(1))
    assert(df(0) !== df(2))
  }

  test("langId picks the profile with most marker hits; und on none") {
    val cases = Seq(
      "the cat sat on the mat and it was good" -> "en",
      "el gato y la casa de los niños" -> "es",
      "le chat est dans la maison et les jardins" -> "fr",
      "der hund und die katze ist im haus" -> "de",
      "的 了 是 我 不" -> "zh",
      "zzz qqq www" -> "und")
    val got = cases.map(_._1).toDF("text")
      .select(Text.langId(col("text")).as("l")).collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("quality score is in [0,1] and penalizes garbage") {
    val good = ("the quick brown fox jumps over the lazy dog and " * 8)
    val bad = "!!! ??? ### $$$ %%%"
    val df = Seq(good, bad).toDF("text")
      .select(Text.qualityScore(col("text")).as("q")).collect()
      .map(_.getDouble(0))
    assert(df.forall(q => q >= 0.0 && q <= 1.0))
    assert(df(0) > df(1))
  }
}
