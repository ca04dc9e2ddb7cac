package graft.functions

import graft.SparkSuite
import graft.functions.MatchFunctions.multiMatchCounts
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks._

class MatchSpec extends SparkSuite {
  import spark.implicits._

  private def counts(text: String, pats: Seq[String]): Seq[Long] =
    Seq(text).toDF("t")
      .select(multiMatchCounts(col("t"), pats).as("c"))
      .collect().head.getSeq[Long](0)

  /** Naive per-pattern overlapping-occurrence counter (the oracle's
    * positional definition). */
  private def naive(text: String, pats: Seq[String]): Seq[Long] =
    pats.map(p => (0 to text.length - p.length)
      .count(i => text.startsWith(p, i)).toLong)

  test("overlapping occurrences are all counted") {
    assert(counts("aaaa", Seq("aa")) === Seq(3L))
    assert(counts("ababab", Seq("abab")) === Seq(2L))
  }

  test("suffix patterns fire via failure links") {
    // "key" must be found inside every "fast key" too
    val c = counts("fast key then key", Seq("fast key", "key"))
    assert(c === Seq(1L, 2L))
  }

  test("matches AC semantics on a table of cases") {
    val cases = Table(("text", "pats"),
      ("", Seq("x")),
      ("table table table", Seq("table table", "table")),
      ("the quick brown fox", Seq("quick", "own f", "fox", "q")),
      ("ababa", Seq("aba", "bab", "a", "ab")),
      ("ü über üü", Seq("ü", "üü")))
    forAll(cases) { (text, pats) =>
      assert(counts(text, pats) === naive(text, pats), s"text=$text")
    }
  }

  test("randomized equivalence with the naive counter") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(60))("ab" (rnd.nextInt(2))).mkString
      val pats = Seq("a", "b", "ab", "ba", "aba", "bb")
      assert(counts(text, pats) === naive(text, pats), s"text=$text")
    }
  }

  test("null text yields null counts; codegen and interpreted agree") {
    val df = Seq(Some("aa"), None).toDF("t")
      .select(multiMatchCounts(col("t"), Seq("a")).as("c"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0) === Seq(2L))
    assert(rows(1).isNullAt(0))
  }
}
