package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** functions.JaroWinkler — golden values captured from DuckDB 1.0's
  * jaro_winkler_similarity (the oracle engine), exact double equality:
  * the expression's whole claim is bit-identity with the oracle. */
class JaroWinklerSpec extends SparkSuite {
  import spark.implicits._

  private def jw(pairs: (String, String)*): Seq[Double] =
    pairs.toSeq.toDF("a", "b")
      .select(StringSim.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq

  test("golden values match DuckDB bit-for-bit") {
    val got = jw(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("JELLYFISH", "SMELLYFISH"), ("DWAYNE", "DUANE"),
      ("PREFIX", "PREFIXXXXX"), ("CRATE", "TRACE"),
      ("ABCVWXYZ", "CABVWXYZ"), ("AB", "A"),
      ("ABAB", "BABA"), ("ABCD", "BADC"))
    val want = Seq(
      0.9611111111111111, 0.8133333333333332,
      0.8962962962962964, 0.8400000000000001,
      0.92, 0.7333333333333334,
      0.9583333333333334, 0.8500000000000001,
      0.8333333333333334, 0.8333333333333334)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("boost threshold: no prefix bonus at jaro <= 0.7 " +
      "(DuckDB-pinned)") {
    // common prefixes but jaro below the 0.7 boost threshold: jw must
    // equal jaro exactly (DuckDB: 0.4166…, 0.6666…, 0.5555…)
    val got = jw(("ABCDEFGHIJKLMNOP", "ABZZZZZZZZZZZZZZ"), ("AB", "AC"),
      ("ABCDEF", "ABZZZZ"))
    assert(got === Seq(0.4166666666666667, 0.6666666666666666,
      0.5555555555555555))
  }

  test("degenerate window and empties") {
    // window 0 forbids cross-position matches; empty side scores 0
    assert(jw(("AB", "BA"), ("ABC", "BCA"), ("A", "B"), ("", "x"),
      ("x", ""), ("A", "A"), ("ABC", "ABC")) ===
      Seq(0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0))
  }

  test("symmetry and range on random-ish pairs") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 200).map { _ =>
      def s() = (1 to rnd.nextInt(9) + 1)
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      (s(), s())
    }
    val fwd = jw(pairs: _*)
    val bwd = jw(pairs.map(_.swap): _*)
    fwd.zip(bwd).foreach { case (f, b) => assert(f === b) }
    fwd.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }
}
