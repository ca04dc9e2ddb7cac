package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** ops.Winnow — stateless winnowing (Schleimer et al. 2003): window
  * minima with rightmost ties, the density expectation, and the
  * paper's guarantee that any shared run ≥ w + k − 1 tokens shares a
  * fingerprint key. */
class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)], k: Int = 3, w: Int = 4)
      : Map[Long, Set[(Long, Long)]] =
    Winnow.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, w)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }

  test("brute-force reference: rightmost window minima, distinct") {
    val text = (1 to 40).map(i => s"tok${i * 7 % 11}").mkString(" ")
    val (k, w) = (3, 4)
    val got = fps(Seq((1L, text)), k, w)(1L)
    // reference: recompute keys as md5-60-bit and winnow in Scala
    val toks = text.split("\\s+").toSeq
    val keys = toks.sliding(k).map { g =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(g.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
    }.toVector
    val want = (0 to keys.size - w).map { s =>
      val win = keys.slice(s, s + w).zipWithIndex
        .map { case (h, i) => (h, (s + i + 1).toLong) }
      // rightmost minimum: min key, max pos among equal minima
      val mh = win.map(_._1).min
      val p = win.filter(_._1 == mh).map(_._2).max
      (p, mh)
    }.toSet
    assert(got === want)
  }

  test("guarantee: a shared run of w + k - 1 tokens shares a key " +
      "(SIGMOD 2003 correctness property)") {
    val (k, w) = (3, 4)
    val shared = (1 to (w + k - 1)).map(i => s"common$i").mkString(" ")
    val a = s"alpha beta gamma $shared delta epsilon"
    val b = s"one two $shared three four five six seven"
    val m = fps(Seq((1L, a), (2L, b)), k, w)
    val keysA = m(1L).map(_._2)
    val keysB = m(2L).map(_._2)
    assert((keysA intersect keysB).nonEmpty,
      "shared >= w+k-1 run must share at least one fingerprint key")
  }

  test("density sits near the 2/(w+1) expectation on random-ish text") {
    val docs = (1L to 20L).map { d =>
      d -> (1 to 200).map(i => s"w${(i * 31 + d * 17) % 9973}")
        .mkString(" ")
    }
    val st = Winnow.stats(docs.toDF("doc_id", "text"), "doc_id", "text",
        3, 8)
      .agg(sum("n_fp").cast("double") / sum("n_grams").cast("double"))
      .head().getDouble(0)
    val expected = 2.0 / 9.0
    assert(st > expected * 0.6 && st < expected * 1.6,
      s"density $st vs expected $expected")
  }

  test("short docs: one whole-doc window; sub-k docs vanish") {
    val m = fps(Seq(
      (1L, "a b c d"),       // 2 grams < w -> single window of 2
      (2L, "a b")), k = 3, w = 8)       // < k tokens -> no grams
    assert(m(1L).size === 1)
    assert(!m.contains(2L))
  }
}
