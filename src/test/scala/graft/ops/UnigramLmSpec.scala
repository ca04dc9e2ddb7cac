package graft.ops

import graft.{SparkSuite, Tables}

class UnigramLmSpec extends SparkSuite {

  test("unigram LM: seed covers all corpus chars, EM keeps a " +
      "normalized distribution, result is partitioning-independent") {
    val docs = Tables.documents(spark, Sf0001)
    val words = UnigramLm.wordTable(docs).persist()
    try {
      val seed = UnigramLm.seedVocab(words)
      // every char of every kept word is a seed piece (the fallback
      // that keeps alpha_n > 0 for all words)
      val pieces = seed.map(_._1).toSet
      val chars = words.select("word").collect()
        .flatMap(_.getString(0).toSeq).map(_.toString).toSet
      assert(chars.subsetOf(pieces))
      // multi-char pieces are capped and real substrings
      val multi = seed.filter(_._1.length >= 2)
      assert(multi.size <= UnigramLm.TopMulti)
      assert(multi.forall(_._1.length <= UnigramLm.MaxPiece))
      val p0 = UnigramLm.initProbs(seed)
      assert(math.abs(p0.map(_._2).sum - 1.0) < 1e-4)
      assert(p0.forall(_._2 > 0))
      val p1 = UnigramLm.emRound(words, p0.toMap)
      // EM preserves the support and renormalizes
      assert(p1.map(_._1) === p0.map(_._1))
      assert(math.abs(p1.map(_._2).sum - 1.0) < 1e-4)
      assert(p1.forall(_._2 > 0))
      // pinned-round determinism: input partitioning changes nothing
      val p1b = UnigramLm.emRound(
        words.repartition(13).persist(), p0.toMap)
      assert(p1 === p1b)
    } finally words.unpersist()
  }

  test("unigram LM: forward-backward expected counts match exact " +
      "enumeration on a tiny corpus") {
    import spark.implicits._
    // corpus: "abab" x2, "ab" x3 — vocab {a, b, ab}
    val words = Seq(("abab", 2L), ("ab", 3L)).toDF("word", "freq")
    val probs = Map("a" -> 0.3, "b" -> 0.3, "ab" -> 0.4)
    val ec = UnigramLm.emRound(words, probs).toMap
    // exact enumeration for "ab": segs a|b (0.09), ab (0.4);
    // for "abab": a|b|a|b (0.0081), ab|a|b (0.036), a|b|ab (0.036),
    // ab|ab (0.16)
    val zAb = 0.09 + 0.4
    val zAbab = 0.0081 + 0.036 + 0.036 + 0.16
    def q(x: Double, s: Int) = {
      val p = math.pow(10, s); math.floor(x * p + 0.5) / p
    }
    // expected counts (freq-weighted: "a" appears 1x in a|b, 2x in
    // a|b|a|b, 1x in each mixed abab seg; "ab" 1x, 1x, 1x, 2x), then
    // the same q4 + piece-ASC renorm + q6 as the implementation;
    // tolerance is one q6 grid step (enumeration arithmetic differs
    // from forward-backward in final ulps)
    val ecA = 3 * (0.09 / zAb) +
      2 * ((2 * 0.0081 + 0.036 + 0.036) / zAbab)
    val ecB = ecA // symmetric
    val ecAb = 3 * (0.4 / zAb) +
      2 * ((0.036 + 0.036 + 2 * 0.16) / zAbab)
    val tot = q(ecA, 4) + q(ecAb, 4) + q(ecB, 4)
    assert(math.abs(ec("a") - q(q(ecA, 4) / tot, 6)) < 2e-6)
    assert(math.abs(ec("b") - q(q(ecB, 4) / tot, 6)) < 2e-6)
    assert(math.abs(ec("ab") - q(q(ecAb, 4) / tot, 6)) < 2e-6)
  }
}
