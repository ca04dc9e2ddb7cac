package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Pins the BpeEncode kernel to the chained-replace formulation it
  * replaces: for any TRAINED merge list (pairs counted over the
  * current symbol inventory, so a pair can only use symbols that exist
  * when it is learned) the greedy lowest-rank loop must produce
  * exactly the sequential `replace` chain's tokens — the equivalence
  * the q_bpe_encode oracle (unrolled replace CTEs) relies on. */
class BpeSpec extends SparkSuite {

  /** Reference semantics: the '|sym|' string encoding put through one
    * literal left-to-right non-overlapping replace per merge, in rank
    * order — exactly what q_bpe_encode shipped as chained expressions
    * (and what the DuckDB oracle still unrolls). */
  private def chainApply(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var seq = word.map(c => s"|$c|").mkString
    merges.foreach { case (l, r) =>
      seq = seq.replace(s"|$l||$r|", s"|$l$r|")
    }
    if (seq.isEmpty) Seq.empty
    else seq.substring(1, seq.length - 1).split("\\|\\|").toSeq
  }

  /** Local BPE trainer with bpeTrain's exact rules: pair counts over
    * current symbols weighted by word freq (every adjacent position),
    * best pair by (count desc, left asc, right asc), applied as the
    * same string replace. */
  private def trainLocal(wordFreq: Seq[(String, Long)],
      rounds: Int): Seq[(String, String)] = {
    var cur = wordFreq.map { case (w, f) => (w.map(c => s"|$c|").mkString, f) }
    val merges = Seq.newBuilder[(String, String)]
    for (_ <- 1 to rounds) {
      val counts = mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      cur.foreach { case (seq, f) =>
        val sy =
          if (seq.isEmpty) Array.empty[String]
          else seq.substring(1, seq.length - 1).split("\\|\\|")
        var i = 0
        while (i < sy.length - 1) {
          counts((sy(i), sy(i + 1))) += f
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val (l, r) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
        merges += ((l, r))
        cur = cur.map { case (seq, f) =>
          (seq.replace(s"|$l||$r|", s"|$l$r|"), f)
        }
      }
    }
    merges.result()
  }

  private def kernelApply(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val arr = BpeEncode.compute(UTF8String.fromString(word),
      new BpeMergeTable(merges.toArray))
    (0 until arr.numElements()).map(i =>
      arr.getUTF8String(i).toString)
  }

  test("kernel ≡ replace chain on randomly trained merge lists") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      // small alphabet forces heavy pair collisions + deep merges
      val alpha = "abcd".take(2 + trial % 3)
      val words = Seq.fill(30)(
        (0 until (1 + rnd.nextInt(12)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val freqs = words.groupBy(identity).toSeq
        .map { case (w, g) => (w, g.size.toLong * (1 + rnd.nextInt(5))) }
      val merges = trainLocal(freqs, rounds = 10)
      freqs.foreach { case (w, _) =>
        assert(kernelApply(w, merges) === chainApply(w, merges),
          s"trial $trial word '$w' merges $merges")
      }
    }
  }

  test("kernel ≡ replace chain through the DataFrame/codegen path") {
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(200)(
      (0 until (1 + rnd.nextInt(10)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val merges = trainLocal(words.map((_, 1L)), rounds = 8)
    import spark.implicits._
    val got = words.toDF("word")
      .select(col("word"),
        BpeFunctions.bpeEncode(col("word"), merges).as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) === chainApply(w, merges), s"word '$w'")
    }
  }

  test("1000-merge vocabulary: constant plan depth, correct encode") {
    // constructively valid training order: each merge's left symbol is
    // the previous merge's output, so symbols exist before use
    val letters = ('a' to 'z').map(_.toString)
    val pairMerges = for (a <- letters; b <- letters.take(26))
      yield (a, b) // 676 single-char pair merges (valid: chars exist)
    val chain = mutable.Buffer.empty[(String, String)]
    var sym = "ab"
    for (i <- 0 until 324) {
      val c = letters(i % 26)
      chain += ((sym, c)) // left symbol created by an earlier merge
      sym = sym + c
    }
    val merges = (pairMerges ++ chain).toSeq
    assert(merges.size === 1000)
    val rnd = new scala.util.Random(13)
    val words = Seq.fill(100)(
      (0 until (2 + rnd.nextInt(14)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString) ++
      Seq(sym, "ab" + sym) // exercise the deep chain
    words.foreach { w =>
      assert(kernelApply(w, merges) === chainApply(w, merges), s"word '$w'")
    }
  }

  test("degenerate inputs: empty and single-char words") {
    val merges = Seq(("a", "b"))
    assert(kernelApply("", merges) === Seq.empty)
    assert(kernelApply("a", merges) === Seq("a"))
    assert(kernelApply("ab", merges) === Seq("ab"))
  }
}
