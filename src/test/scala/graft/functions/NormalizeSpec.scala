package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  // explicit escapes throughout: a raw decomposed literal could be
  // silently re-composed by an editor and the test would test nothing
  private val Decomposed = "cafe\u0301"        // e + combining acute
  private val Precomposed = "caf\u00e9"        // precomposed e-acute

  test("NFC composes decomposed sequences and is idempotent") {
    val df = Seq(
      Decomposed,
      Precomposed,
      "plain ascii",
      "A\u030angstro\u0308m"                  // A+ring, o+diaeresis
    ).toDF("s")
    val out = df.select(NormalizeFunctions.nfc(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) === Precomposed)
    assert(out(1) === Precomposed)
    assert(out(2) === "plain ascii")
    assert(out(3) === "\u00c5ngstr\u00f6m")
    // idempotent: normalizing the output changes nothing
    val again = out.toSeq.toDF("s")
      .select(NormalizeFunctions.nfc(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(again.toSeq === out.toSeq)
  }

  test("NFKC folds compatibility forms NFC leaves alone") {
    val df = Seq("\ufb01le", "\u2460 item").toDF("s") // fi-ligature, circled 1
    val nfc = df.select(NormalizeFunctions.nfc(col("s")).as("n"))
      .collect().map(_.getString(0))
    val nfkc = df.select(NormalizeFunctions.nfkc(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(nfc(0) === "\ufb01le")   // NFC preserves the ligature
    assert(nfkc(0) === "file")      // NFKC expands it
    assert(nfkc(1) === "1 item")
  }

  test("nulls pass through; normalization survives interpreted eval") {
    val df = Seq(Some(Decomposed), None).toDF("s")
    val out = df.select(NormalizeFunctions.nfc(col("s")).as("n")).collect()
    assert(out(0).getString(0) === Precomposed)
    assert(out(1).isNullAt(0))
    // interpreted path (eval, not codegen) agrees
    val expr = UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Decomposed),
      "NFC")
    assert(expr.eval(null).toString === Precomposed)
  }
}
