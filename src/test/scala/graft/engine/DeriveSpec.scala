package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class DeriveSpec extends SparkSuite {
  import spark.implicits._

  test("sumWithFallback: split sum when present, combined otherwise (ref :867)") {
    val df = Seq(
      (Some("10"), Some("5"), Some("99")),
      (None, Some("5"), Some("80")),
      (None: Option[String], None: Option[String], Some("70")))
      .toDF("a", "b", "fb")
      .select(Derive.sumWithFallback(col("a"), col("b"), col("fb")).as("v"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(15.0, 80.0, 70.0))
  }

  test("ratioOrNull: NULL on zero/null denominator (T-SQL divergence doc'd)") {
    val df = Seq(("10", "4"), ("10", "0"), ("10", null))
      .toDF("n", "d")
      .select(Derive.ratioOrNull(col("n"), col("d")).as("v"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(2.5), None, None))
  }

  test("zeroPad matches the reference CASE/RIGHT idiom (ref :853-856)") {
    val df = Seq("42", "123456", "1234567").toDF("id")
      .select(Derive.zeroPad(col("id"), 6).as("v"))
    // overlength: lpad keeps the LEFTMOST 6 (T-SQL RIGHT would keep the
    // rightmost) — divergence is unreachable for the 4-6 digit district
    // ids the reference pads (FIXTURES.md A2), asserted here to pin it
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("000042", "123456", "123456"))
  }

  test("breakfastDeliveryModel concat (ref :817-825)") {
    val df = Seq(("Y", "N", "N", "N", "Y", "N"))
      .toDF("t", "m", "c", "r", "g", "f")
      .select(Derive.breakfastDeliveryModel(col("t"), col("m"), col("c"),
        col("r"), col("g"), col("f")).as("v"))
    assert(df.collect().head.getString(0) ===
      "O=Y, P=N, C=N, R=N, G=Y, T=N")
  }

  test("breakfastDeliveryModel keeps empty segments for NULL flags (T-SQL CONCAT)") {
    // blank TSV field -> null column; T-SQL CONCAT() renders '' not NULL
    val df = Seq((Option.empty[String], Some("N"), Some("N"), Some("N"),
      Some("Y"), Some("N")))
      .toDF("t", "m", "c", "r", "g", "f")
      .select(Derive.breakfastDeliveryModel(col("t"), col("m"), col("c"),
        col("r"), col("g"), col("f")).as("v"))
    assert(df.collect().head.getString(0) ===
      "O=, P=N, C=N, R=N, G=Y, T=N")
  }

  test("schoolTypeOriginal 4-way (ref :800-811)") {
    val df = Seq(("YES", "Regular"), ("YES", "RCCI"), ("NO", "Regular"),
      ("NO", "RCCI")).toDF("p", "t")
      .select(Derive.schoolTypeOriginal(col("p"), col("t")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("Public", "Public-RCCI", "Nonpublic", "Nonpublic-RCCI"))
  }

  test("schoolLevelStandardized 8-way (ref :996-1015)") {
    val in = Seq("High School", "Elementary School", "Middle School",
      "Junior H.S", "Elementary/Sec Combined", "RCCI", "Unknown", "Weird")
    val df = in.toDF("l")
      .select(Derive.schoolLevelStandardized(col("l")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("High", "Elementary", "Middle", "Middle", "Other", "Other",
        "Other", "Other"))
  }

  test("frEnrollmentPct CEP branch (ref :981-988)") {
    val df = Seq(("N", "200", "400", "60", "10"),
      ("Y", "200", "400", "60", "10"),
      ("X", "200", "400", "60", "10"))
      .toDF("cep", "fr", "total", "free", "paid")
      .select(Derive.frEnrollmentPct(col("cep"), col("fr"), col("total"),
        col("free"), col("paid")).as("v"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(0.5), Some(60.0 / 70.0), None))
  }

  test("backfill implements the intent of the reference's buggy UPDATE (ref :951-952)") {
    val df = Seq(Some("16-17"), None).toDF("y")
      .select(Derive.backfill(col("y"), "17-18").as("v"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("16-17", "17-18"))
  }
}
