package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's ~20 calculated business fields (SURVEY §2j, PDF p.9)
  * as pure `Column` builders — composable into any plan, fully
  * codegen'd, no UDFs.
  *
  * Generic cores first (reusable over any dataset), then the
  * school-domain wrappers matching the reference field-for-field.
  * Fallback (`coalesce`) variants implement the commented spec the
  * reference documents but never coded (ref `:867`, `:879-881`, `:892`,
  * `:900-901`, `:963-965`, `:977-978` — SURVEY §2j note).
  */
object Derive {

  // ---- generic cores ----

  /** a+b as doubles, with an already-summed fallback column when either
    * split is null (the reference's spec'd coalesce fallback). */
  def sumWithFallback(a: Column, b: Column, fallback: Column): Column =
    coalesce(a.cast("double") + b.cast("double"), fallback.cast("double"))

  /** Ratio with NULL (not error) on null/zero denominator — the
    * documented divergence from T-SQL's div-by-zero error (SURVEY §7
    * risk list). */
  def ratioOrNull(num: Column, den: Column): Column =
    num.cast("double") / nullif(den.cast("double"), lit(0.0))

  /** Zero-pad to fixed width (ref F3 `:853-856`: the whole
    * `CASE WHEN len(id)=6 … RIGHT('000000'+id,6)` collapses to lpad). */
  def zeroPad(c: Column, width: Int): Column =
    lpad(c.cast("string"), width, "0")

  /** Y/N flag concatenation (ref F2 `:817-823`). T-SQL's CONCAT()
    * treats NULL as '' (unlike its `+` operator), so a blank flag keeps
    * its `label=` segment with an empty value — matched here with
    * coalesce; without it concat_ws would silently drop the whole
    * segment and shift the string. */
  def flagSummary(labeled: Seq[(String, Column)]): Column =
    concat_ws(", ", labeled.map { case (l, c) =>
      concat(lit(s"$l="), coalesce(c, lit("")))
    }: _*)

  /** Null backfill — the *intent* of ref `:951-952`, whose coded form
    * (`SET School_Year = 17-18 WHERE School_Year = NULL`) is a double
    * bug: integer arithmetic yields -1 and `= NULL` matches nothing.
    * Implemented as the spec'd coalesce; divergence recorded here. */
  def backfill(c: Column, default: String): Column =
    coalesce(c, lit(default))

  // ---- school-domain wrappers (reference field-for-field) ----

  /** School Type-Original (ref `:800-811`). */
  def schoolTypeOriginal(isPublic: Column, schoolType: Column): Column =
    when(isPublic === "YES" && schoolType =!= "RCCI", "Public")
      .when(isPublic === "YES" && schoolType === "RCCI", "Public-RCCI")
      .when(isPublic === "NO" && schoolType =!= "RCCI", "Nonpublic")
      .when(isPublic === "NO" && schoolType === "RCCI", "Nonpublic-RCCI")
      .otherwise(lit(null))

  /** Breakfast Delivery Model from State Agency-Original (ref
    * `:817-825`): `O=…, P=…, C=…, R=…, G=…, T=…` from the six Y/N
    * model flags. */
  def breakfastDeliveryModel(traditional: Column, midMorning: Column,
      classroom: Column, reducedPrice: Column, grabNGo: Column,
      free: Column): Column =
    flagSummary(Seq("O" -> traditional, "P" -> midMorning,
      "C" -> classroom, "R" -> reducedPrice, "G" -> grabNGo, "T" -> free))

  /** FR Lunch/Breakfast Meals (ref `:873-875`, `:894-896`) with the
    * spec'd combined-column fallback (ref `:867`, `:892`). */
  def frMeals(free: Column, reduced: Column, combined: Column): Column =
    sumWithFallback(free, reduced, combined)

  /** FR ADP = meals / operating days, with the spec'd generic
    * operating-days fallback (ref `:885-887`, `:904-906`, `:879-881`,
    * `:900-901`). */
  def frAdp(meals: Column, daysSpecific: Column, daysGeneric: Column): Column =
    ratioOrNull(meals, coalesce(daysSpecific.cast("double"),
      daysGeneric.cast("double")))

  /** Unique ID = 'WI'-'0'+SchoolID-DistrictID (ref `:914-919`). */
  def uniqueId(state: Column, schoolId: Column, districtId: Column): Column =
    concat_ws("-", state, concat(lit("0"), schoolId), districtId)

  /** NCES ID: zero-padded district id (ref `:930-936`; the reference
    * notes it *should* come from the NCES file, `:926-928` — divergence
    * inherited deliberately, SURVEY §7). */
  def ncesId(districtId: Column): Column = zeroPad(districtId, 6)

  /** FR Enrollment (ref `:967-970`) with spec'd fallback (`:963-965`). */
  def frEnrollment(enrollFree: Column, enrollReduced: Column,
      combined: Column): Column =
    sumWithFallback(enrollFree, enrollReduced, combined)

  /** FR Enrollment Percentage (ref `:981-988`): CEP=N → FR/Total;
    * CEP=Y → Free/(Free+Paid). */
  def frEnrollmentPct(cep: Column, frEnroll: Column, total: Column,
      free: Column, paid: Column): Column =
    when(cep === "N", ratioOrNull(frEnroll, total))
      .when(cep === "Y", ratioOrNull(free,
        free.cast("double") + paid.cast("double")))
      .otherwise(lit(null))

  /** School Level-Standardized (ref `:996-1015`): 8-way recode. */
  def schoolLevelStandardized(level: Column): Column =
    when(level === "High School", "High")
      .when(level === "Elementary School", "Elementary")
      .when(level === "Middle School", "Middle")
      .when(level === "Junior H.S", "Middle")
      .when(level === "Elementary/Sec Combined", "Other")
      .when(level === "RCCI", "Other")
      .when(level === "Unknown", "Other")
      .when(level.isNull, lit(null))
      .otherwise("Other")

  /** School Type-Standardized (ref `:1022-1031`): 4-way recode. */
  def schoolTypeStandardized(typeOriginal: Column): Column =
    when(typeOriginal === "Public", "Public")
      .when(typeOriginal === "Nonpublic", "Private")
      .when(typeOriginal.isin("Public-RCCI", "Nonpublic-RCCI"), "RCCI")
      .otherwise(lit(null))
}
