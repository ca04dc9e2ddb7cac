package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization — the first stage of text canonicalization in
  * a multilingual corpus build: the same visible string can arrive as
  * precomposed codepoints (é = U+00E9) or base+combining sequences
  * (e + U+0301), and every downstream exact device (hash dedup,
  * fingerprints, token counts, banlists) silently misses matches until
  * the forms are unified. Spark has no built-in for this; the JDK's
  * `java.text.Normalizer` implements the standard UAX #15 algorithm,
  * wrapped here as a codegen'd unary expression so it stays inside
  * whole-stage codegen like any other string function.
  *
  * Cross-engine note: NFC/NFKC results are covered by Unicode's
  * normalization stability policy, so an oracle engine's
  * `nfc_normalize` agrees byte-for-byte on assigned codepoints.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form $form")

  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_normalize_${form.toLowerCase}"
  override def nullable: Boolean = true

  @transient private lazy val javaForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], javaForm)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normForm", javaForm,
      classOf[java.text.Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UnicodeNormalize.compute($c, $ref);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnicodeNormalize {
  /** Static kernel called from generated code. Short-circuits on
    * already-normal strings (the overwhelmingly common case in a
    * mostly-ASCII corpus — isNormalized is a cheap scan that avoids
    * the allocation). */
  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

object NormalizeFunctions {
  def nfc(c: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), "NFC"))
  def nfkc(c: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), "NFKC"))
}
