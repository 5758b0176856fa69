package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a codegen expression — the text
  * prerequisite exact dedup silently needs: the SAME page arrives
  * precomposed from one crawler and decomposed from another ("é" as
  * U+00E9 vs e + U+0301), their md5 digests differ, and a byte-level
  * keep-first keeps both. Spark has no builtin normalizer; this wraps
  * `java.text.Normalizer` (the JDK's UAX #15 implementation, same
  * algorithm DuckDB's `nfc_normalize` implements, which is what the
  * oracle replays) behind the usual codegen shape.
  *
  * The hot path is `Normalizer.isNormalized`: real corpora are
  * overwhelmingly ASCII/already-NFC, and the check is a scan that
  * avoids rebuilding the string (the original UTF8String is returned
  * untouched). Forms NFC/NFD/NFKC/NFKD, validated at construction.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.forms.contains(form),
    s"UnicodeNormalize: unknown form $form (NFC/NFD/NFKC/NFKD)")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.norm(input.asInstanceOf[UTF8String], nf)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("nf", nf,
      classOf[java.text.Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UnicodeNormalize.norm($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  private val forms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Normalize, returning the INPUT UTF8String untouched when it is
    * already in the requested form (the dominant case).
    */
  def norm(u: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, form)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }

  def apply(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  /** NFC — the canonical-composition form web text should be stored
    * in, and the one DuckDB's nfc_normalize replays.
    */
  def nfc(c: Column): Column = apply(c, "NFC")
}
