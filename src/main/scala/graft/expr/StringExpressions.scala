package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility normalization (NFC/NFD/NFKC/NFKD) as
  * a codegen'd Catalyst expression.
  *
  * Spark ships no normalization builtin, and a Scala UDF would break
  * whole-stage codegen right at the top of every text-cleaning chain —
  * this stays inside the generated code (the JDK `java.text.Normalizer`
  * call is inlined directly; it is the same ICU-derived implementation
  * DuckDB's `nfc_normalize` follows, so the q153 oracle replays it).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap quick-check scan
  * (ASCII and already-composed text — the overwhelming majority of a
  * web corpus — takes no allocation beyond the `toString`), so the
  * normalize-and-copy cost is paid only by rows that actually need it.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_unicode_normalize needs a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.valueOf(form))) {
      input
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val str = ctx.freshName("str")
      s"""
        java.lang.String $str = $a.toString();
        if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.$form)) {
          ${ev.value} = $a;
        } else {
          ${ev.value} = UTF8String.fromString(
            java.text.Normalizer.normalize($str, java.text.Normalizer.Form.$form));
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object StringExpressions {
  /** Column wrapper: Unicode-normalize a string column (default NFC —
    * the canonical-composition form DuckDB's `nfc_normalize` matches). */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
