package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — Spark has no
  * builtin normal-form function, and a Scala UDF would box every row
  * and fall out of whole-stage codegen. `doGenCode` emits a direct
  * `java.text.Normalizer` call (plus a cheap `isNormalized` fast path:
  * for the ASCII-dominated corpora of a real pipeline the quick-check
  * answers YES without allocating), so the expression fuses into the
  * surrounding projection.
  *
  * Engine parity: NFC is a Unicode-standard-defined deterministic
  * mapping; the JDK (ICU data) and DuckDB's `nfc_normalize`
  * (utf8proc) implement the same tables, so outputs are byte-equal —
  * the q152 oracle pins that end-to-end.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input — got $other")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str,
         |    java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = UTF8String.fromString(
         |    java.text.Normalizer.normalize($str,
         |      java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
