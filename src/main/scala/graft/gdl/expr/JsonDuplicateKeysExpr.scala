package graft.gdl.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression exposing [[StrictJson]]'s duplicate-key detection
  * to SQL/DataFrame plans (SURVEY O-18): returns the array of duplicated
  * object keys in encounter order, `["__PARSE_ERROR__"]` for malformed
  * input, empty array for a clean document. Spark's own `from_json`
  * silently keeps the last duplicate — this is the capability gap the
  * expression closes (reference:
  * /root/reference/backend/check_stac_metadata/utils.py:154-171).
  *
  * `CodegenFallback` is deliberate: the body is a Jackson token walk, so
  * there is nothing to gain from inline codegen, and fallback expressions
  * still participate in whole-stage-codegen'd plans via eval.
  */
case class JsonDuplicateKeys(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val out = StrictJson.parse(input.asInstanceOf[UTF8String].toString)
    val items =
      if (out.parseError.isDefined) Seq("__PARSE_ERROR__") else out.duplicateKeys
    ArrayData.toArrayData(items.map(UTF8String.fromString).toArray)
  }

  override def prettyName: String = "json_duplicate_keys"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonDuplicateKeys {
  /** Register `json_duplicate_keys` in the session's function registry so
    * both SQL text and `expr(...)` can use it. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_duplicate_keys", exprs => JsonDuplicateKeys(exprs.head), "built-in")

  def apply(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"json_duplicate_keys(${c.toString})")
  }
}
