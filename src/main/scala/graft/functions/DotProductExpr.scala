package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native sequential-fold dot product over two numeric arrays:
  * `acc_i = acc_{i-1} + a_i * b_i`, left to right, elements promoted to
  * double — EXACTLY the fold `aggregate(zip_with(a,b,(x,y)->x*y),0,+)`
  * computes and the DuckDB oracle's `list_reduce` mirrors, so results
  * stay bit-identical while dropping the higher-order-function
  * machinery (per-row lambda invocation + intermediate array
  * allocation), which dominates brute-force similarity scans.
  *
  * A null ELEMENT makes the result null — the same answer the HOF fold
  * gives (`zip_with` emits a null product, `aggregate` nulls the sum) —
  * instead of reading the null slot's placeholder bytes as garbage.
  * The per-element null check is emitted only when the array type's
  * containsNull flag says nulls are possible. Length = min(|a|,|b|).
  * `doGenCode` emits the loop inline into whole-stage codegen.
  */
case class DotProductFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // a null ELEMENT nulls the result, so the expression is nullable even
  // when both array children are non-null columns
  override def nullable: Boolean =
    super.nullable || mayHaveNullElems(left) || mayHaveNullElems(right)

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs array<float|double> inputs, got $other")
    }

  private def mayHaveNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    val checkNulls = mayHaveNullElems(left) || mayHaveNullElems(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // emitted only when the schema admits null elements, so the
      // common containsNull=false case keeps the branch-free loop
      val nullCheck =
        if (mayHaveNullElems(left) || mayHaveNullElems(right))
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $getX * $getY;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
