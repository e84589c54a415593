package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 2-D Morton (z-order) interleave: bit i of `left` lands at
  * output position 2i, bit i of `right` at 2i+1, for the low `bits`
  * bits of each input. Sorting or range-partitioning a table by this
  * value clusters rows that are close in BOTH dimensions into the same
  * files, so min/max (row-group / file) statistics prune
  * two-dimensional predicates — the lake-layout trick single-column
  * sorting cannot express. A layout write is
  * `df.repartitionByRange(n, col("z")).sortWithinPartitions("z")`.
  *
  * Like [[RollingHash]], `doGenCode` emits the bit loop inline so the
  * computation fuses into whole-stage codegen; the HOF formulation
  * (aggregate over a sequence of bit positions) would allocate an
  * array per row. */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 32, s"bits must be in [1, 32], got $bits")

  // analysis-time type gate: without it an int column passes analysis,
  // then the interpreted path ClassCastExceptions while codegen
  // silently computes — and the two disagree
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"z_order needs (bigint, bigint) inputs — got $other (cast ints to bigint)")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any): Any = {
    val a = x.asInstanceOf[Long]
    val b = y.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override def prettyName: String = "z_order"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Column-API entry: `zorder(col("x"), col("y"))`. */
  def zorder(x: org.apache.spark.sql.Column,
             y: org.apache.spark.sql.Column, bits: Int = 16):
      org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(ZOrder2(
      GraftExpressionBridge.expression(x),
      GraftExpressionBridge.expression(y), bits))
  }
}
