package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash over a string's bytes:
  * `acc_i = (acc_{i-1} * base + byte_i) mod m` — the document
  * fingerprint primitive.
  *
  * The higher-order-function formulation
  * (`aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s,i,1))), …)`)
  * is O(n²) per document because each `substr(s, i, 1)` rescans the
  * string; this expression is a single O(n) byte loop, and
  * `doGenCode` emits that loop inline so it fuses into whole-stage
  * codegen with the surrounding projection. Equal to the HOF form for
  * ASCII input (byte value == code point), which is the corpus contract.
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  require(base > 0 && mod > 0, s"base and mod must be positive, got base=$base mod=$mod")
  // acc ≤ mod-1 between steps; acc*base + 255 must stay in 64 bits or
  // the hash silently wraps (mod=0 would divide by zero per row)
  require(mod - 1 <= (Long.MaxValue - 255L) / base,
    s"base=$base mod=$mod would overflow the 64-bit accumulator")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs a string input — got $other")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xffL)) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * ${base}L + ($bytes[$i] & 0xffL)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override def prettyName: String = "rolling_hash"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
