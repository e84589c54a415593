package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The md5 hex-prefix integer in one native step:
  * `conv(substring(md5(s), 1, nHex), 16, 10)` as a long — the engine's
  * reproducible-in-any-engine hash primitive ([[TextFunctions.hash16]]
  * at nHex=4, the id-tape 40-bit checksum at nHex=10).
  *
  * The composed form materializes the full 32-char hex string per row,
  * slices it, and re-parses the slice back to an integer; this computes
  * the digest once (reused thread-local MessageDigest) and reads the
  * value straight out of its first nHex/2 bytes — same value, no hex
  * string, no parse (guide §1.2 step 2). Value-identity: md5 hex is the
  * digest bytes big-endian, so the first nHex digits ARE the first
  * nHex/2 bytes as an unsigned big-endian integer.
  */
case class Md5PrefixLong(child: Expression, nHex: Int)
    extends UnaryExpression {

  require(nHex >= 2 && nHex <= 14 && nHex % 2 == 0,
    s"nHex must be even, in 2..14 (value must fit a signed long), got $nHex")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long needs a string input — got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.prefixLong(input.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Hash.prefixLong($c, $nHex);")

  override def prettyName: String = "md5_prefix_long"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash {
  /** MessageDigest is stateful and codegen reference objects are shared
    * across task threads — one digest per thread, reset per call. */
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def prefixLong(s: UTF8String, nHex: Int): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    val nBytes = nHex / 2
    while (i < nBytes) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v
  }
}
