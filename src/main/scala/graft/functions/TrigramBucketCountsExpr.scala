package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-n-gram bucket HISTOGRAM in one pass — the fused form of
  * [[graft.operators.LangId.featurize]]'s feature counting:
  *
  *   counts[b] = |{ i : pmod(hash16(charNgram_i), buckets) = b }|
  *
  * with hash16 = the md5 hex prefix ([[TextFunctions.hash16]]: the
  * first four hex digits as an integer, i.e. the digest's first two
  * bytes) and charNgram_i the i-th CHARACTER n-gram
  * ([[TextFunctions.charNgrams]]: code points, not bytes — identical
  * for ASCII, and the md5 runs over the gram's UTF-8 bytes exactly as
  * Spark's `md5(substr(...))` does, so the value matches for any
  * input).
  *
  * The composed column form walked the text buckets+2 times per row:
  * one `transform` building a per-gram string array, one md5 pass, and
  * then `buckets` × `size(filter(...))` scans — every pass an
  * interpreted higher-order function allocating a lambda result per
  * element (guide §1.2 step 2 / the q228 HOF→native lesson). This is
  * one compiled loop: per gram, one md5 over a reused thread-local
  * digest and one counter bump; no per-gram string, no intermediate
  * array, no 16 filter scans. A text shorter than n chars yields the
  * all-zero histogram — exactly the composed form's empty gram array.
  *
  * Output: array<long> of length `buckets` (sum = the gram count, so
  * the caller derives the feature denominator from the histogram
  * instead of a separate size() pass). Null input → null, matching
  * the composed form (null text nulls every feature).
  */
case class TrigramBucketCounts(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigram_bucket_counts needs a string input — got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    evalText(input.asInstanceOf[UTF8String])

  /** Shared interpreted/codegen kernel (r16: the CodegenFallback this
    * replaced broke the WholeStageCodegen span of every featurize
    * stage and paid per-row boxing at the fallback boundary — guide
    * §1.2 step 2, the Md5PrefixExpr pattern). Never null for non-null
    * input: a short text yields the all-zero histogram. */
  def evalText(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Long](buckets)
    // code-point boundaries: offs(c) = byte offset of char c; the
    // composed form's substr() slices by chars (UTF8String semantics)
    val nBytes = bytes.length
    var nChars = 0
    var off = 0
    val offs = new Array[Int](nBytes + 1)
    while (off < nBytes) {
      offs(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    offs(nChars) = nBytes
    if (nChars >= n) {
      val md = TrigramBucketCounts.digest.get()
      var i = 0
      val last = nChars - n
      while (i <= last) {
        md.reset()
        md.update(bytes, offs(i), offs(i + n) - offs(i))
        val d = md.digest()
        // hash16 = conv(substring(md5_hex, 1, 4), 16, 10): the first
        // four hex digits = the digest's first two bytes, unsigned
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        counts(h % buckets) += 1L
        i += 1
      }
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // instance state (n, buckets) rides in as a reference object; the
    // generated call stays one virtual dispatch per row
    val ref = ctx.addReferenceObj("trigramBucketCounts", this,
      classOf[TrigramBucketCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalText($c);")
  }

  override def prettyName: String = "trigram_bucket_counts"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramBucketCounts {
  /** MessageDigest is stateful and expression instances are shared
    * across task threads — one digest per thread, reset per gram. */
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
