package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Well-Known-Binary geometry codec (OGC SFA part 1, §8.2.7): the
  * interchange column format a geospatial lake stores footprints in
  * (GeoParquet's geometry encoding IS WKB). Two expressions:
  *
  *  - [[WkbEncode]] `wkb_encode(xs, ys)`: parallel coordinate arrays →
  *    WKB bytes, little-endian. One vertex → `Point` (type 1); ≥ 3 →
  *    single-ring `Polygon` (type 3) with the ring closed by
  *    repeating the first vertex, as the spec requires. 2 vertices or
  *    length mismatch → null (no valid WKB exists).
  *  - [[WkbDecode]] `wkb_decode(bin)`: WKB bytes → struct(gtype,
  *    xs, ys) — both byte orders accepted (the spec's reader
  *    contract), Polygon yields the OUTER ring with the closing
  *    repeat dropped (the [[graft.operators.Geometry]] ring form).
  *    Malformed/truncated/unsupported-type bytes → null, total on
  *    hostile input (the CrawlArchive discipline: a reader that
  *    throws on one bad row costs the scan).
  *
  * Integer-valued coordinates round-trip exactly (IEEE doubles are
  * exact below 2⁵³), which is what keeps the geometry tier's
  * predicates oracle-verifiable through a WKB round-trip.
  *
  * `CodegenFallback` is deliberate: byte packing/parsing gains nothing
  * from inline codegen, and fallback expressions still ride inside
  * whole-stage-codegen'd plans via eval.
  */
object Wkb {

  val PointType = 1L
  val PolygonType = 3L

  import org.apache.spark.sql.GraftExpressionBridge.{column, expression}

  /** Column DSL entry points. */
  def encode(xs: Column, ys: Column): Column =
    column(WkbEncode(expression(xs), expression(ys)))
  def decode(bin: Column): Column = column(WkbDecode(expression(bin)))

  val decodedType: StructType = StructType(Seq(
    StructField("gtype", LongType, nullable = false),
    StructField("xs", ArrayType(DoubleType, containsNull = false)),
    StructField("ys", ArrayType(DoubleType, containsNull = false))))

  private[graft] def encodeBytes(xs: Array[Double],
                                 ys: Array[Double]): Array[Byte] = {
    if (xs.length != ys.length || xs.length == 2 || xs.isEmpty) return null
    if (xs.length == 1) {
      val bb = java.nio.ByteBuffer.allocate(21)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).putInt(PointType.toInt)
        .putDouble(xs(0)).putDouble(ys(0))
      bb.array()
    } else {
      val n = xs.length + 1 // closing vertex
      val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 4 + 16 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).putInt(PolygonType.toInt).putInt(1).putInt(n)
      var i = 0
      while (i < xs.length) { bb.putDouble(xs(i)).putDouble(ys(i)); i += 1 }
      bb.putDouble(xs(0)).putDouble(ys(0))
      bb.array()
    }
  }

  /** (gtype, xs, ys) or null on any defect. */
  private[functions] def decodeBytes(
      b: Array[Byte]): (Long, Array[Double], Array[Double]) = {
    if (b == null || b.length < 5) return null
    val order = b(0) match {
      case 0 => java.nio.ByteOrder.BIG_ENDIAN
      case 1 => java.nio.ByteOrder.LITTLE_ENDIAN
      case _ => return null
    }
    val bb = java.nio.ByteBuffer.wrap(b, 1, b.length - 1).order(order)
    try {
      bb.getInt() match {
        case 1 => // Point
          if (bb.remaining() < 16) return null
          (PointType, Array(bb.getDouble()), Array(bb.getDouble()))
        case 3 => // Polygon: outer ring only, closing repeat dropped
          if (bb.remaining() < 8) return null
          val nRings = bb.getInt()
          if (nRings < 1) return null
          val n = bb.getInt()
          if (n < 4 || bb.remaining() < 16L * n) return null
          val xs = new Array[Double](n - 1)
          val ys = new Array[Double](n - 1)
          var i = 0
          while (i < n - 1) {
            xs(i) = bb.getDouble(); ys(i) = bb.getDouble(); i += 1
          }
          // the ring must actually close
          if (bb.getDouble() != xs(0) || bb.getDouble() != ys(0)) return null
          (PolygonType, xs, ys)
        case _ => null // unsupported geometry type
      }
    } catch {
      case _: java.nio.BufferUnderflowException => null
    }
  }
}

case class WkbEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wkb_encode needs array<double> inputs, got $other")
    }

  override protected def nullSafeEval(xsIn: Any, ysIn: Any): Any =
    Wkb.encodeBytes(xsIn.asInstanceOf[ArrayData].toDoubleArray(),
      ysIn.asInstanceOf[ArrayData].toDoubleArray())

  override def prettyName: String = "wkb_encode"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class WkbDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Wkb.decodedType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wkb_decode needs binary input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val out = Wkb.decodeBytes(input.asInstanceOf[Array[Byte]])
    if (out == null) null
    else InternalRow(out._1, new GenericArrayData(out._2),
      new GenericArrayData(out._3))
  }

  override def prettyName: String = "wkb_decode"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
