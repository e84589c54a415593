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
  val MultiPolygonType = 6L

  import org.apache.spark.sql.GraftExpressionBridge.{column, expression}

  /** Column DSL entry points. */
  def encode(xs: Column, ys: Column): Column =
    column(WkbEncode(expression(xs), expression(ys)))
  def decode(bin: Column): Column = column(WkbDecode(expression(bin)))

  /** Ring/geometry-aware codec (r14 VERDICT #3): flattened coordinate
    * arrays + `ringLens` (vertices per ring, no closing repeats) +
    * `polyLens` (RINGS per polygon — ring 0 of each polygon is its
    * outer ring, the rest are holes). One polygon → WKB `Polygon`
    * with its full ring structure; several → `MultiPolygon` (each
    * member a complete nested Polygon per OGC SFA §8.2.7, own
    * byte-order byte included). */
  def encodeGeom(xs: Column, ys: Column, ringLens: Column,
                 polyLens: Column): Column =
    column(WkbEncodeGeom(expression(xs), expression(ys),
      expression(ringLens), expression(polyLens)))
  def decodeGeom(bin: Column): Column =
    column(WkbDecodeGeom(expression(bin)))

  val decodedType: StructType = StructType(Seq(
    StructField("gtype", LongType, nullable = false),
    StructField("xs", ArrayType(DoubleType, containsNull = false)),
    StructField("ys", ArrayType(DoubleType, containsNull = false))))

  val decodedGeomType: StructType = StructType(Seq(
    StructField("gtype", LongType, nullable = false),
    StructField("xs", ArrayType(DoubleType, containsNull = false)),
    StructField("ys", ArrayType(DoubleType, containsNull = false)),
    StructField("ring_lens", ArrayType(LongType, containsNull = false)),
    StructField("poly_lens", ArrayType(LongType, containsNull = false))))

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

  /** Multi-ring / multi-polygon WKB bytes, or null when no valid WKB
    * exists (length mismatch, ring under 3 vertices, ring/poly count
    * mismatch). Little-endian throughout, every ring closed by
    * repeating its first vertex. */
  private[graft] def encodeGeomBytes(xs: Array[Double], ys: Array[Double],
                                     ringLens: Array[Long],
                                     polyLens: Array[Long]): Array[Byte] = {
    if (xs.length != ys.length || ringLens.isEmpty || polyLens.isEmpty)
      return null
    if (ringLens.exists(_ < 3) || ringLens.sum != xs.length ||
        polyLens.exists(_ < 1) || polyLens.sum != ringLens.length)
      return null
    val single = polyLens.length == 1
    val ringBytes = ringLens.map(l => 4 + 16 * (l + 1)).sum
    val polyHdr = 1 + 4 + 4 // order byte + type + ring count, per polygon
    val size =
      if (single) polyHdr + ringBytes.toInt
      else 1 + 4 + 4 + polyLens.length * polyHdr + ringBytes.toInt
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (!single)
      bb.put(1.toByte).putInt(MultiPolygonType.toInt).putInt(polyLens.length)
    var ring = 0
    var off = 0
    polyLens.foreach { nRings =>
      bb.put(1.toByte).putInt(PolygonType.toInt).putInt(nRings.toInt)
      var r = 0L
      while (r < nRings) {
        val n = ringLens(ring).toInt
        bb.putInt(n + 1)
        var i = 0
        while (i < n) { bb.putDouble(xs(off + i)).putDouble(ys(off + i)); i += 1 }
        bb.putDouble(xs(off)).putDouble(ys(off)) // closing repeat
        off += n
        ring += 1
        r += 1
      }
    }
    bb.array()
  }

  /** (gtype, xs, ys, ringLens, polyLens) with closing repeats dropped
    * and verified, or null on any defect — both byte orders, Point /
    * Polygon (all rings) / MultiPolygon (all members). Total on
    * hostile bytes. */
  private[graft] def decodeGeomBytes(b: Array[Byte]): (Long, Array[Double],
      Array[Double], Array[Long], Array[Long]) = {
    if (b == null || b.length < 5) return null
    try {
      val bb = java.nio.ByteBuffer.wrap(b)
      def order(): Boolean = {
        val o = bb.get()
        if (o == 0) { bb.order(java.nio.ByteOrder.BIG_ENDIAN); true }
        else if (o == 1) { bb.order(java.nio.ByteOrder.LITTLE_ENDIAN); true }
        else false
      }
      val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ys = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ringLens = scala.collection.mutable.ArrayBuffer.empty[Long]
      // reads one ring into the buffers; false on any defect
      def ring(): Boolean = {
        if (bb.remaining() < 4) return false
        val n = bb.getInt()
        if (n < 4 || bb.remaining() < 16L * n) return false
        val base = xs.length
        var i = 0
        while (i < n - 1) { xs += bb.getDouble(); ys += bb.getDouble(); i += 1 }
        if (bb.getDouble() != xs(base) || bb.getDouble() != ys(base))
          return false // the ring must actually close
        ringLens += (n - 1).toLong
        true
      }
      // reads one `Polygon` body (ring count + rings); ring count ≥ 1
      def polygonBody(): Long = {
        if (bb.remaining() < 4) return -1L
        val nRings = bb.getInt()
        if (nRings < 1) return -1L
        var r = 0
        while (r < nRings) { if (!ring()) return -1L; r += 1 }
        nRings.toLong
      }
      if (!order()) return null
      bb.getInt() match {
        case 1 =>
          if (bb.remaining() < 16) return null
          (PointType, Array(bb.getDouble()), Array(bb.getDouble()),
            Array(1L), Array(1L))
        case 3 =>
          val nRings = polygonBody()
          if (nRings < 0) return null
          (PolygonType, xs.toArray, ys.toArray, ringLens.toArray,
            Array(nRings))
        case 6 =>
          if (bb.remaining() < 4) return null
          val nPolys = bb.getInt()
          if (nPolys < 1) return null
          val polyLens = new Array[Long](nPolys)
          var p = 0
          while (p < nPolys) {
            // each member is a complete Polygon: order byte + type
            if (!order() || bb.getInt() != 3) return null
            val nRings = polygonBody()
            if (nRings < 0) return null
            polyLens(p) = nRings
            p += 1
          }
          (MultiPolygonType, xs.toArray, ys.toArray, ringLens.toArray,
            polyLens)
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

/** `wkb_encode_geom(xs, ys, ring_lens, poly_lens)` — multi-ring /
  * multi-polygon encode; see [[Wkb.encodeGeomBytes]]. */
case class WkbEncodeGeom(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wkb_encode_geom needs (array<double>, array<double>, " +
            s"array<long>, array<long>), got $other")
    }

  override protected def nullSafeEval(xs: Any, ys: Any, rl: Any,
                                      pl: Any): Any =
    Wkb.encodeGeomBytes(xs.asInstanceOf[ArrayData].toDoubleArray(),
      ys.asInstanceOf[ArrayData].toDoubleArray(),
      rl.asInstanceOf[ArrayData].toLongArray(),
      pl.asInstanceOf[ArrayData].toLongArray())

  override def prettyName: String = "wkb_encode_geom"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** `wkb_decode_geom(bin)` — ring/geometry-count-aware decode; see
  * [[Wkb.decodeGeomBytes]]. */
case class WkbDecodeGeom(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Wkb.decodedGeomType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wkb_decode_geom needs binary input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val out = Wkb.decodeGeomBytes(input.asInstanceOf[Array[Byte]])
    if (out == null) null
    else InternalRow(out._1, new GenericArrayData(out._2),
      new GenericArrayData(out._3), new GenericArrayData(out._4),
      new GenericArrayData(out._5))
  }

  override def prettyName: String = "wkb_decode_geom"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
