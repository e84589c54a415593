package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native evaluators for the geometry predicates — the same exact
  * integer formulas as the higher-order-function forms they replace
  * ([[graft.operators.Geometry]] keeps the HOF twins for the
  * differential spec), but evaluated as one tight loop per row
  * instead of per-element interpreted lambdas: the polygon-intersects
  * join evaluates up to |A|·|B| edge-pair orientation tests per
  * candidate, and lambda dispatch + boxed array churn dominated the
  * q228 profile (12.2 s at sf0.1; the DotProductFold lesson applied
  * to geometry). `CodegenFallback` — the loop body is already JVM-
  * tight; fallback expressions still ride inside codegen'd plans. */
object GeomPred {

  /** Upward ray cast, half-open crossings, division-free. */
  def pointInPolygon(px: Long, py: Long, xs: Array[Long],
                     ys: Array[Long]): Boolean = {
    val n = xs.length
    var crossings = 0
    var i = 0
    while (i < n) {
      val j = if (i == n - 1) 0 else i + 1
      val y1 = ys(i); val y2 = ys(j)
      if ((y1 > py) != (y2 > py)) {
        val x1 = xs(i); val x2 = xs(j)
        val lhs = (px - x1) * (y2 - y1)
        val rhs = (py - y1) * (x2 - x1)
        if (if (y2 > y1) lhs < rhs else lhs > rhs) crossings += 1
      }
      i += 1
    }
    (crossings & 1) == 1
  }

  private def orient(ax: Long, ay: Long, bx: Long, by: Long,
                     cx: Long, cy: Long): Long =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  private def onSeg(ax: Long, ay: Long, bx: Long, by: Long,
                    px: Long, py: Long): Boolean =
    math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  /** Closed segment intersection incl. collinear/endpoint touches —
    * sign comparisons only (no o1·o2 overflow). */
  def segmentsIntersect(p1x: Long, p1y: Long, p2x: Long, p2y: Long,
                        q1x: Long, q1y: Long, q2x: Long,
                        q2y: Long): Boolean = {
    val o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    val o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    val o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    val o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
      ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) ||
      (o1 == 0 && onSeg(p1x, p1y, p2x, p2y, q1x, q1y)) ||
      (o2 == 0 && onSeg(p1x, p1y, p2x, p2y, q2x, q2y)) ||
      (o3 == 0 && onSeg(q1x, q1y, q2x, q2y, p1x, p1y)) ||
      (o4 == 0 && onSeg(q1x, q1y, q2x, q2y, p2x, p2y))
  }

  /** Simple polygons intersect ⟺ some edge pair intersects or one
    * contains the other's first vertex (see Geometry's completeness
    * argument). */
  def polygonsIntersect(xsA: Array[Long], ysA: Array[Long],
                        xsB: Array[Long], ysB: Array[Long]): Boolean = {
    val nA = xsA.length
    val nB = xsB.length
    var i = 0
    while (i < nA) {
      val i2 = if (i == nA - 1) 0 else i + 1
      var j = 0
      while (j < nB) {
        val j2 = if (j == nB - 1) 0 else j + 1
        if (segmentsIntersect(xsA(i), ysA(i), xsA(i2), ysA(i2),
            xsB(j), ysB(j), xsB(j2), ysB(j2))) return true
        j += 1
      }
      i += 1
    }
    pointInPolygon(xsB(0), ysB(0), xsA, ysA) ||
      pointInPolygon(xsA(0), ysA(0), xsB, ysB)
  }

  /** Is polygon A PROPERLY within polygon B — strictly inside, no
    * boundary contact? No edge pair may touch (else A reaches B's
    * boundary) and A's first vertex must be inside; with no boundary
    * contact, one vertex decides the whole polygon. */
  def polygonWithin(xsA: Array[Long], ysA: Array[Long],
                    xsB: Array[Long], ysB: Array[Long]): Boolean = {
    val nA = xsA.length
    val nB = xsB.length
    var i = 0
    while (i < nA) {
      val i2 = if (i == nA - 1) 0 else i + 1
      var j = 0
      while (j < nB) {
        val j2 = if (j == nB - 1) 0 else j + 1
        if (segmentsIntersect(xsA(i), ysA(i), xsA(i2), ysA(i2),
            xsB(j), ysB(j), xsB(j2), ysB(j2))) return false
        j += 1
      }
      i += 1
    }
    pointInPolygon(xsA(0), ysA(0), xsB, ysB)
  }
}

/** `point_in_polygon(px, py, xs, ys)` over long coords. */
case class PointInPolygonExpr(first: Expression, second: Expression,
                              third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (LongType, LongType, ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"point_in_polygon needs (long, long, array<long>, array<long>), got $other")
    }

  override protected def nullSafeEval(px: Any, py: Any, xs: Any,
                                      ys: Any): Any =
    GeomPred.pointInPolygon(px.asInstanceOf[Long], py.asInstanceOf[Long],
      xs.asInstanceOf[ArrayData].toLongArray(),
      ys.asInstanceOf[ArrayData].toLongArray())

  override def prettyName: String = "point_in_polygon"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** `polygon_within(xsA, ysA, xsB, ysB)`: A properly within B. */
case class PolygonWithinExpr(first: Expression, second: Expression,
                             third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
            ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"polygon_within needs four array<long> inputs, got $other")
    }

  override protected def nullSafeEval(xa: Any, ya: Any, xb: Any,
                                      yb: Any): Any =
    GeomPred.polygonWithin(
      xa.asInstanceOf[ArrayData].toLongArray(),
      ya.asInstanceOf[ArrayData].toLongArray(),
      xb.asInstanceOf[ArrayData].toLongArray(),
      yb.asInstanceOf[ArrayData].toLongArray())

  override def prettyName: String = "polygon_within"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** `polygons_intersect(xsA, ysA, xsB, ysB)` over long coords. */
case class PolygonsIntersectExpr(first: Expression, second: Expression,
                                 third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
            ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"polygons_intersect needs four array<long> inputs, got $other")
    }

  override protected def nullSafeEval(xa: Any, ya: Any, xb: Any,
                                      yb: Any): Any =
    GeomPred.polygonsIntersect(
      xa.asInstanceOf[ArrayData].toLongArray(),
      ya.asInstanceOf[ArrayData].toLongArray(),
      xb.asInstanceOf[ArrayData].toLongArray(),
      yb.asInstanceOf[ArrayData].toLongArray())

  override def prettyName: String = "polygons_intersect"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
