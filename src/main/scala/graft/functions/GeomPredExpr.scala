package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
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
    // Total on degenerate inputs: an empty vertex array is "no
    // polygon" → no intersection, never an index error (one hostile
    // row must not kill the scan — same contract as pointInPolygon).
    if (nA == 0 || nB == 0) return false
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

  /** Even-odd ray cast over a MULTI-RING geometry: `xs`/`ys` hold all
    * rings head-to-tail, `ringLens` the vertex count per ring (no
    * closing repeats). Crossings sum over every ring's edges — the
    * standard even-odd fill rule, which makes holes (any inner ring)
    * and disjoint MultiPolygon members fall out of the same parity:
    * a point inside outer+hole crosses both rings' boundaries an
    * odd+odd = even total. Total on degenerate input (empty or
    * mismatched arrays → false). */
  def pointInRings(px: Long, py: Long, xs: Array[Long], ys: Array[Long],
                   ringLens: Array[Long]): Boolean = {
    var crossings = 0
    var base = 0
    var r = 0
    while (r < ringLens.length) {
      val n = ringLens(r).toInt
      if (n < 0 || base + n > xs.length || base + n > ys.length)
        return false
      var i = 0
      while (i < n) {
        val j = base + (if (i == n - 1) 0 else i + 1)
        val y1 = ys(base + i); val y2 = ys(j)
        if ((y1 > py) != (y2 > py)) {
          val x1 = xs(base + i); val x2 = xs(j)
          val lhs = (px - x1) * (y2 - y1)
          val rhs = (py - y1) * (x2 - x1)
          if (if (y2 > y1) lhs < rhs else lhs > rhs) crossings += 1
        }
        i += 1
      }
      base += n
      r += 1
    }
    (crossings & 1) == 1
  }

  /** Is the point within squared distance `rsq` of the REGION bounded
    * by a multi-ring geometry (even-odd interior)? True when the point
    * is interior, or within `r` of ANY ring edge — which also handles
    * a point inside a hole (its distance to the region is its distance
    * to the hole's boundary). Exact integers: the perpendicular case
    * compares cross² ≤ rsq·len² in 128 bits (multiplyHigh), so no
    * coordinate-magnitude cliff below the 2³¹ coord bound. */
  def pointWithinDist(px: Long, py: Long, xs: Array[Long], ys: Array[Long],
                      ringLens: Array[Long], rsq: Long): Boolean = {
    if (pointInRings(px, py, xs, ys, ringLens)) return true
    var base = 0
    var r = 0
    while (r < ringLens.length) {
      val n = ringLens(r).toInt
      if (n < 0 || base + n > xs.length || base + n > ys.length)
        return false
      var i = 0
      while (i < n) {
        val j = base + (if (i == n - 1) 0 else i + 1)
        val x1 = xs(base + i); val y1 = ys(base + i)
        val x2 = xs(j); val y2 = ys(j)
        val apx = px - x1; val apy = py - y1
        val abx = x2 - x1; val aby = y2 - y1
        val dot = apx * abx + apy * aby
        val len2 = abx * abx + aby * aby
        val hit =
          if (len2 == 0L || dot <= 0L) apx * apx + apy * apy <= rsq
          else if (dot >= len2) {
            val bpx = px - x2; val bpy = py - y2
            bpx * bpx + bpy * bpy <= rsq
          } else {
            val cross = apx * aby - apy * abx
            mulLeq(cross, cross, rsq, len2)
          }
        if (hit) return true
        i += 1
      }
      base += n
      r += 1
    }
    false
  }

  /** Exact even-odd REGION area (doubled): |shoelace| of ring 0 minus
    * Σ|shoelace| of every later ring — the polygon-with-holes area
    * formula, orientation-insensitive (each ring's signed area is
    * absolute-valued, so hole winding direction never matters).
    * Returns Long.MinValue sentinel → caller maps to null on
    * malformed ring structure (lens exceeding the arrays). */
  def regionArea2(xs: Array[Long], ys: Array[Long],
                  ringLens: Array[Long]): Long = {
    if (ringLens.isEmpty) return Long.MinValue
    var total = 0L
    var base = 0
    var r = 0
    while (r < ringLens.length) {
      val n = ringLens(r).toInt
      if (n < 3 || base + n > xs.length || base + n > ys.length)
        return Long.MinValue
      var s = 0L
      var i = 0
      while (i < n) {
        val j = base + (if (i == n - 1) 0 else i + 1)
        s += xs(base + i) * ys(j) - xs(j) * ys(base + i)
        i += 1
      }
      val a = math.abs(s)
      total += (if (r == 0) a else -a)
      base += n
      r += 1
    }
    total
  }

  /** a·b ≤ c·d exactly, all operands non-negative, via 128-bit
    * products (multiplyHigh) — no overflow, no BigInt allocation. */
  private def mulLeq(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val ab = a * b; val abHi = Math.multiplyHigh(a, b)
    val cd = c * d; val cdHi = Math.multiplyHigh(c, d)
    if (abHi != cdHi) abHi < cdHi
    else java.lang.Long.compareUnsigned(ab, cd) <= 0
  }

  /** Do two multi-ring geometries (even-odd interiors) intersect —
    * boundary touch included? Some ring-edge pair intersects, or one
    * region's outer reference vertex lies interior to the other (with
    * no edge contact, each CONNECTED region sits in one face of the
    * other's arrangement, and a hole face reports even parity — so a
    * polygon entirely inside the other's HOLE correctly reports no
    * intersection). Completeness requires each argument be one
    * connected polygon-with-holes (ring 0 the outer ring); for a
    * MultiPolygon, test each member separately — with no edge contact
    * a DISJOINT second member could sit inside the other region
    * unseen by ring 0's reference vertex. */
  def ringsIntersect(xsA: Array[Long], ysA: Array[Long], lensA: Array[Long],
                     xsB: Array[Long], ysB: Array[Long],
                     lensB: Array[Long]): Boolean = {
    if (xsA.isEmpty || xsB.isEmpty || lensA.isEmpty || lensB.isEmpty)
      return false
    if (lensA.sum > xsA.length || lensB.sum > xsB.length) return false
    var baseA = 0
    var ra = 0
    while (ra < lensA.length) {
      val nA = lensA(ra).toInt
      var i = 0
      while (i < nA) {
        val i2 = baseA + (if (i == nA - 1) 0 else i + 1)
        var baseB = 0
        var rb = 0
        while (rb < lensB.length) {
          val nB = lensB(rb).toInt
          var j = 0
          while (j < nB) {
            val j2 = baseB + (if (j == nB - 1) 0 else j + 1)
            if (segmentsIntersect(xsA(baseA + i), ysA(baseA + i),
                xsA(i2), ysA(i2), xsB(baseB + j), ysB(baseB + j),
                xsB(j2), ysB(j2))) return true
            j += 1
          }
          baseB += nB
          rb += 1
        }
        i += 1
      }
      baseA += nA
      ra += 1
    }
    pointInRings(xsB(0), ysB(0), xsA, ysA, lensA) ||
      pointInRings(xsA(0), ysA(0), xsB, ysB, lensB)
  }

  /** Is polygon A PROPERLY within polygon B — strictly inside, no
    * boundary contact? No edge pair may touch (else A reaches B's
    * boundary) and A's first vertex must be inside; with no boundary
    * contact, one vertex decides the whole polygon. */
  def polygonWithin(xsA: Array[Long], ysA: Array[Long],
                    xsB: Array[Long], ysB: Array[Long]): Boolean = {
    val nA = xsA.length
    val nB = xsB.length
    // Empty vertex arrays: no polygon is within anything (and nothing
    // is within an empty polygon) — false, not an index error.
    if (nA == 0 || nB == 0) return false
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

/** Shared shape for the n-ary ring predicates: null-intolerant
  * boolean expressions over long/array<long> children, evaluated as
  * one tight JVM loop ([[GeomPred]]), `CodegenFallback` like the
  * quaternary forms. */
abstract class RingPredExpr extends Expression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  protected def expectedTypes: Seq[DataType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.map(_.dataType).zip(expectedTypes).forall {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case (LongType, LongType) => true
      case _ => false
    }
    if (ok && children.length == expectedTypes.length)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs ${expectedTypes.mkString("(", ", ", ")")}, " +
          s"got ${children.map(_.dataType).mkString("(", ", ", ")")}")
  }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Any](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v
      i += 1
    }
    evalNotNull(vals)
  }

  protected def evalNotNull(vals: Array[Any]): Any

  protected final def longs(v: Any): Array[Long] =
    v.asInstanceOf[ArrayData].toLongArray()
}

/** `point_in_rings(px, py, xs, ys, ring_lens)` — even-odd multi-ring
  * containment (holes + MultiPolygon members). */
case class PointInRingsExpr(children: Seq[Expression])
    extends RingPredExpr {

  private val arr = ArrayType(LongType, containsNull = false)
  protected def expectedTypes: Seq[DataType] =
    Seq(LongType, LongType, arr, arr, arr)

  protected def evalNotNull(vals: Array[Any]): Any =
    GeomPred.pointInRings(vals(0).asInstanceOf[Long],
      vals(1).asInstanceOf[Long], longs(vals(2)), longs(vals(3)),
      longs(vals(4)))

  override def prettyName: String = "point_in_rings"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `point_within_dist(px, py, xs, ys, ring_lens, rsq)` — point within
  * squared distance `rsq` of the even-odd region. */
case class PointWithinDistExpr(children: Seq[Expression])
    extends RingPredExpr {

  private val arr = ArrayType(LongType, containsNull = false)
  protected def expectedTypes: Seq[DataType] =
    Seq(LongType, LongType, arr, arr, arr, LongType)

  protected def evalNotNull(vals: Array[Any]): Any =
    GeomPred.pointWithinDist(vals(0).asInstanceOf[Long],
      vals(1).asInstanceOf[Long], longs(vals(2)), longs(vals(3)),
      longs(vals(4)), vals(5).asInstanceOf[Long])

  override def prettyName: String = "point_within_dist"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `rings_intersect(xsA, ysA, lensA, xsB, ysB, lensB)` — multi-ring
  * region intersection (see [[GeomPred.ringsIntersect]]'s
  * connectedness contract). */
case class RingsIntersectExpr(children: Seq[Expression])
    extends RingPredExpr {

  private val arr = ArrayType(LongType, containsNull = false)
  protected def expectedTypes: Seq[DataType] =
    Seq(arr, arr, arr, arr, arr, arr)

  protected def evalNotNull(vals: Array[Any]): Any =
    GeomPred.ringsIntersect(longs(vals(0)), longs(vals(1)),
      longs(vals(2)), longs(vals(3)), longs(vals(4)), longs(vals(5)))

  override def prettyName: String = "rings_intersect"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `region_area2(xs, ys, ring_lens)` — doubled even-odd region area
  * (outer minus holes), LongType, null on malformed ring structure. */
case class RegionArea2Expr(children: Seq[Expression])
    extends RingPredExpr {

  private val arr = ArrayType(LongType, containsNull = false)
  protected def expectedTypes: Seq[DataType] = Seq(arr, arr, arr)
  override def dataType: DataType = LongType

  protected def evalNotNull(vals: Array[Any]): Any = {
    val v = GeomPred.regionArea2(longs(vals(0)), longs(vals(1)),
      longs(vals(2)))
    if (v == Long.MinValue) null else v
  }

  override def nullable: Boolean = true
  override def prettyName: String = "region_area2"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
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
