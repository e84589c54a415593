package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Well-Known-Text geometry codec (OGC SFA part 1 §7) — the human-
  * readable half of the interchange pair next to [[Wkb]]'s binary
  * half; GeoJSON-era tooling and SQL engines exchange footprints as
  * WKT strings, so a lake's query side needs both directions.
  *
  *  - [[WktFormatExpr]] `wkt_format(xs, ys, ring_lens, poly_lens)`:
  *    the flattened ring form (the [[Wkb.encodeGeom]] contract —
  *    ring 0 of each polygon outer, later rings holes, no closing
  *    repeats) → `POINT (x y)` / `POLYGON ((…), (…))` /
  *    `MULTIPOLYGON (((…)))` with each ring closed by repeating its
  *    first vertex, as the spec requires. INTEGER coordinates only
  *    (the geometry tier's exactness contract) — the text is then
  *    byte-deterministic and any engine reconstructs it exactly.
  *  - [[WktParseExpr]] `wkt_parse(str)`: the reverse, tolerant of
  *    arbitrary whitespace between tokens, case-insensitive tags,
  *    null on ANY defect (unbalanced parens, unclosed ring, ring
  *    under 4 listed vertices, non-integer coordinate, trailing
  *    junk) — total on hostile strings, the CrawlArchive discipline.
  *
  * Reference scope: the reference carries STAC geometry members as
  * GeoJSON-ish dicts it never evaluates (`tests/stac_objects.py:36`);
  * this pairs the evaluated tier with the standard text interchange.
  * `CodegenFallback`: string assembly gains nothing from codegen. */
object WktCodec {

  /** WKT text, or null when no valid geometry exists (the
    * [[Wkb.encodeGeomBytes]] validity rules). */
  private[graft] def format(xs: Array[Long], ys: Array[Long],
                            ringLens: Array[Long],
                            polyLens: Array[Long]): String = {
    if (xs.length != ys.length || ringLens.isEmpty || polyLens.isEmpty)
      return null
    if (ringLens.exists(_ < 3) && !(xs.length == 1 &&
        ringLens.sameElements(Array(1L)) && polyLens.sameElements(Array(1L))))
      return null
    if (ringLens.sum != xs.length || polyLens.exists(_ < 1) ||
        polyLens.sum != ringLens.length) return null
    if (xs.length == 1) return s"POINT (${xs(0)} ${ys(0)})"
    val sb = new java.lang.StringBuilder()
    val single = polyLens.length == 1
    sb.append(if (single) "POLYGON (" else "MULTIPOLYGON (")
    var ring = 0
    var off = 0
    var p = 0
    while (p < polyLens.length) {
      if (p > 0) sb.append(", ")
      if (!single) sb.append('(')
      var r = 0L
      while (r < polyLens(p)) {
        if (r > 0) sb.append(", ")
        sb.append('(')
        val n = ringLens(ring).toInt
        var i = 0
        while (i <= n) { // ≤ n: the closing repeat
          if (i > 0) sb.append(", ")
          val j = off + (if (i == n) 0 else i)
          sb.append(xs(j)).append(' ').append(ys(j))
          i += 1
        }
        sb.append(')')
        off += n
        ring += 1
        r += 1
      }
      if (!single) sb.append(')')
      p += 1
    }
    sb.append(')').toString
  }

  /** (gtype, xs, ys, ringLens, polyLens) or null on any defect. */
  private[graft] def parse(s: String): (Long, Array[Long], Array[Long],
      Array[Long], Array[Long]) = {
    if (s == null) return null
    var i = 0
    val n = s.length
    def ws(): Unit = { while (i < n && s.charAt(i).isWhitespace) i += 1 }
    def eat(c: Char): Boolean = { ws(); if (i < n && s.charAt(i) == c) { i += 1; true } else false }
    def tag(): String = {
      ws()
      val b = i
      while (i < n && s.charAt(i).isLetter) i += 1
      s.substring(b, i).toUpperCase(java.util.Locale.ROOT)
    }
    def long(): java.lang.Long = {
      ws()
      val b = i
      if (i < n && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      val d0 = i
      while (i < n && s.charAt(i).isDigit) i += 1
      if (i == d0) return null
      try java.lang.Long.valueOf(s.substring(b, i))
      catch { case _: NumberFormatException => null }
    }
    val xs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ys = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ringLens = scala.collection.mutable.ArrayBuffer.empty[Long]
    // one `(x y, x y, ...)` ring; verifies the closing repeat and
    // drops it (the flattened-ring-form convention)
    def ring(): Boolean = {
      if (!eat('(')) return false
      val base = xs.length
      var more = true
      while (more) {
        val x = long(); if (x == null) return false
        val y = long(); if (y == null) return false
        xs += x.longValue(); ys += y.longValue()
        more = eat(',')
      }
      if (!eat(')')) return false
      val cnt = xs.length - base
      if (cnt < 4) return false
      if (xs(xs.length - 1) != xs(base) || ys(ys.length - 1) != ys(base))
        return false
      xs.remove(xs.length - 1); ys.remove(ys.length - 1)
      ringLens += (cnt - 1).toLong
      true
    }
    // one `((ring), (ring)...)` polygon body; returns its ring count
    def polygonBody(): Long = {
      if (!eat('(')) return -1L
      var cnt = 0L
      var more = true
      while (more) {
        if (!ring()) return -1L
        cnt += 1
        more = eat(',')
      }
      if (!eat(')')) return -1L
      cnt
    }
    def end(): Boolean = { ws(); i == n }
    tag() match {
      case "POINT" =>
        if (!eat('(')) return null
        val x = long(); val y = long()
        if (x == null || y == null || !eat(')') || !end()) return null
        (Wkb.PointType, Array(x.longValue()), Array(y.longValue()),
          Array(1L), Array(1L))
      case "POLYGON" =>
        val rc = polygonBody()
        if (rc < 1 || !end()) return null
        (Wkb.PolygonType, xs.toArray, ys.toArray, ringLens.toArray,
          Array(rc))
      case "MULTIPOLYGON" =>
        if (!eat('(')) return null
        val polyLens = scala.collection.mutable.ArrayBuffer.empty[Long]
        var more = true
        while (more) {
          val rc = polygonBody()
          if (rc < 1) return null
          polyLens += rc
          more = eat(',')
        }
        if (!eat(')') || !end()) return null
        (Wkb.MultiPolygonType, xs.toArray, ys.toArray, ringLens.toArray,
          polyLens.toArray)
      case _ => null
    }
  }

  import org.apache.spark.sql.GraftExpressionBridge.{column, expression}

  def format(xs: Column, ys: Column, ringLens: Column,
             polyLens: Column): Column =
    column(WktFormatExpr(Seq(expression(xs), expression(ys),
      expression(ringLens), expression(polyLens))))
  def parse(str: Column): Column = column(WktParseExpr(expression(str)))
}

/** `wkt_format(xs, ys, ring_lens, poly_lens)` → WKT string. */
case class WktFormatExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.length == 4 && children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wkt_format needs four array<long> inputs, got " +
          children.map(_.dataType).mkString("(", ", ", ")"))
  }

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) return null
    val arrs = vals.map(_.asInstanceOf[ArrayData].toLongArray())
    val out = WktCodec.format(arrs(0), arrs(1), arrs(2), arrs(3))
    if (out == null) null else UTF8String.fromString(out)
  }

  override def prettyName: String = "wkt_format"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `wkt_parse(str)` → struct(gtype, xs, ys, ring_lens, poly_lens),
  * long coords; null on any defect. */
case class WktParseExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = WktParseExpr.outType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wkt_parse needs string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val out = WktCodec.parse(input.toString)
    if (out == null) null
    else InternalRow(out._1, new GenericArrayData(out._2),
      new GenericArrayData(out._3), new GenericArrayData(out._4),
      new GenericArrayData(out._5))
  }

  override def prettyName: String = "wkt_parse"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WktParseExpr {
  val outType: StructType = StructType(Seq(
    StructField("gtype", LongType, nullable = false),
    StructField("xs", ArrayType(LongType, containsNull = false)),
    StructField("ys", ArrayType(LongType, containsNull = false)),
    StructField("ring_lens", ArrayType(LongType, containsNull = false)),
    StructField("poly_lens", ArrayType(LongType, containsNull = false))))
}
