package graft.operators

import graft.TestSpark
import graft.functions.Wkb
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Geometry-tier contract: WKB codec round-trips (both byte orders,
  * total on hostile bytes), exact predicates against hand-checked
  * cases, and both grid joins value-equal to the brute-force θ-plan
  * on a deterministic corpus. */
class GeometrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toD(c: org.apache.spark.sql.Column) =
    transform(c, v => v.cast("double"))

  // ---- WKB codec -----------------------------------------------------

  test("WKB point and polygon round-trip exactly (integer doubles)") {
    val df = Seq(
      (1L, Seq(7L), Seq(-3L)), // point
      (2L, Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L)), // quad
      (3L, Seq(5L, 8L, 2L), Seq(1L, 9L, 6L)) // triangle
    ).toDF("id", "xs", "ys")
    val got = df.select(col("id"),
        Wkb.decode(Wkb.encode(toD(col("xs")), toD(col("ys")))).as("g"))
      .select(col("id"), col("g.gtype"),
        transform(col("g.xs"), v => v.cast("long")).as("xs"),
        transform(col("g.ys"), v => v.cast("long")).as("ys"))
      .as[(Long, Long, Seq[Long], Seq[Long])].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, Seq(7L), Seq(-3L))))
    assert(got(1) == ((2L, 3L, Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L))))
    assert(got(2) == ((3L, 3L, Seq(5L, 8L, 2L), Seq(1L, 9L, 6L))))
  }

  test("WKB decode accepts big-endian; rejects defects as null") {
    // hand-built big-endian point (0,1): 00 00000001 x y
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte).putInt(1).putDouble(0.0).putDouble(1.0)
    val rows = Seq(
      (1L, be.array()),
      (2L, Array[Byte](9, 1, 0, 0, 0)), // bad byte-order marker
      (3L, Array[Byte](1, 1, 0, 0)), // truncated header
      (4L, null)
    ).toDF("id", "wkb")
    val got = rows.select(col("id"), Wkb.decode(col("wkb")).as("g"))
      .select(col("id"), col("g").isNull.as("bad"),
        col("g.xs").getItem(0).as("x"), col("g.ys").getItem(0).as("y"))
      .as[(Long, Boolean, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, false, Some(0.0), Some(1.0))))
    assert(got(1)._2 && got(2)._2 && got(3)._2)
    // an unclosed polygon ring is a defect, not a geometry
    val poly = Wkb.encodeBytes(Array(0d, 10d, 5d), Array(0d, 0d, 9d))
    val broken = poly.clone()
    broken(broken.length - 1) = (broken(broken.length - 1) ^ 0x01).toByte
    val g2 = Seq((1L, broken)).toDF("id", "wkb")
      .select(Wkb.decode(col("wkb")).isNull.as("bad")).head()
    assert(g2.getBoolean(0))
    // 2 vertices: no valid WKB geometry — encode yields null
    val e2 = Seq((1L, Seq(0L, 1L), Seq(0L, 1L))).toDF("id", "xs", "ys")
      .select(Wkb.encode(toD(col("xs")), toD(col("ys"))).isNull.as("n"))
      .head()
    assert(e2.getBoolean(0))
  }

  // ---- predicates ----------------------------------------------------

  private def pip(px: Long, py: Long, xs: Seq[Long], ys: Seq[Long]): Boolean =
    Seq((px, py, xs, ys)).toDF("px", "py", "xs", "ys")
      .select(Geometry.pointInPolygon(col("px"), col("py"),
        col("xs"), col("ys")).as("in")).head().getBoolean(0)

  test("ray cast: convex, concave, and clearly-outside cases") {
    val (sq_x, sq_y) = (Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L))
    assert(pip(5, 5, sq_x, sq_y))
    assert(!pip(15, 5, sq_x, sq_y))
    assert(!pip(5, -1, sq_x, sq_y))
    // L-shape (concave): notch at the top-right quadrant
    val lx = Seq(0L, 10L, 10L, 5L, 5L, 0L)
    val ly = Seq(0L, 0L, 5L, 5L, 10L, 10L)
    assert(pip(2, 8, lx, ly)) // in the remaining arm
    assert(!pip(8, 8, lx, ly)) // in the notch
    assert(pip(8, 2, lx, ly))
  }

  private def segInt(a: (Long, Long, Long, Long),
                     b: (Long, Long, Long, Long)): Boolean =
    Seq((a._1, a._2, a._3, a._4, b._1, b._2, b._3, b._4))
      .toDF("p1x", "p1y", "p2x", "p2y", "q1x", "q1y", "q2x", "q2y")
      .select(Geometry.segmentsIntersect(col("p1x"), col("p1y"),
        col("p2x"), col("p2y"), col("q1x"), col("q1y"),
        col("q2x"), col("q2y")).as("i")).head().getBoolean(0)

  test("segment intersection: proper, touch, collinear, disjoint") {
    assert(segInt((0, 0, 10, 10), (0, 10, 10, 0))) // proper cross
    assert(!segInt((0, 0, 10, 0), (0, 1, 10, 1))) // parallel
    assert(segInt((0, 0, 10, 0), (10, 0, 20, 5))) // endpoint touch
    assert(segInt((0, 0, 10, 0), (5, 0, 15, 0))) // collinear overlap
    assert(!segInt((0, 0, 10, 0), (11, 0, 20, 0))) // collinear disjoint
    assert(segInt((0, 0, 10, 0), (5, -5, 5, 5))) // T crossing through
    assert(segInt((0, 0, 10, 0), (5, 0, 5, 5))) // T touch mid-edge
    assert(!segInt((0, 0, 10, 0), (5, 1, 5, 5))) // hovering above
  }

  private def polysInt(xsA: Seq[Long], ysA: Seq[Long], xsB: Seq[Long],
                       ysB: Seq[Long]): Boolean =
    Seq((xsA, ysA, xsB, ysB)).toDF("xa", "ya", "xb", "yb")
      .select(Geometry.polygonsIntersect(col("xa"), col("ya"),
        col("xb"), col("yb")).as("i")).head().getBoolean(0)

  test("polygon intersects: overlap, containment, touch, disjoint") {
    val (sx, sy) = (Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L))
    assert(polysInt(sx, sy, Seq(5L, 15L, 15L, 5L), Seq(5L, 5L, 15L, 15L)))
    assert(polysInt(sx, sy, Seq(2L, 4L, 4L, 2L), Seq(2L, 2L, 4L, 4L))) // B in A
    assert(polysInt(Seq(2L, 4L, 4L, 2L), Seq(2L, 2L, 4L, 4L), sx, sy)) // A in B
    assert(polysInt(sx, sy, Seq(10L, 20L, 20L, 10L), Seq(0L, 0L, 10L, 10L))) // shared edge
    assert(polysInt(sx, sy, Seq(10L, 20L, 15L), Seq(10L, 10L, 20L))) // vertex touch
    assert(!polysInt(sx, sy, Seq(12L, 20L, 20L, 12L), Seq(12L, 12L, 20L, 20L)))
  }

  test("shoelace area2 and centroid numerators: hand-checked squares") {
    val df = Seq(
      // CCW 10×10 square at origin: A=100 → area2=200; centroid (5,5)
      // → numerators 6·A·c = 3000
      (1L, Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L)),
      // right triangle (0,0)(4,0)(0,3): A=6 → area2=12; centroid
      // (4/3, 1) → cx_num = 6·6·4/3 = 48, cy_num = 36
      (2L, Seq(0L, 4L, 0L), Seq(0L, 0L, 3L))
    ).toDF("id", "xs", "ys")
    val got = df
      .withColumn("c", Geometry.polygonCentroidNum(col("xs"), col("ys")))
      .select(col("id"), Geometry.polygonArea2(col("xs"), col("ys")),
        col("c.cx_num"), col("c.cy_num"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 200L, 3000L, 3000L)))
    assert(got(1) == ((2L, 12L, 48L, 36L)))
    // clockwise ring: area2 flips sign, centroid numerators with it —
    // the ratio (true centroid) is orientation-independent
    val cw = Seq((3L, Seq(0L, 0L, 10L, 10L), Seq(0L, 10L, 10L, 0L)))
      .toDF("id", "xs", "ys")
      .select(Geometry.polygonArea2(col("xs"), col("ys")).as("a"))
      .head().getLong(0)
    assert(cw == -200L)
  }

  test("native predicates ≡ their higher-order-function twins") {
    // the HOF forms ARE the formulas the Scaladoc argues about; the
    // native loops must agree on every pair of a varied corpus
    // (touching, containing, overlapping, disjoint — the rhombi tile
    // a small window so all classes occur)
    val polys = rhombi(40, (53, 71), 5).toDF("id", "xs", "ys")
    val a = polys.select(col("id").as("aid"), col("xs").as("xa"),
      col("ys").as("ya"))
    val b = rhombi(25, (97, 41), 7).toDF("id", "xs", "ys")
      .select(col("id").as("bid"), col("xs").as("xb"), col("ys").as("yb"))
    val diff = a.crossJoin(b)
      .select(
        Geometry.polygonsIntersect(col("xa"), col("ya"),
          col("xb"), col("yb")).as("native"),
        Geometry.polygonsIntersectHof(col("xa"), col("ya"),
          col("xb"), col("yb")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0L)
    val pts = (1 to 120).map(i =>
      (i * 13L % 200L, i * 29L % 200L)).toDF("px", "py")
    val pipDiff = pts.crossJoin(polys)
      .select(
        Geometry.pointInPolygon(col("px"), col("py"),
          col("xs"), col("ys")).as("native"),
        Geometry.pointInPolygonHof(col("px"), col("py"),
          col("xs"), col("ys")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(pipDiff == 0L)
  }

  // ---- joins ≡ brute force -------------------------------------------

  /** Deterministic corpus: the q227/q228 rhombus family at small n. */
  private def rhombi(n: Int, mult: (Long, Long), base: Long) =
    (1 to n).map { i =>
      val k = i.toLong
      val (cx, cy) = (k * mult._1 % 200, k * mult._2 % 200)
      val (ea, eb, ec, ed) =
        (base + k % 17, base + k % 13, base + k % 11, base + k % 19)
      (k, Seq(cx + ea, cx, cx - ec, cx), Seq(cy, cy + eb, cy, cy - ed))
    }

  test("polygon z-order layout: a window probe opens a fraction of files") {
    // the q232 layout end-to-end: polygons stored with their bbox
    // center, table clustered by z_order(zx, zy), per-file zone maps
    // prune a 2-D window probe on BOTH axes — the GeoParquet-style
    // spatial-partitioning contract, values unchanged by the layout
    import graft.gdl.TableStore
    val polys = (1L to 2048L).map { k =>
      val (cx, cy) = (k * 53 % 2048, k * 71 % 2048)
      (k, cx, cy, Seq(cx + 5 + k % 17, cx, cx - (5 + k % 11), cx),
        Seq(cy, cy + 5 + k % 13, cy, cy - (5 + k % 19)))
    }.toDF("poly_id", "zx", "zy", "xs", "ys")
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("geozorder").toString,
      partitioning = Map.empty)
    store.append("p", polys)
    store.rewriteClustered("p",
      graft.functions.ZOrder2.zorder(col("zx"), col("zy"), 11), nFiles = 16)
    val window = col("zx").between(512L, 767L) && col("zy").between(512L, 767L)
    val (kept, total) = store.zoneFileCounts("p", window)
    assert(total >= 16, s"expected >= 16 clustered files, got $total")
    assert(kept <= total / 2,
      s"z-layout window probe should prune, read $kept/$total")
    // pruning never changes values: the pruned scan feeds the exact
    // PIP join with identical results to the unpruned relation
    val pts = (1 to 400).map(i =>
      (i.toLong, i * 13L % 2048L, i * 29L % 2048L)).toDF("p_id", "px", "py")
    def pairs(rel: org.apache.spark.sql.DataFrame) =
      Geometry.pointInPolygonJoin(pts, rel.select("poly_id", "xs", "ys"),
        cell = 64L).as[(Long, Long)].collect().toSet
    assert(pairs(store.scan("p", window).get) ==
      pairs(store.read("p").get.filter(window)))
  }

  test("pointInPolygonJoin equals the brute-force θ-join") {
    val polys = rhombi(60, (53, 71), 5).toDF("poly_id", "xs", "ys")
    val pts = (1 to 150).map(i =>
      (i.toLong, i * 13L % 200L, i * 29L % 200L)).toDF("p_id", "px", "py")
    val got = Geometry.pointInPolygonJoin(pts, polys, cell = 16L)
      .as[(Long, Long)].collect().toSet
    val brute = pts.crossJoin(polys)
      .filter(Geometry.pointInPolygon(col("px"), col("py"),
        col("xs"), col("ys")))
      .select(col("poly_id"), col("p_id")).as[(Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("polygonIntersectJoin equals the brute-force θ-join") {
    val a = rhombi(50, (53, 71), 5)
      .toDF("a_id", "axs", "ays")
    val b = rhombi(20, (97, 41), 7)
      .toDF("b_id", "bxs", "bys")
    val got = Geometry.polygonIntersectJoin(a, b, cell = 32L)
      .as[(Long, Long)].collect().toSet
    val brute = a.crossJoin(b)
      .filter(Geometry.polygonsIntersect(col("axs"), col("ays"),
        col("bxs"), col("bys")))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("polygonWithin: strict containment semantics + join ≡ brute force") {
    val (bx, by) = (Seq(0L, 20L, 20L, 0L), Seq(0L, 0L, 20L, 20L))
    // strictly inside
    assert(Seq((Seq(5L, 8L, 5L), Seq(5L, 8L, 12L), bx, by))
      .toDF("xa", "ya", "xb", "yb")
      .select(Geometry.polygonWithin(col("xa"), col("ya"),
        col("xb"), col("yb"))).head().getBoolean(0))
    // touching B's boundary from inside: NOT properly within
    assert(!Seq((Seq(0L, 8L, 5L), Seq(5L, 8L, 12L), bx, by))
      .toDF("xa", "ya", "xb", "yb")
      .select(Geometry.polygonWithin(col("xa"), col("ya"),
        col("xb"), col("yb"))).head().getBoolean(0))
    // overlapping or outside: not within
    assert(!Seq((Seq(15L, 25L, 15L), Seq(15L, 25L, 25L), bx, by))
      .toDF("xa", "ya", "xb", "yb")
      .select(Geometry.polygonWithin(col("xa"), col("ya"),
        col("xb"), col("yb"))).head().getBoolean(0))
    // containment the other way round: not within
    assert(!Seq((Seq(-5L, 25L, 25L, -5L), Seq(-5L, -5L, 25L, 25L), bx, by))
      .toDF("xa", "ya", "xb", "yb")
      .select(Geometry.polygonWithin(col("xa"), col("ya"),
        col("xb"), col("yb"))).head().getBoolean(0))
    // join ≡ brute force on corpora sized so containments exist
    val a = rhombi(80, (53, 71), 2).toDF("a_id", "axs", "ays")
    val b = rhombi(30, (97, 41), 20).toDF("b_id", "bxs", "bys")
    val got = Geometry.polygonWithinJoin(a, b, cell = 32L)
      .as[(Long, Long)].collect().toSet
    val brute = a.crossJoin(b)
      .filter(Geometry.polygonWithin(col("axs"), col("ays"),
        col("bxs"), col("bys")))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }
}
