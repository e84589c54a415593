package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geometry tier, step 1 of the north star (r13 VERDICT #5): WKB
  * point/polygon columns plus exact point-in-polygon and
  * polygon-intersects joins under the [[SpatialJoin]] grid discipline.
  *
  * Reference scope note: the reference CARRIES geometry (STAC `bbox`
  * and a nullable `geometry` member — `tests/stac_objects.py:36`) but
  * never evaluates it; this implements the evaluation tier a
  * geospatial lake's query side needs (which items does this polygon
  * cover, which footprints overlap).
  *
  * Exactness contract: coordinates are integers (carried as longs —
  * WKB's IEEE doubles are exact below 2⁵³), every predicate is
  * integer sign arithmetic (orientation cross products, cross-
  * multiplied ray intersections — no division, no floats), so a
  * DuckDB oracle computing the same formulas matches hash-exactly and
  * the grid join can be verified against the direct θ-join. Overflow
  * bound: |coord| < 2³⁰ keeps every product inside a long with slack.
  *
  * Predicate semantics:
  *  - [[pointInPolygon]]: standard half-open upward ray cast (odd
  *    crossing parity). Boundary points get the parity the exact
  *    arithmetic yields — deterministic and engine-independent, but
  *    side-dependent; callers needing closed semantics test the
  *    boundary explicitly (the intersects join does).
  *  - [[segmentsIntersect]]: complete orientation test including
  *    collinear/endpoint touching (sign comparisons only — an o1·o2
  *    product would overflow at 2⁴² magnitudes).
  *  - [[polygonsIntersect]]: simple (non-self-intersecting) polygons
  *    intersect iff some edge pair intersects, or one contains the
  *    other's first vertex. Complete: with no edge crossing or touch,
  *    each polygon is entirely inside or entirely outside the other,
  *    so one vertex decides — and a vertex ON the boundary was
  *    already an edge touch, so the ray cast's boundary convention
  *    never decides the answer.
  *
  * Scale shape (100 TB): both joins explode geometries to covering
  * grid cells (map-only, bounded by bbox/cell), take candidates from
  * a cell equi-join — pair space O(density per cell²), never |A|·|B|
  * — and filter with the exact predicate; intersect pairs dedup by
  * the [[SpatialJoin.bboxIntersect]] reference-point rule (a pure
  * filter, no distinct shuffle). Points land in exactly one cell, so
  * the PIP join needs no dedup at all. Higher-order array functions
  * keep the predicates inside codegen'd projections — no UDFs.
  */
object Geometry {

  private def cellId(c: Column, cell: Long): Column =
    floor(c.cast("double") / cell).cast("long")

  // ---- exact predicates over coordinate arrays ----------------------

  /** Sign-carrying orientation of (a→b, a→c): >0 counter-clockwise,
    * <0 clockwise, 0 collinear. */
  private def orient(ax: Column, ay: Column, bx: Column, by: Column,
                     cx: Column, cy: Column): Column =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Is (px,py) within the bounding box of segment a–b? Only valid
    * combined with collinearity (orientation 0). */
  private def onSeg(ax: Column, ay: Column, bx: Column, by: Column,
                    px: Column, py: Column): Column =
    least(ax, bx) <= px && px <= greatest(ax, bx) &&
      least(ay, by) <= py && py <= greatest(ay, by)

  private def signsOpposite(o1: Column, o2: Column): Column =
    (o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)

  /** Closed segment intersection p1–p2 vs q1–q2: proper crossings plus
    * every collinear/endpoint touch. Integer-exact. */
  def segmentsIntersect(p1x: Column, p1y: Column, p2x: Column, p2y: Column,
                        q1x: Column, q1y: Column, q2x: Column,
                        q2y: Column): Column = {
    val o1 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    val o2 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    val o3 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    val o4 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    (signsOpposite(o1, o2) && signsOpposite(o3, o4)) ||
      (o1 === 0 && onSeg(p1x, p1y, p2x, p2y, q1x, q1y)) ||
      (o2 === 0 && onSeg(p1x, p1y, p2x, p2y, q2x, q2y)) ||
      (o3 === 0 && onSeg(q1x, q1y, q2x, q2y, p1x, p1y)) ||
      (o4 === 0 && onSeg(q1x, q1y, q2x, q2y, p2x, p2y))
  }

  import org.apache.spark.sql.GraftExpressionBridge.{column, expression}

  /** Upward ray cast over a vertex ring (`xs`/`ys` parallel
    * array<long>, no closing repeat): odd crossing parity ⟺ inside.
    * The edge-crossing test cross-multiplies the ray/edge
    * intersection — exact, no division. Backed by the native
    * [[graft.functions.PointInPolygonExpr]] loop; [[pointInPolygonHof]]
    * is the formula's higher-order-function twin kept for the
    * differential spec. */
  def pointInPolygon(px: Column, py: Column, xs: Column,
                     ys: Column): Column =
    column(graft.functions.PointInPolygonExpr(expression(px.cast("long")),
      expression(py.cast("long")), expression(xs), expression(ys)))

  private[operators] def pointInPolygonHof(px: Column, py: Column, xs: Column,
                                           ys: Column): Column = {
    val n = size(xs)
    val crossings = filter(sequence(lit(0), n - 1), i => {
      val j = (i + 1) % n
      val x1 = element_at(xs, i + 1)
      val y1 = element_at(ys, i + 1)
      val x2 = element_at(xs, j + 1)
      val y2 = element_at(ys, j + 1)
      ((y1 > py) =!= (y2 > py)) &&
        when(y2 > y1, (px - x1) * (y2 - y1) < (py - y1) * (x2 - x1))
          .otherwise((px - x1) * (y2 - y1) > (py - y1) * (x2 - x1))
    })
    size(crossings) % 2 === 1
  }

  /** Do two simple polygons (vertex rings, no closing repeat)
    * intersect — boundary touch included? See the object doc for the
    * completeness argument. Backed by the native
    * [[graft.functions.PolygonsIntersectExpr]] loop (the q228 join
    * evaluates up to |A|·|B| edge-pair tests per candidate — per-
    * element interpreted lambdas dominated that profile);
    * [[polygonsIntersectHof]] is the formula's higher-order twin kept
    * for the differential spec. */
  def polygonsIntersect(xsA: Column, ysA: Column, xsB: Column,
                        ysB: Column): Column =
    column(graft.functions.PolygonsIntersectExpr(expression(xsA),
      expression(ysA), expression(xsB), expression(ysB)))

  /** Is polygon A PROPERLY within B — strictly inside, no boundary
    * contact? No edge pair may touch and A's first vertex must be
    * inside B; with no boundary contact, one vertex decides the whole
    * polygon (ST_Within's strict form, exact in integers). */
  def polygonWithin(xsA: Column, ysA: Column, xsB: Column,
                    ysB: Column): Column =
    column(graft.functions.PolygonWithinExpr(expression(xsA),
      expression(ysA), expression(xsB), expression(ysB)))

  private[operators] def polygonsIntersectHof(xsA: Column, ysA: Column,
                                              xsB: Column,
                                              ysB: Column): Column = {
    val nA = size(xsA)
    val nB = size(xsB)
    val edgeCross = exists(sequence(lit(0), nA - 1), i => {
      val i2 = (i + 1) % nA
      exists(sequence(lit(0), nB - 1), j => {
        val j2 = (j + 1) % nB
        segmentsIntersect(
          element_at(xsA, i + 1), element_at(ysA, i + 1),
          element_at(xsA, i2 + 1), element_at(ysA, i2 + 1),
          element_at(xsB, j + 1), element_at(ysB, j + 1),
          element_at(xsB, j2 + 1), element_at(ysB, j2 + 1))
      })
    })
    edgeCross ||
      pointInPolygonHof(element_at(xsB, 1), element_at(ysB, 1), xsA, ysA) ||
      pointInPolygonHof(element_at(xsA, 1), element_at(ysA, 1), xsB, ysB)
  }

  /** Even-odd multi-ring containment (geometry step 2 — holes and
    * MultiPolygon members in one parity rule): `xs`/`ys` hold all
    * rings head-to-tail, `ringLens` the vertex count per ring.
    * Crossings sum over every ring — a point in a hole crosses two
    * boundaries (even → outside), a point in either member of a
    * disjoint MultiPolygon crosses one (odd → inside). */
  def pointInRings(px: Column, py: Column, xs: Column, ys: Column,
                   ringLens: Column): Column =
    column(graft.functions.PointInRingsExpr(Seq(
      expression(px.cast("long")), expression(py.cast("long")),
      expression(xs), expression(ys), expression(ringLens))))

  /** Point within distance √rsq of the even-odd region: interior, or
    * within range of any ring edge (a point in a hole measures to the
    * hole's boundary). Exact — the perpendicular case compares
    * cross² ≤ rsq·len² in 128 bits regardless of coordinate size. */
  def pointWithinDist(px: Column, py: Column, xs: Column, ys: Column,
                      ringLens: Column, rsq: Long): Column =
    column(graft.functions.PointWithinDistExpr(Seq(
      expression(px.cast("long")), expression(py.cast("long")),
      expression(xs), expression(ys), expression(ringLens),
      expression(lit(rsq)))))

  /** Multi-ring region intersection (boundary touch included); each
    * side one connected polygon-with-holes — see
    * [[graft.functions.GeomPred.ringsIntersect]]. */
  def ringsIntersect(xsA: Column, ysA: Column, lensA: Column,
                     xsB: Column, ysB: Column, lensB: Column): Column =
    column(graft.functions.RingsIntersectExpr(Seq(
      expression(xsA), expression(ysA), expression(lensA),
      expression(xsB), expression(ysB), expression(lensB))))

  /** Doubled even-odd REGION area: |ring 0| − Σ|holes| — st_area's
    * exact twin for polygons-with-holes, orientation-insensitive
    * (each ring absolute-valued). Null on malformed ring structure. */
  def regionArea2(xs: Column, ys: Column, ringLens: Column): Column =
    column(graft.functions.RegionArea2Expr(Seq(
      expression(xs), expression(ys), expression(ringLens))))

  /** Twice the signed shoelace area of a vertex ring — exact integer
    * (st_area's exact twin: divide by 2.0 only at the presentation
    * edge). Positive for counter-clockwise rings. */
  def polygonArea2(xs: Column, ys: Column): Column = {
    val n = size(xs)
    aggregate(sequence(lit(0), n - 1), lit(0L), (acc, i) => {
      val j = (i + 1) % n
      acc + element_at(xs, i + 1) * element_at(ys, j + 1) -
        element_at(xs, j + 1) * element_at(ys, i + 1)
    })
  }

  /** Exact centroid NUMERATORS (6·A·cx, 6·A·cy) of a vertex ring —
    * the standard polygon-centroid formula kept in integers: the true
    * centroid is (cx_num / (3·area2), cy_num / (3·area2)); emitting
    * the numerators keeps the column oracle-exact on any engine and
    * lets the caller choose the rounding. */
  def polygonCentroidNum(xs: Column, ys: Column): Column = {
    val n = size(xs)
    def term(csel: (Column, Column) => Column): Column =
      aggregate(sequence(lit(0), n - 1), lit(0L), (acc, i) => {
        val j = (i + 1) % n
        val cross = element_at(xs, i + 1) * element_at(ys, j + 1) -
          element_at(xs, j + 1) * element_at(ys, i + 1)
        acc + csel(
          element_at(xs, i + 1) + element_at(xs, j + 1),
          element_at(ys, i + 1) + element_at(ys, j + 1)) * cross
      })
    struct(term((sx, _) => sx).as("cx_num"), term((_, sy) => sy).as("cy_num"))
  }

  // ---- grid joins ----------------------------------------------------

  /** Point-in-polygon join: which points fall inside which polygons.
    *
    * @param points (p_id, px, py) integer points
    * @param polys  (poly_id, xs, ys) vertex rings as array<long>
    * @param cell   grid cell edge length (tune ≈ polygon diameter)
    * @return (poly_id, p_id) containment pairs
    *
    * Polygons explode to the grid cells their bbox covers; points map
    * to their single cell (no dedup needed — every emitted pair is
    * found in exactly one cell); candidates filter through the bbox
    * then the exact ray cast. */
  def pointInPolygonJoin(points: DataFrame, polys: DataFrame,
                         cell: Long): DataFrame = {
    val pc = polys
      .withColumn("_x0", array_min(col("xs")))
      .withColumn("_x1", array_max(col("xs")))
      .withColumn("_y0", array_min(col("ys")))
      .withColumn("_y1", array_max(col("ys")))
      .withColumn("cx", explode(sequence(cellId(col("_x0"), cell),
        cellId(col("_x1"), cell))))
      .withColumn("cy", explode(sequence(cellId(col("_y0"), cell),
        cellId(col("_y1"), cell))))
    val tc = points.select(col("p_id"), col("px"), col("py"),
      cellId(col("px"), cell).as("cx"), cellId(col("py"), cell).as("cy"))
    pc.join(tc, Seq("cx", "cy"))
      .filter(col("px").between(col("_x0"), col("_x1")) &&
        col("py").between(col("_y0"), col("_y1")))
      .filter(pointInPolygon(col("px"), col("py"), col("xs"), col("ys")))
      .select(col("poly_id"), col("p_id"))
  }

  /** Polygon-intersects join (boundary touch included).
    *
    * @param a (a_id, axs, ays) vertex rings as array<long>
    * @param b (b_id, bxs, bys)
    * @param cell grid cell edge length
    * @return intersecting (a_id, b_id) pairs
    *
    * Grid-cell candidates over the bboxes, reference-point dedup in
    * the bbox intersection's top-left cell (the
    * [[SpatialJoin.bboxIntersect]] rule — a pure filter, no distinct
    * pass), then the exact polygon predicate. */
  /** Containment join: (a_id, b_id) pairs where polygon A is PROPERLY
    * within polygon B. Candidates need A's bbox inside B's bbox (a
    * strictly tighter prefilter than overlap); dedup emits each pair
    * only in the cell of A's bbox min corner — A's bbox is inside B's,
    * so both sides exploded that cell. */
  def polygonWithinJoin(a: DataFrame, b: DataFrame,
                        cell: Long): DataFrame = {
    def withCells(df: DataFrame, xs: String, ys: String, p: String) =
      df.withColumn(s"_${p}x0", array_min(col(xs)))
        .withColumn(s"_${p}x1", array_max(col(xs)))
        .withColumn(s"_${p}y0", array_min(col(ys)))
        .withColumn(s"_${p}y1", array_max(col(ys)))
        .withColumn("cx", explode(sequence(
          cellId(col(s"_${p}x0"), cell), cellId(col(s"_${p}x1"), cell))))
        .withColumn("cy", explode(sequence(
          cellId(col(s"_${p}y0"), cell), cellId(col(s"_${p}y1"), cell))))
    val ac = withCells(a, "axs", "ays", "a")
    val bc = withCells(b, "bxs", "bys", "b")
    ac.join(bc, Seq("cx", "cy"))
      .filter(col("_ax0") >= col("_bx0") && col("_ax1") <= col("_bx1") &&
        col("_ay0") >= col("_by0") && col("_ay1") <= col("_by1"))
      .filter(col("cx") === cellId(col("_ax0"), cell) &&
        col("cy") === cellId(col("_ay0"), cell))
      .filter(polygonWithin(col("axs"), col("ays"),
        col("bxs"), col("bys")))
      .select(col("a_id"), col("b_id"))
  }

  /** Multi-ring point-in-region join: like [[pointInPolygonJoin]] but
    * the polygon side carries full ring structure (holes /
    * MultiPolygon members) as (poly_id, xs, ys, ring_lens). The bbox
    * over ALL coordinates equals the outer-ring bbox (holes are
    * inside; members all count), so the grid shape is unchanged — a
    * point still lands in exactly one cell, no dedup pass. */
  def pointInRingsJoin(points: DataFrame, polys: DataFrame,
                       cell: Long): DataFrame = {
    val pc = polys
      .withColumn("_x0", array_min(col("xs")))
      .withColumn("_x1", array_max(col("xs")))
      .withColumn("_y0", array_min(col("ys")))
      .withColumn("_y1", array_max(col("ys")))
      .withColumn("cx", explode(sequence(cellId(col("_x0"), cell),
        cellId(col("_x1"), cell))))
      .withColumn("cy", explode(sequence(cellId(col("_y0"), cell),
        cellId(col("_y1"), cell))))
    val tc = points.select(col("p_id"), col("px"), col("py"),
      cellId(col("px"), cell).as("cx"), cellId(col("py"), cell).as("cy"))
    pc.join(tc, Seq("cx", "cy"))
      .filter(col("px").between(col("_x0"), col("_x1")) &&
        col("py").between(col("_y0"), col("_y1")))
      .filter(pointInRings(col("px"), col("py"), col("xs"), col("ys"),
        col("ring_lens")))
      .select(col("poly_id"), col("p_id"))
  }

  /** Fixed-radius point-near-region join: pairs where
    * dist(point, region) ≤ r, region = even-odd multi-ring interior.
    * The polygon side explodes to the cells of its bbox EXPANDED by r
    * (the within-distance locus lives inside that expansion), points
    * keep their single cell — so each qualifying pair meets in
    * exactly one cell and no dedup pass is needed, the
    * [[SpatialJoin.withinDist]] discipline applied to regions. */
  def pointNearRingsJoin(points: DataFrame, polys: DataFrame,
                         cell: Long, r: Long): DataFrame = {
    require(r >= 0, s"radius must be non-negative, got $r")
    val pc = polys
      .withColumn("_x0", array_min(col("xs")) - r)
      .withColumn("_x1", array_max(col("xs")) + r)
      .withColumn("_y0", array_min(col("ys")) - r)
      .withColumn("_y1", array_max(col("ys")) + r)
      .withColumn("cx", explode(sequence(cellId(col("_x0"), cell),
        cellId(col("_x1"), cell))))
      .withColumn("cy", explode(sequence(cellId(col("_y0"), cell),
        cellId(col("_y1"), cell))))
    val tc = points.select(col("p_id"), col("px"), col("py"),
      cellId(col("px"), cell).as("cx"), cellId(col("py"), cell).as("cy"))
    pc.join(tc, Seq("cx", "cy"))
      .filter(col("px").between(col("_x0"), col("_x1")) &&
        col("py").between(col("_y0"), col("_y1")))
      .filter(pointWithinDist(col("px"), col("py"), col("xs"), col("ys"),
        col("ring_lens"), r * r))
      .select(col("poly_id"), col("p_id"))
  }

  /** Multi-ring region-intersects join: (a_id, b_id) pairs whose
    * even-odd regions intersect (boundary touch included). Sides carry
    * (…_id, …xs, …ys, …lens); each side's geometry must be ONE
    * connected polygon-with-holes (ring 0 outer) — the
    * [[graft.functions.GeomPred.ringsIntersect]] completeness
    * contract. Same grid shape as [[polygonIntersectJoin]]: bbox-cell
    * candidates, reference-point dedup in the bbox-intersection's min
    * cell (pure filter, no distinct), then the exact predicate — a
    * region inside the other's HOLE is rejected by ring parity. */
  def ringsIntersectJoin(a: DataFrame, b: DataFrame,
                         cell: Long): DataFrame = {
    def withCells(df: DataFrame, xs: String, ys: String, p: String) =
      df.withColumn(s"_${p}x0", array_min(col(xs)))
        .withColumn(s"_${p}x1", array_max(col(xs)))
        .withColumn(s"_${p}y0", array_min(col(ys)))
        .withColumn(s"_${p}y1", array_max(col(ys)))
        .withColumn("cx", explode(sequence(
          cellId(col(s"_${p}x0"), cell), cellId(col(s"_${p}x1"), cell))))
        .withColumn("cy", explode(sequence(
          cellId(col(s"_${p}y0"), cell), cellId(col(s"_${p}y1"), cell))))
    val ac = withCells(a, "axs", "ays", "a")
    val bc = withCells(b, "bxs", "bys", "b")
    ac.join(bc, Seq("cx", "cy"))
      .filter(col("_ax0") <= col("_bx1") && col("_bx0") <= col("_ax1") &&
        col("_ay0") <= col("_by1") && col("_by0") <= col("_ay1"))
      .filter(col("cx") === cellId(greatest(col("_ax0"), col("_bx0")), cell) &&
        col("cy") === cellId(greatest(col("_ay0"), col("_by0")), cell))
      .filter(ringsIntersect(col("axs"), col("ays"), col("alens"),
        col("bxs"), col("bys"), col("blens")))
      .select(col("a_id"), col("b_id"))
  }

  def polygonIntersectJoin(a: DataFrame, b: DataFrame,
                           cell: Long): DataFrame = {
    def withCells(df: DataFrame, xs: String, ys: String, p: String) =
      df.withColumn(s"_${p}x0", array_min(col(xs)))
        .withColumn(s"_${p}x1", array_max(col(xs)))
        .withColumn(s"_${p}y0", array_min(col(ys)))
        .withColumn(s"_${p}y1", array_max(col(ys)))
        .withColumn("cx", explode(sequence(
          cellId(col(s"_${p}x0"), cell), cellId(col(s"_${p}x1"), cell))))
        .withColumn("cy", explode(sequence(
          cellId(col(s"_${p}y0"), cell), cellId(col(s"_${p}y1"), cell))))
    val ac = withCells(a, "axs", "ays", "a")
    val bc = withCells(b, "bxs", "bys", "b")
    ac.join(bc, Seq("cx", "cy"))
      .filter(col("_ax0") <= col("_bx1") && col("_bx0") <= col("_ax1") &&
        col("_ay0") <= col("_by1") && col("_by0") <= col("_ay1"))
      .filter(col("cx") === cellId(greatest(col("_ax0"), col("_bx0")), cell) &&
        col("cy") === cellId(greatest(col("_ay0"), col("_by0")), cell))
      .filter(polygonsIntersect(col("axs"), col("ays"),
        col("bxs"), col("bys")))
      .select(col("a_id"), col("b_id"))
  }
}
