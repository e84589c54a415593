package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial equi-gridded bbox-intersection join — the geospatial lake's
  * core join (which items touch this tile / which assets cover this
  * query window), expressed Spark-first: each box explodes to the grid
  * cells it covers (map-only), candidates come from an equi-join on
  * the cell key, and the exact closed-interval intersection test
  * filters survivors. A pair sharing k cells would surface k times;
  * instead of a distinct (an extra shuffle over the result), each pair
  * reports ONLY in the top-left cell of its intersection — the
  * standard reference-point duplicate-avoidance trick, a pure filter.
  * Pair space is O(boxes per cell²) summed over cells — never
  * |A|·|B| — and the cell size is the tuning knob against box size
  * (bigger cells → fewer explode rows, more false candidates; the
  * classic spatial-join tradeoff).
  *
  * Everything is integer arithmetic (cell ids via integer division,
  * overlap areas as exact products), so results are value-exact in any
  * engine, and an oracle can verify with the direct θ-join condition —
  * the grid is an execution strategy, not a semantics change.
  */
object SpatialJoin {

  /** @param a boxes (a_id, ax0, ax1, ay0, ay1) — closed integer intervals
    * @param b boxes (b_id, bx0, bx1, by0, by1)
    * @param cell grid cell edge length
    * @return intersecting pairs (a_id, b_id, overlap_area) where
    *         overlap_area counts the closed-interval lattice overlap
    */
  /** Uniform floor cell id (divide-then-truncate would make cell 0 span
    * (-cell, cell) — double width, quadrupling the hottest cell's pair
    * term for origin-centered data; floor matches RangeJoin's buckets). */
  private def cellId(c: Column, cell: Long): Column =
    floor(c.cast("double") / cell).cast("long")

  def bboxIntersect(a: DataFrame, b: DataFrame, cell: Long): DataFrame = {
    def cells(df: DataFrame, x0: String, x1: String, y0: String, y1: String) =
      df.withColumn("cx", explode(sequence(cellId(col(x0), cell),
          cellId(col(x1), cell))))
        .withColumn("cy", explode(sequence(cellId(col(y0), cell),
          cellId(col(y1), cell))))
    val ac = cells(a, "ax0", "ax1", "ay0", "ay1")
    val bc = cells(b, "bx0", "bx1", "by0", "by1")
    ac.join(bc, Seq("cx", "cy"))
      .filter(col("ax0") <= col("bx1") && col("bx0") <= col("ax1") &&
        col("ay0") <= col("by1") && col("by0") <= col("ay1"))
      // reference-point dedup: emit only in the intersection's
      // top-left cell, so no distinct pass is needed (same cellId as
      // the explode — a mismatched rounding would LOSE pairs whose
      // reference point rounds outside the exploded range)
      .filter(col("cx") === cellId(greatest(col("ax0"), col("bx0")), cell) &&
        col("cy") === cellId(greatest(col("ay0"), col("by0")), cell))
      .select(col("a_id"), col("b_id"),
        ((least(col("ax1"), col("bx1")) - greatest(col("ax0"), col("bx0")) + 1L) *
          (least(col("ay1"), col("by1")) - greatest(col("ay0"), col("by0")) + 1L))
          .as("overlap_area"))
  }

  // long arithmetic regardless of the caller's integer width: int
  // inputs would otherwise overflow the product (axis gaps > 46k), and
  // an int d2 feeding shiftleft(_, 33) is a MASKED 1-bit shift in Java
  private def d2(px: Column, py: Column, qx: Column, qy: Column): Column = {
    val (dx, dy) = (px.cast("long") - qx.cast("long"),
      py.cast("long") - qy.cast("long"))
    dx * dx + dy * dy
  }

  /** Exact k-NN, brute-force pair space but BOUNDED shuffle: queries
    * broadcast against one corpus scan, then per-query top-k via the
    * [[TopK]] aggregate instead of a window. The window form shuffles
    * and sorts every (point × query) pair; this shuffles at most
    * k · mappers rows per query — at |P|=15k, |Q|=1k that is 15M pair
    * rows reduced map-side to 96k, and the plan is a partial/final
    * ObjectHashAggregate with no global sort.
    *
    * Compute is still O(|P|·|Q|); [[knnGrid]] is the scale path that
    * prunes the pair space itself.
    *
    * @param pts (id, px, py) integer points
    * @param qs  (query_id, qx, qy) integer query points — broadcast side
    * @return (query_id, rank 1..k, id, d2), d2 ascending, ties on id
    */
  def knn(pts: DataFrame, qs: DataFrame, k: Int): DataFrame =
    topKAsc(pts.crossJoin(broadcast(qs))
      .select(col("query_id"), col("id"),
        d2(col("px"), col("py"), col("qx"), col("qy")).as("d2")), k)

  /** Per-query exact top-k by d2 ascending (id breaks ties) from a
    * (query_id, id, d2) candidate set, as a bounded codegen aggregate
    * over (d2, id) packed into one long: d2 in the high bits so packed
    * order IS (d2 asc, id asc). Exact iff 0 ≤ id < 2³³ and the WINNING
    * distances fit 2³⁰. Far candidates (d2 ≥ 2³⁰, e.g. brute-force
    * pairs across a wide corpus) SATURATE at the cap instead of failing
    * the job — a saturated pair can never outrank one that fits, so
    * ordering among possible winners is unchanged. Only if a saturated
    * pair actually WINS a top-k slot (the true kth distance itself
    * exceeds the packable range) does the query fail, loudly, on the
    * k emitted rows — not on every candidate pair. */
  private def topKAsc(cand: DataFrame, k: Int): DataFrame = {
    val id = col("id").cast("long")
    val dCap = (1L << 30) - 1L
    val idInRange = id >= 0L && id < (1L << 33)
    // assert_true is NULL when the condition holds — coalesce folds it
    // into the packing for free, and a violation fails the job loudly
    val packed = shiftleft(least(col("d2"), lit(dCap)), 33) + id +
      coalesce(assert_true(idInRange,
        lit("spatial knn packing overflow: need 0 <= id < 2^33"))
        .cast("long"), lit(0L))
    val outD2 = shiftright(col("pk"), 33)
    cand.groupBy(col("query_id"))
      .agg(TopK.minKPacked(k)(packed).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "pk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("pk").bitwiseAND((1L << 33) - 1L).as("id"),
        (outD2 + coalesce(assert_true(outD2 < dCap,
          lit("spatial knn: a top-k distance saturated the 2^30 packing " +
            "cap — results would be mis-ranked; use a coarser grid")).cast("long"),
          lit(0L))).as("d2"))
  }

  /** Exact distance-within join: every (query, point) pair with
    * d² ≤ r² — the fixed-radius neighbor primitive (geofencing,
    * proximity dedup). Points bucket once into r-sized cells, each
    * query probes its 3×3 neighborhood: with cell = r, any pair
    * within r differs by ≤ 1 cell per axis, so the probe is COMPLETE,
    * and each pair surfaces exactly once (the point lives in one
    * cell) — no dedup pass. Pair space is O(local density), never
    * |P|·|Q|; the oracle verifies with the direct θ-join.
    *
    * @param pts (id, px, py) integer points
    * @param qs  (query_id, qx, qy) integer query points
    * @return (query_id, id, d2) pairs with d2 ≤ r²
    */
  def withinDist(pts: DataFrame, qs: DataFrame, r: Long): DataFrame = {
    require(r >= 1L, s"radius must be >= 1, got $r")
    val pc = pts.select(col("id"), col("px"), col("py"),
      cellId(col("px"), r).as("cx"), cellId(col("py"), r).as("cy"))
    val probe = qs
      .withColumn("cx", explode(sequence(cellId(col("qx"), r) - 1L,
        cellId(col("qx"), r) + 1L)))
      .withColumn("cy", explode(sequence(cellId(col("qy"), r) - 1L,
        cellId(col("qy"), r) + 1L)))
    probe.join(pc, Seq("cx", "cy"))
      .select(col("query_id"), col("id"),
        d2(col("px"), col("py"), col("qx"), col("qy")).as("d2"))
      .filter(col("d2") <= r * r)
  }

  /** Exact grid-probed k-NN — the 100 TB plan. Points bucket once into
    * `cell`-sized grid cells; each query probes only its 3×3 cell
    * neighborhood (an equi-join on the cell key, candidates =
    * O(local density), never |P|·|Q|). The probe is exact for a query
    * when it yields k hits and the kth distance is strictly inside the
    * probe's guarantee radius: any point outside the 3×3 block differs
    * by ≥ cell+1 on some axis, so d2 ≥ (cell+1)². The (typically empty)
    * remainder of queries falls back to the brute [[knn]] — a union of
    * a cheap bulk path and an exact rescue path, the standard
    * filter-and-refine spatial idiom.
    *
    * Strict `<` in the guarantee: an unprobed point can tie the kth
    * candidate at exactly (cell+1)² and win on the id tie-break, so
    * equality is not resolvable from the probe alone.
    */
  def knnGrid(pts: DataFrame, qs: DataFrame, k: Int, cell: Long): DataFrame = {
    val pc = pts.select(col("id"), col("px"), col("py"),
      cellId(col("px"), cell).as("cx"), cellId(col("py"), cell).as("cy"))
    val probe = qs
      .withColumn("cx", explode(sequence(cellId(col("qx"), cell) - 1L,
        cellId(col("qx"), cell) + 1L)))
      .withColumn("cy", explode(sequence(cellId(col("qy"), cell) - 1L,
        cellId(col("qy"), cell) + 1L)))
    val cand = probe.join(pc, Seq("cx", "cy"))
      .select(col("query_id"), col("id"),
        d2(col("px"), col("py"), col("qx"), col("qy")).as("d2"))
    val guarantee = (cell + 1L) * (cell + 1L)
    // materialize once: three consumers (resolved rows, the resolved-id
    // anti-join, the final union) would otherwise re-run the probe join
    // + aggregate — the dominant stage — per consumer. Result is
    // k-bounded per query, so the checkpoint is tiny.
    val topped = topKAsc(cand, k)
      .withColumn("resolved",
        max(when(col("rank") === k && col("d2") < guarantee, true))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("query_id")))
      .localCheckpoint(true)
    val resolvedRows = topped.filter(col("resolved")).drop("resolved")
    val unresolved = qs.join(
      resolvedRows.select(col("query_id")).distinct(),
      Seq("query_id"), "left_anti")
    resolvedRows.unionByName(knn(pts, unresolved, k))
  }
}
