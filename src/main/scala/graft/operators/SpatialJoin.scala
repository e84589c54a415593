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
  def bboxIntersect(a: DataFrame, b: DataFrame, cell: Long): DataFrame = {
    def cells(df: DataFrame, x0: String, x1: String, y0: String, y1: String) =
      df.withColumn("cx", explode(sequence(col(x0).divide(cell).cast("long"),
          col(x1).divide(cell).cast("long"))))
        .withColumn("cy", explode(sequence(col(y0).divide(cell).cast("long"),
          col(y1).divide(cell).cast("long"))))
    val ac = cells(a, "ax0", "ax1", "ay0", "ay1")
    val bc = cells(b, "bx0", "bx1", "by0", "by1")
    ac.join(bc, Seq("cx", "cy"))
      .filter(col("ax0") <= col("bx1") && col("bx0") <= col("ax1") &&
        col("ay0") <= col("by1") && col("by0") <= col("ay1"))
      // reference-point dedup: emit only in the intersection's
      // top-left cell, so no distinct pass is needed
      .filter(col("cx") ===
          greatest(col("ax0"), col("bx0")).divide(cell).cast("long") &&
        col("cy") ===
          greatest(col("ay0"), col("by0")).divide(cell).cast("long"))
      .select(col("a_id"), col("b_id"),
        ((least(col("ax1"), col("bx1")) - greatest(col("ax0"), col("bx0")) + 1L) *
          (least(col("ay1"), col("by1")) - greatest(col("ay0"), col("by0")) + 1L))
          .as("overlap_area"))
  }
}
