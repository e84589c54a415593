package graft.streaming

import graft.operators.Geometry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed geofence occupancy — the streaming face of the geometry
  * tier: an event-time stream of points (vehicles, sensor pings,
  * request origins) joined against a STATIC polygon set (zones,
  * footprints), counted per (event-time window × polygon), emitted
  * exactly once at window close under the watermark.
  *
  * Shape: the polygon side explodes ONCE to its bbox's covering grid
  * cells and is localCheckpoint-materialized — the static side of a
  * stream-static join re-executes every micro-batch, and without the
  * checkpoint each batch would redo the explode (the q203 domDelays
  * lesson). Stream points map to their single cell map-side (zero
  * state), the cell equi-join bounds candidates by local density, the
  * native exact ray cast admits, and the only stateful operator is
  * the windowed count — state is one row per (window, polygon),
  * never a point backlog. 100 TB shape: this is the standard
  * geofencing topology; the cell size tunes candidates exactly as in
  * [[Geometry.pointInPolygonJoin]].
  */
object GeoStream {

  private def cellId(c: org.apache.spark.sql.Column, cell: Long) =
    floor(c.cast("double") / cell).cast("long")

  /** Cells-exploded, bbox-annotated polygon relation (the static
    * join side), materialized eagerly. */
  private def polyCells(polys: DataFrame, cell: Long): DataFrame =
    polys
      .withColumn("_x0", array_min(col("xs")))
      .withColumn("_x1", array_max(col("xs")))
      .withColumn("_y0", array_min(col("ys")))
      .withColumn("_y1", array_max(col("ys")))
      .withColumn("cx", explode(sequence(cellId(col("_x0"), cell),
        cellId(col("_x1"), cell))))
      .withColumn("cy", explode(sequence(cellId(col("_y0"), cell),
        cellId(col("_y1"), cell))))
      .localCheckpoint(true)

  /** The shared plan body: candidates → exact PIP → windowed count. */
  private def counted(points: DataFrame, tsCol: String, pc: DataFrame,
                      cell: Long, windowDur: String): DataFrame =
    points
      .withColumn("cx", cellId(col("px"), cell))
      .withColumn("cy", cellId(col("py"), cell))
      .join(pc, Seq("cx", "cy"))
      .filter(col("px").between(col("_x0"), col("_x1")) &&
        col("py").between(col("_y0"), col("_y1")))
      .filter(Geometry.pointInPolygon(col("px"), col("py"),
        col("xs"), col("ys")))
      .groupBy(window(col(tsCol), windowDur), col("poly_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("window.start").as("window_start"), col("poly_id"),
        col("n_hits"))

  /** Streaming form: `points` is a streaming DataFrame with
    * (tsCol TIMESTAMP, p_id, px, py); `polys` a static
    * (poly_id, xs, ys) relation. Append mode: a (window, polygon)
    * row is emitted exactly once, when the watermark passes the
    * window end. */
  def geofenceCounts(points: DataFrame, tsCol: String, polys: DataFrame,
                     cell: Long, windowDur: String,
                     watermark: String): DataFrame =
    counted(points.withWatermark(tsCol, watermark), tsCol,
      polyCells(polys, cell), cell, windowDur)

  /** Batch twin over the same plan body — what the stream must equal
    * on any bounded input (GeoStreamSpec pins it). */
  def geofenceCountsBatch(points: DataFrame, tsCol: String,
                          polys: DataFrame, cell: Long,
                          windowDur: String): DataFrame =
    counted(points, tsCol, polyCells(polys, cell), cell, windowDur)
}
