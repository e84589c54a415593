package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation — community detection on the engine's
  * graph family (BFS = reachability, CC = connectivity, PageRank =
  * importance, LPA = communities). Labels start as node ids; each
  * unrolled round every node adopts the most frequent label among its
  * neighbours, ties to the smallest label — fully deterministic, unlike
  * textbook async LPA, so results are value-exact cross-engine.
  *
  * Scale shape: one round = one equi-join (edges ⋈ labels on the
  * neighbour end) + a (node, label) count aggregate + a per-node
  * argmax. The argmax is a PACKED-LONG `max` whenever every label fits
  * 33 bits: cnt·2^33 + (2^33−1−label) orders by (cnt asc, label desc),
  * so `max` picks the highest count with ties to the smallest label —
  * one primitive-buffer HashAggregate with map-side partial combine.
  * The obvious alternatives both regress: a row_number window adds a
  * per-node sort stage (the r11 shape), and `min_by` over a struct key
  * leaves the primitive-buffer fast path entirely (measured 1.4× worse
  * than the window at 10× data, despite winning at sf0.1 — the
  * VERDICT r11 #6 investigation). Labels outside the 33-bit bound take
  * the window path: same semantics, decided by ONE node-sized
  * min/max aggregate up front (a model-sized driver scalar, the
  * KMeans discipline). Counts cap at 2^30−1 so the pack can't
  * overflow — above that, ties break by label, which a >10^9-degree
  * node has earned. Labels are localCheckpointed per round so plan
  * depth stays O(1) across iterations (the KMeans/PageRank
  * discipline).
  *
  * @param edges both-orientation edge list (src, dst) — callers union
  *              the reverse orientation for undirected graphs
  */
object LabelProp {

  private val LabelCap = (1L << 33) - 1
  private val CntCap = (1L << 30) - 1

  def run(edges: DataFrame, iters: Int): DataFrame = {
    var labels = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    // one node-sized aggregate decides the argmax strategy for the run
    val bounds = labels.agg(min(col("node")), max(col("node"))).head()
    // getAs[Number]: integer-keyed edge lists stay accepted (getLong
    // on an IntegerType row throws ClassCastException at runtime)
    val packed = !bounds.isNullAt(0) &&
      bounds.getAs[Number](0).longValue >= 0L &&
      bounds.getAs[Number](1).longValue < LabelCap
    for (_ <- 1 to iters) {
      val counts = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
      labels = (if (packed)
        counts.groupBy(col("node"))
          .agg(max(least(col("cnt"), lit(CntCap)) * lit(LabelCap + 1L) +
            (lit(LabelCap) - col("label"))).as("m"))
          .select(col("node"),
            (lit(LabelCap) - pmod(col("m"), lit(LabelCap + 1L))).as("label"))
      else {
        val w = Window.partitionBy(col("node"))
          .orderBy(col("cnt").desc, col("label"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("node"), col("label"))
      }).localCheckpoint()
    }
    labels
  }
}
