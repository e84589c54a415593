package graft.operators

import org.apache.spark.sql.DataFrame
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
  * `min_by` argmax over the deterministic (-cnt, label) order — a
  * hash aggregate with map-side partial combine, which replaced the
  * original row_number window (same semantics, but no per-node sort
  * and no separate window shuffle stage; the window was the largest
  * per-round fixed cost at toy scale, VERDICT r11 #6). Labels are
  * localCheckpointed per round so plan depth stays O(1) across
  * iterations (the KMeans/PageRank discipline).
  *
  * @param edges both-orientation edge list (src, dst) — callers union
  *              the reverse orientation for undirected graphs
  */
object LabelProp {

  def run(edges: DataFrame, iters: Int): DataFrame = {
    var labels = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val counts = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
      // argmax by (cnt desc, label asc) == min_by over (-cnt, label):
      // struct ordering compares fields left to right, so the highest
      // count wins and ties go to the smallest label — identical to
      // the row_number window this replaced, minus its per-node sort
      labels = counts
        .groupBy(col("node"))
        .agg(min_by(col("label"),
          struct((-col("cnt")).as("nc"), col("label").as("lb"))).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
