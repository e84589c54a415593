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
  * argmax window whose partition size is bounded by the node's
  * distinct-neighbour-label count (≤ degree) — never a global sort.
  * Labels are localCheckpointed per round so plan depth stays O(1)
  * across iterations (the KMeans/PageRank discipline).
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
      val w = Window.partitionBy(col("node"))
        .orderBy(col("cnt").desc, col("label"))
      labels = counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint()
    }
    labels
  }
}
