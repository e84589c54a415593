package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative breadth-first reachability over an edge table.
  *
  * Re-expresses the reference's recursive STAC-link traversal with cycle
  * guard (`/root/reference/backend/check_stac_metadata/utils.py:99-130`:
  * DFS over `links[].href`, skipping `traversed_urls`) as a Spark
  * frontier loop: per level, `frontier ⋈ edges` discovers children, a
  * `left_anti` join against the visited set is the cycle guard
  * (`utils.py:129` `not in traversed_urls`), and a `union` accumulates
  * the visited set.
  *
  * Scale notes (100 TB design):
  *  - The per-level join shuffles on `src`; for a fixed big edge table
  *    repartition it on `src` once up front so every level reuses the
  *    same exchange instead of re-shuffling (`edges` is persisted by the
  *    caller).
  *  - The frontier is usually tiny relative to edges → Spark's AQE turns
  *    the per-level join into a broadcast join at runtime.
  *  - `visited` is persisted and its lineage cut each level
  *    (`localCheckpoint`) so plan depth stays O(1) instead of O(levels).
  *  - Termination uses the frontier count, one cheap action per level —
  *    the reference's traversal is likewise driver-coordinated.
  */
object GraphBfs {

  /** All nodes reachable from `roots` following `edges(src → dst)`,
    * with their BFS depth (min distance). Output: (node, depth).
    *
    * @param edges    DataFrame with columns `src`, `dst`
    * @param roots    DataFrame with column `node`
    * @param maxDepth hard cap on levels (cycle-proof bound)
    */
  def reachable(edges: DataFrame, roots: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // localCheckpoint(eager) everywhere instead of persist: it cuts
    // lineage so the plan stays O(1) deep per level AND its blocks are
    // reclaimed by the ContextCleaner once unreferenced — a persist per
    // level would pin one cache entry per level of every reachable()
    // call for the life of the session (the leak minhashLsh documents)
    var visited = roots.select(col("node")).distinct()
      .withColumn("depth", lit(0L))
      .localCheckpoint(eager = true)
    var frontier = visited
    var depth = 0L
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      // using-column joins + rename avoid ambiguous-self-join resolution
      // (each level's frontier derives from the same `edges` lineage)
      val next = frontier.select(col("node").as("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("depth", lit(depth))
        .localCheckpoint(eager = true)
      visited = visited.union(next).localCheckpoint(eager = true)
      frontier = next
    }
    visited
  }

  /** Convenience: BFS where edges/roots are given as SQL-ish tuples. */
  def reachableFrom(spark: SparkSession, edges: DataFrame, root: String,
                    maxDepth: Int): DataFrame = {
    import spark.implicits._
    reachable(edges, Seq(root).toDF("node"), maxDepth)
  }
}
