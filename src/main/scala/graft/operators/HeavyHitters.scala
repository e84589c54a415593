package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-element detection without a full-key shuffle —
  * per-partition Misra-Gries summaries plus an exact verify pass.
  *
  * Phase 1 runs the Misra-Gries k-counter stream summary inside each
  * partition (`mapPartitions` — genuinely imperative per-partition
  * state, the case the operator guide reserves it for). Guarantee: a
  * key with partition-local count > n_p/k survives partition p's
  * summary, so any key with GLOBAL count > n/k = Σn_p/k must exceed
  * n_p/k in at least one partition (pigeonhole) and appears in the
  * candidate union. Phase 2 counts ONLY the ≤ k·partitions candidates
  * exactly (broadcast semi-join, map-side-combinable count) and keeps
  * those above the n/k line — so the OUTPUT is exact and deterministic
  * even though the candidate superset depends on partitioning.
  *
  * At 100 TB this replaces a full groupBy over the key space (shuffle
  * of every distinct key) with two scans whose shuffled data is k·
  * partitions candidate keys — the sketch-then-verify layout used by
  * every production heavy-hitters pass. The count comparison
  * `cnt·k > n` stays in exact long arithmetic.
  */
object HeavyHitters {

  /** @return (key, cnt, n) for every key whose count exceeds n/k */
  def exact(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("key")).as[String]
    val candidates = keys.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { key =>
        counters.get(key) match {
          case Some(c) => counters(key) = c + 1
          case None if counters.size < k => counters(key) = 1L
          case None => // decrement-all step: shrink every counter, drop zeros
            val dead = List.newBuilder[String]
            counters.foreach { case (kk, c) =>
              if (c == 1L) dead += kk else counters(kk) = c - 1
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.distinct().toDF("key")
    val total = df.agg(count(lit(1)).as("n"))
    // null-SAFE join: a null key can be a legitimate heavy hitter (it
    // still counts toward n), and an equi-join would silently drop it
    // from the report while it inflates the qualifying denominator
    df.select(col(keyCol).cast("string").as("key"))
      .join(broadcast(candidates.select(col("key").as("_ck"))),
        col("key") <=> col("_ck"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("n"))
      .select(col("key"), col("cnt"), col("n"))
  }
}
