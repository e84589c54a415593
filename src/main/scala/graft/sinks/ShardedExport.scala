package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export — the sink side of a curation pipeline: the
  * selected corpus written as exactly `nShards` parquet shards of
  * near-equal row count, deterministically, so a training job can map
  * shard → worker and a re-run reproduces byte-identical shards.
  *
  * Shard assignment is `pmod(hash(key), n)` (murmur3 with Spark's fixed
  * seed — stable across runs and partitionings, unlike any
  * row-position-based scheme). Every row of shard s lives in exactly one
  * task after `repartition(n, shard)`, so each `shard=s/` directory gets
  * exactly ONE file; `sortWithinPartitions(shard, key)` fixes the order
  * inside it. Collisions (two shard values hashing to one task) cost
  * parallelism, not correctness.
  *
  * Scale: one shuffle sized by the output, a sort within each shard,
  * and parquet's directory-partition pruning on `shard=` for readers
  * that want a subset.
  */
object ShardedExport {

  def write(df: DataFrame, keyCol: String, nShards: Int, outDir: String): Unit =
    df.withColumn("shard", pmod(hash(col(keyCol)), lit(nShards)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
}
