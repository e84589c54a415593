package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export — the sink side of a curation pipeline: the
  * selected corpus written as `nShards` parquet shard directories of
  * near-equal row count, deterministically, so a training job can map
  * shard → worker and a re-run reproduces the same shard contents.
  *
  * Shard assignment is `pmod(hash(key), n)` (murmur3 with Spark's fixed
  * seed — stable across runs and partitionings, unlike any
  * row-position-based scheme). Every row of shard s lives in exactly one
  * task after `repartition(n, shard)`, so each `shard=s/` directory gets
  * exactly ONE data file; `sortWithinPartitions(shard, key)` fixes the
  * row order inside it. Collisions (two shard values hashing to one
  * task) cost parallelism, not correctness.
  *
  * Determinism is at the CONTENT level: a re-run reproduces the same
  * rows in the same order per shard, but parquet part-file names embed
  * job/task UUIDs, so the files are not byte-identical across runs. A
  * shard value that receives zero rows (possible when nShards
  * approaches the distinct-key count) would naturally produce no
  * `shard=s/` directory at all; [[write]] creates an empty directory
  * for every such shard so a shard → worker mapping never hits a
  * nonexistent path.
  *
  * Scale: one shuffle sized by the output, a sort within each shard,
  * and parquet's directory-partition pruning on `shard=` for readers
  * that want a subset.
  */
object ShardedExport {

  def write(df: DataFrame, keyCol: String, nShards: Int, outDir: String): Unit = {
    df.withColumn("shard", pmod(hash(col(keyCol)), lit(nShards)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
    // guarantee every shard path exists, even for empty shards
    val out = new Path(outDir)
    val fs = out.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    (0 until nShards).foreach(s => fs.mkdirs(new Path(out, s"shard=$s")))
  }
}
