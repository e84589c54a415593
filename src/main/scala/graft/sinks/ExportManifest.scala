package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delivery manifest for an exported corpus: per shard, the row count,
  * payload size, and an ORDER-FREE content fingerprint — what a
  * training job checks before trusting a shard, and what makes a
  * re-export provably identical (or provably not) without re-reading
  * both sides row by row.
  *
  * The fingerprint is `sum(48-bit md5 slice of "id:md5(payload)"))`:
  * addition commutes, so the aggregate is map-side-combinable and
  * independent of row order / partitioning — no sorted collect_list of
  * the shard (the naive fingerprint) anywhere. 48 bits per row keeps
  * the sum far from Long overflow for any shard below ~32k billion
  * rows. A single changed, added, or dropped row shifts the sum with
  * probability 1 - 2^-48 per colliding pair; this is an integrity
  * check against drift and truncation, not a cryptographic MAC.
  *
  * Scale: one groupBy(shard) over the export — partial aggregation
  * means the shuffle carries one row per (mapper, shard). */
object ExportManifest {

  /** Per-row 48-bit fingerprint term (exposed for reuse/oracle parity). */
  def rowFingerprint(idCol: Column, payloadCol: Column): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(":"),
      md5(payloadCol.cast("string")))), 1, 12), 16, 10).cast("long")

  /** Manifest rows: (shard, n_rows, n_chars, content_fp). `shard` is
    * whatever column the export partitioned by — for [[ShardedExport]]
    * output, read the parquet back and pass its `shard` column. */
  def manifest(df: DataFrame, shardCol: Column, idCol: Column,
               payloadCol: Column): DataFrame =
    df.groupBy(shardCol.as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(payloadCol)).cast("long").as("n_chars"),
        sum(rowFingerprint(idCol, payloadCol)).as("content_fp"))

  /** Manifests are ADDITIVE: every column is a sum, so the manifest of
    * an append-only table is maintainable at O(delta) — fold each new
    * generation's manifest into the stored one instead of rescanning
    * the export (the change-feed pattern `TableStore.readChangesSince`
    * drives). Combining manifests of disjoint row sets equals the
    * manifest of their union (ExportManifestSpec). */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("shard"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("content_fp")).as("content_fp"))
}
