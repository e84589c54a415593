package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delivery manifest for an exported corpus: per shard, the row count,
  * payload size, and an ORDER-FREE content fingerprint — what a
  * training job checks before trusting a shard, and what makes a
  * re-export provably identical (or provably not) without re-reading
  * both sides row by row.
  *
  * The fingerprint is `sum(48-bit md5 slice of "id:md5(payload)")
  * mod 2^62`: addition commutes, so the aggregate is
  * map-side-combinable and independent of row order / partitioning —
  * no sorted collect_list of the shard (the naive fingerprint)
  * anywhere. The running sum accumulates in decimal(38,0) (capacity
  * ~10^38 over 2^48-bounded terms → safe past 10^23 rows per shard;
  * a LongType sum would overflow — and under ANSI mode throw — at
  * just 2^15 rows), then reduces mod 2^62 so the published column
  * fits a signed long. The wrap is intentional and additive:
  * (a mod M + b mod M) mod M = (a+b) mod M, so [[combine]] stays
  * exact. A single changed, added, or dropped row shifts the sum with
  * probability 1 - 2^-48 per colliding pair; this is an integrity
  * check against drift and truncation, not a cryptographic MAC.
  *
  * Scale: one groupBy(shard) over the export — partial aggregation
  * means the shuffle carries one row per (mapper, shard). */
object ExportManifest {

  /** Modulus for the published fingerprint: 2^62, so the reduced sum
    * always fits a signed long with headroom. */
  val FpModulus: Long = 1L << 62

  /** Per-row 48-bit fingerprint term (exposed for reuse/oracle parity). */
  def rowFingerprint(idCol: Column, payloadCol: Column): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(":"),
      md5(payloadCol.cast("string")))), 1, 12), 16, 10).cast("long")

  /** decimal(38,0)-accumulated, mod-2^62-reduced sum of `terms` —
    * the only overflow-safe way to publish the fingerprint as a long. */
  private def fpSum(terms: Column): Column =
    pmod(sum(terms.cast("decimal(38,0)")), lit(FpModulus).cast("decimal(38,0)"))
      .cast("long")

  /** Manifest rows: (shard, n_rows, n_chars, content_fp). `shard` is
    * whatever column the export partitioned by — for [[ShardedExport]]
    * output, read the parquet back and pass its `shard` column. */
  def manifest(df: DataFrame, shardCol: Column, idCol: Column,
               payloadCol: Column): DataFrame =
    df.groupBy(shardCol.as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(payloadCol)).cast("long").as("n_chars"),
        fpSum(rowFingerprint(idCol, payloadCol)).as("content_fp"))

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
        fpSum(col("content_fp")).as("content_fp"))
}
