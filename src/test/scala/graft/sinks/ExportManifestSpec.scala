package graft.sinks

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The delivery-manifest contract: a manifest computed over what was
  * WRITTEN equals one computed over what was MEANT to be written, the
  * fingerprint is order/partitioning-independent, and any row-level
  * drift moves it. */
class ExportManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))

  private def rows(df: DataFrame) =
    df.select("shard", "n_rows", "n_chars", "content_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("manifest over exported files equals manifest over the source") {
    val n = 8
    val out = java.nio.file.Files.createTempDirectory("manifest").toString
    ShardedExport.write(docs, "doc_id", n, out)
    val delivered = spark.read.parquet(out)
    val got = ExportManifest.manifest(delivered,
      col("shard").cast("long"), col("doc_id"), col("text"))
    // expected: same shard rule ShardedExport used, over the source
    val expected = ExportManifest.manifest(
      docs.withColumn("shard",
        pmod(hash(col("doc_id")), lit(n)).cast("long")),
      col("shard"), col("doc_id"), col("text"))
    assert(rows(got) == rows(expected))
    assert(got.count() > 1)
  }

  test("fingerprint is order- and partitioning-independent") {
    val sharded = docs.withColumn("shard", lit(0L))
    val a = ExportManifest.manifest(sharded.repartition(13),
      col("shard"), col("doc_id"), col("text"))
    val b = ExportManifest.manifest(
      sharded.orderBy(desc("text")).coalesce(1),
      col("shard"), col("doc_id"), col("text"))
    assert(rows(a) == rows(b))
  }

  test("manifests combine additively — the O(delta) maintenance property") {
    // split so BOTH halves land rows in every shard — combine must sum
    // within shards, not just union disjoint shard sets
    val half1 = docs.filter(col("doc_id") < 250L)
    val half2 = docs.filter(col("doc_id") >= 250L)
    def m(df: DataFrame) = ExportManifest.manifest(
      df.withColumn("shard", pmod(col("doc_id"), lit(4L))),
      col("shard"), col("doc_id"), col("text"))
    assert(rows(ExportManifest.combine(m(half1), m(half2))) == rows(m(docs)))
  }

  test("fingerprint survives shards past 2^15 rows (LongType sum would overflow)") {
    // 48-bit terms summed in a LongType hit Long.MaxValue at ~32,768
    // rows; production shards are ~65k. The decimal(38,0) accumulator
    // + mod-2^62 reduction must neither throw (ANSI Sum) nor wrap
    // inconsistently: combine() of two halves equals the whole.
    val big = spark.range(70000).toDF("doc_id")
      .withColumn("text", concat(lit("payload-"), col("doc_id")))
      .withColumn("shard", lit(0L))
    def m(df: DataFrame) = ExportManifest.manifest(
      df, col("shard"), col("doc_id"), col("text"))
    val whole = rows(m(big))
    assert(whole.head._2 == 70000L)
    val fp = whole.head._4
    assert(fp >= 0L && fp < ExportManifest.FpModulus)
    val halves = ExportManifest.combine(
      m(big.filter(col("doc_id") < 35000L)),
      m(big.filter(col("doc_id") >= 35000L)))
    assert(rows(halves) == whole)
  }

  test("a changed, dropped, or re-idd row moves the fingerprint") {
    val base = docs.limit(100).localCheckpoint(true)
    val sharded = base.withColumn("shard", lit(0L))
    def fp(df: DataFrame): Long =
      ExportManifest.manifest(df, col("shard"), col("doc_id"), col("text"))
        .select("content_fp").head().getLong(0)
    val clean = fp(sharded)
    // one character of one row
    assert(fp(sharded.withColumn("text",
      when(col("doc_id") === 1L, concat(col("text"), lit("x")))
        .otherwise(col("text")))) != clean)
    // one dropped row
    assert(fp(sharded.filter(col("doc_id") =!= 1L)) != clean)
    // same payloads under permuted ids (a subtle mis-zip)
    assert(fp(sharded.withColumn("doc_id",
      when(col("doc_id") === 1L, 2L).when(col("doc_id") === 2L, 1L)
        .otherwise(col("doc_id")))) != clean)
  }
}
