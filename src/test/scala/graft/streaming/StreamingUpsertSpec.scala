package graft.streaming

import graft.TestSpark
import graft.gdl.TableStore
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The CDC-apply sink must converge the table to last-write-wins per
  * key across micro-batches, pick the newest version inside a batch,
  * and converge (not double-apply) on an at-least-once replay. */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("v", LongType),
    StructField("seq", LongType)))

  private def tableRows(store: TableStore) =
    store.read("state").get.select("id", "v", "seq")
      .as[(String, Long, Long)].collect().toSet

  test("stream of row versions converges to last-write-wins per key") {
    val src = java.nio.file.Files.createTempDirectory("ups-src").toString
    val tables = java.nio.file.Files.createTempDirectory("ups-tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ups-ckpt").toString
    val store = new TableStore(spark, tables, partitioning = Map.empty)

    // batch 1: a inserts twice (seq 1 then 2 — same batch), b once
    Seq(("a", 10L, 1L), ("a", 11L, 2L), ("b", 20L, 1L))
      .toDF("id", "v", "seq").write.mode("append").parquet(src)
    val q = StreamingUpsert.start(spark, src, schema, store, "state",
      Seq("id"), "seq", ckpt)
    try {
      q.processAllAvailable()
      assert(tableRows(store) == Set(("a", 11L, 2L), ("b", 20L, 1L)))

      // batch 2: update a, insert c
      Seq(("a", 12L, 3L), ("c", 30L, 1L))
        .toDF("id", "v", "seq").write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(tableRows(store) ==
        Set(("a", 12L, 3L), ("b", 20L, 1L), ("c", 30L, 1L)))
      // updates landed as merges, not as accumulated versions
      assert(store.read("state").get.count() == 3L)
    } finally q.stop()
  }

  test("at-least-once replay converges instead of duplicating") {
    val src = java.nio.file.Files.createTempDirectory("ups2-src").toString
    val tables = java.nio.file.Files.createTempDirectory("ups2-tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ups2-ckpt").toString
    val store = new TableStore(spark, tables, partitioning = Map.empty)

    Seq(("a", 10L, 1L), ("b", 20L, 1L))
      .toDF("id", "v", "seq").write.mode("append").parquet(src)
    val q1 = StreamingUpsert.start(spark, src, schema, store, "state",
      Seq("id"), "seq", ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(tableRows(store) == Set(("a", 10L, 1L), ("b", 20L, 1L)))

    // wipe the checkpoint: the same files replay from scratch — the
    // upsert's idempotence absorbs the duplicate delivery
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    val q2 = StreamingUpsert.start(spark, src, schema, store, "state",
      Seq("id"), "seq", ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(tableRows(store) == Set(("a", 10L, 1L), ("b", 20L, 1L)))
    assert(store.read("state").get.count() == 2L)
  }

  test("latestPerKey picks the max-seq version per key") {
    val batch = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("b", 3L, 1L))
      .toDF("id", "v", "seq")
    val got = StreamingUpsert.latestPerKey(batch, Seq("id"), "seq")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 9L), ("b", 3L, 1L)))
  }
}
