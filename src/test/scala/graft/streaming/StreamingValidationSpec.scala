package graft.streaming

import graft.TestSpark
import graft.gdl._
import graft.gdl.TestFixtures._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous-validation flow: manifest rows dropped as files into the
  * stream source get checksummed and recorded, including late-arriving
  * batches. */
class StreamingValidationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed manifest rows produce validation rows per micro-batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-manifest").toString
    val tables = java.nio.file.Files.createTempDirectory("stream-tables").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream-ckpt").toString
    val good = Array.tabulate[Byte](100)(_.toByte)
    val bad = Array.tabulate[Byte](100)(i => (i + 1).toByte)
    val reader = new InMemoryUrlReader(Map(
      "s3://b/good.bin" -> good, "s3://b/bad.bin" -> bad))
    val store = new TableStore(spark, tables)

    // batch 1: one passing asset
    Seq(ProcessingAssetRow("d1", "v1", "DATA", 0L, "s3://b/good.bin",
        Some(multihash256(good))))
      .toDS().write.mode("append").parquet(dir)
    val q = StreamingValidation.start(spark, dir, reader, store, ckpt)
    try {
      q.processAllAvailable()
      val after1 = store.read("validation_results").get.as[ValidationRow].collect()
      assert(after1.length == 1 && after1.head.result == Result.Passed)

      // batch 2 arrives later: an asset whose multihash doesn't match
      Seq(ProcessingAssetRow("d1", "v1", "DATA", 1L, "s3://b/bad.bin",
          Some(multihash256(good)))) // wrong digest for bad.bin
        .toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val after2 = store.read("validation_results").get.as[ValidationRow].collect()
      assert(after2.length == 2)
      val failed = after2.find(_.url == "s3://b/bad.bin").get
      assert(failed.result == Result.Failed)
      assert(failed.details("message").startsWith("Checksum mismatch: expected "))

      // batch 3: a poison row — MISSING multihash. It must become a
      // Failed row, not an uncaught exception that fails the micro-batch
      // and replays the same file from the checkpoint forever
      Seq(ProcessingAssetRow("d1", "v1", "DATA", 2L, "s3://b/good.bin", None))
        .toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(q.isActive, "a malformed multihash must not kill the stream")
      val after3 = store.read("validation_results").get.as[ValidationRow].collect()
      assert(after3.length == 3)
      val poison = after3.filter(r =>
        r.details.get("message").exists(_.startsWith("Malformed multihash")))
      assert(poison.length == 1 && poison.head.result == Result.Failed)

      // every streamed generation carries its micro-batch tag (the
      // replay guard's detection column)
      val tagged = store.read("validation_results").get
      assert(tagged.schema.fieldNames.contains("batch_id"))
      assert(tagged.filter(org.apache.spark.sql.functions.col("batch_id").isNull)
        .count() == 0L)
    } finally q.stop()
  }
}
