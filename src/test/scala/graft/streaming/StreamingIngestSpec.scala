package graft.streaming

import graft.{Tables, TestSpark}
import graft.operators.{HtmlExtract, TextNormalize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ingest-hygiene stages (HTML strip, block classification,
  * encoding repair / NFC) are pure projections — they must run
  * UNCHANGED on a stream with zero state and match the batch result
  * row-for-row. This is the property that lets a crawler feed the
  * same operators the batch pipeline uses, no forked code path. */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("html strip + block classify + normalize stream ≡ batch") {
    val stage = java.nio.file.Files.createTempDirectory("ingest-src").toString
    val batchDocs = Tables.load(spark, TestSpark.sfDir, "documents")
    batchDocs.write.mode("overwrite").parquet(stage)

    def hygiene(df: org.apache.spark.sql.DataFrame) = {
      val page = HtmlExtract.syntheticHtml(df, "doc_id", "text")
      HtmlExtract.blocks(page, "doc_id", "html")
        .select(col("doc_id"), col("block_idx"),
          TextNormalize.cleanText(col("block_text")).as("clean_block"),
          col("is_good"))
    }

    val streamed = spark.readStream
      .schema(batchDocs.schema)
      .parquet(stage)
    val q = hygiene(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("ingest_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("ingest_out")
      val want = hygiene(batchDocs)
      assert(got.count() === want.count())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally q.stop()
  }
}
