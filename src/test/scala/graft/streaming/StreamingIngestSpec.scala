package graft.streaming

import graft.{Tables, TestSpark}
import graft.operators.{HostRules, HtmlExtract, TextNormalize, UrlCanon}
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

  test("url canonicalize + host rules stream ≡ batch (zero state)") {
    val stage = java.nio.file.Files.createTempDirectory("url-src").toString
    val rules = Seq(
      "src7.example.org" -> "block", "ads.src7.example.org" -> "allow",
      "src2.example.org" -> "block")
    val batchDocs = Tables.load(spark, TestSpark.sfDir, "documents")
    batchDocs.write.mode("overwrite").parquet(stage)

    // the crawl-frontier hygiene projection: dirty url → canonical url
    // + host verdict, all stateless (the stream-safe rule variant)
    def hygiene(df: org.apache.spark.sql.DataFrame) = {
      val url = concat(
        when(col("doc_id") % 2 === 0, "HTTPS://www.").otherwise("https://"),
        when(col("doc_id") % 3 === 0, "cdn.").otherwise(""),
        col("source"), lit(".example.org/p/"),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 5 === 0, "?utm_source=feed#top").otherwise(""))
      val host = regexp_extract(UrlCanon.canonicalize(url),
        "^https?://([^/]*)", 1)
      df.select(Seq(col("doc_id"),
        UrlCanon.canonicalize(url).as("canonical_url")) ++
        HostRules.longestSuffixMatchCols(host, rules, default = "allow"): _*)
    }

    val q = hygiene(spark.readStream.schema(batchDocs.schema).parquet(stage))
      .writeStream.outputMode("append")
      .format("memory").queryName("url_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("url_out")
      val want = hygiene(batchDocs)
      assert(got.count() === want.count())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // the verdicts are live (not vacuously 'allow'): both actions occur
      assert(want.select("action").distinct().count() === 2)
    } finally q.stop()
  }
}
