package graft.streaming

import graft.{Tables, TestSpark}
import graft.operators.Robots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Robots admission on a crawl STREAM: the projection-shaped matcher
  * (rules as a per-host array, match as a pure per-row projection) is
  * stateless after one stream-static host join, so each arriving doc
  * gets its verdict independently — no watermark, no state store —
  * and the stream result must equal the batch result row-for-row.
  * The join variant cannot run on a stream (its best-match window is
  * stateful); this spec is why the projection variant exists. */
class RobotsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("robots admission stream ≡ batch (projection + static rules)") {
    val stage = java.nio.file.Files.createTempDirectory("robots-src").toString
    val batchDocs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        concat(col("source"), lit(".example.org")).as("host"),
        concat(lit("/"),
          when(col("doc_id") % 4 === 0, "docs")
            .when(col("doc_id") % 4 === 1, "static")
            .when(col("doc_id") % 4 === 2, "api").otherwise("img"),
          lit("/p"), (col("doc_id") % 5).cast("string"),
          lit("/x"), (col("doc_id") % 7).cast("string")).as("path"))
    batchDocs.write.mode("overwrite").parquet(stage)

    // the static side: raw bodies for half the hosts (the other half
    // exercises the no-rules default on a stream), one body with a
    // root disallow + carve-out, one star-only, one with an anchor
    val bodies = {
      import spark.implicits._
      Seq(
        ("src0.example.org",
          "User-agent: graftbot\nDisallow: /\nAllow: /docs\n"),
        ("src1.example.org",
          "User-agent: *\nDisallow: /static\nAllow: /static/p1\n"),
        ("src2.example.org",
          "User-agent: graftbot\nDisallow: /api\nAllow: /api/p0/x1$\n"))
        .toDF("host", "robots")
    }

    def admit(df: org.apache.spark.sql.DataFrame) =
      Robots.admitProjected(df, "doc_id", "host", "path",
        bodies, "host", "robots", "GraftBot", default = "allow")

    val streamed = spark.readStream.schema(batchDocs.schema).parquet(stage)
    val q = admit(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("robots_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("robots_out")
      val want = admit(batchDocs)
      assert(got.count() === want.count() && want.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // the stream actually disallowed something (root rule bites)
      assert(got.filter(col("action") === "disallow").count() > 0)
    } finally q.stop()
  }
}
