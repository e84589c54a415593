package graft.streaming

import graft.TestSpark
import graft.gdl.TableStore
import graft.sinks.DeadLetter
import graft.sources.CrawlArchive
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Archive dumps arriving as a STREAM: each micro-batch of (archive,
  * bytes) blobs demuxes partition-wise, ok records MERGE into a record
  * table keyed (archive, rec_idx) and quarantine rows route through the
  * replay-guarded dead-letter path — so the whole ingest is
  * exactly-once under foreachBatch replay, and the stored table equals
  * the batch extraction of the same blobs. The shape a Common-Crawl
  * feed runs: blobs land in object storage, the stream tails the
  * listing, nothing is dropped and nothing double-counts. */
class StreamingArchiveIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", 1L, "https://a/x", "2026-08-01", "text/html", "alpha doc"),
      ("a", 2L, null, "2026-08-02", "text/plain", "lost uri"),
      ("b", 3L, "https://b/y", "2026-08-03", "text/html", "beta doc"),
      ("c", 4L, "https://c/z", "2026-08-04", "text/plain", "gamma doc"))
      .toDF("src", "id", "url", "ts", "mime", "txt")
      .withColumn("payload", encode(col("txt"), "UTF-8"))
  }

  test("stream ≡ batch; quarantine routed; replayed batch is a no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("arc-stream").toString
    val store = new TableStore(spark, root, partitioning = Map.empty,
      bloomColumns = Map.empty)
    val srcDir = java.nio.file.Files
      .createTempDirectory("arc-src").toString

    // the foreachBatch body — factored so the replay test can call it
    // directly with a repeated batchId
    def ingest(batch: DataFrame, batchId: Long): Unit = {
      val recs = CrawlArchive.extract(spark, batch, "archive", "bytes")
        .toDF()
        .select(col("archive"), col("rec_idx"), col("status"), col("url"),
          col("fetch_ts"), col("mime"), col("n_bytes"),
          md5(col("body")).as("body_md5"))
        .localCheckpoint(eager = true)
      val clean = DeadLetter.quarantineBatch(store, "arc_dlq",
        source = "arc", batchId = batchId, recs,
        rules = Seq("not_ok" -> (col("status") =!= "ok")))
      // merge key (archive, rec_idx): a replayed micro-batch rewrites
      // the identical rows onto themselves — a fixpoint
      store.merge("arc_records", clean, Seq("archive", "rec_idx"))
    }

    // two micro-batches: archives {a} then {b, c}
    val arcs = CrawlArchive.encode(spark, fixture, "src", "id", "url",
      "ts", "mime", "payload").localCheckpoint(eager = true)
    arcs.filter(col("archive") === "a")
      .write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema("archive STRING, bytes BINARY").parquet(srcDir)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) ingest(b.localCheckpoint(eager = true), id)
      }
      .start()
    try {
      stream.processAllAvailable()
      arcs.filter(col("archive") =!= "a")
        .write.mode("append").parquet(srcDir)
      stream.processAllAvailable()
    } finally stream.stop()

    // stream-fed table ≡ batch extraction of the same blobs (ok rows)
    val want = CrawlArchive.extract(spark, arcs, "archive", "bytes")
      .toDF()
      .filter(col("status") === "ok")
      .select(col("archive"), col("rec_idx"), col("status"), col("url"),
        col("fetch_ts"), col("mime"), col("n_bytes"),
        md5(col("body")).as("body_md5"))
    val got = store.read("arc_records").get
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == 3)

    // the url-less record is in the dead-letter queue, payload intact
    val dlq = store.read("arc_dlq").get.collect()
    assert(dlq.length == 1)
    assert(dlq.head.getAs[String]("reason") == "not_ok")
    assert(dlq.head.getAs[String]("payload").contains("corrupt"))

    // replaying a completed micro-batch changes nothing: the merge is
    // a fixpoint and the dlq append is batch-id guarded
    val before = (got.count(), store.read("arc_dlq").get.count())
    ingest(arcs.filter(col("archive") === "a"), batchId = 0L)
    val after = (store.read("arc_records").get.count(),
      store.read("arc_dlq").get.count())
    assert(before == after, s"replay must be a no-op: $before vs $after")
  }

  test("real-WARC stream: same exactly-once shape on the new read mode") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("warc-stream").toString
    val store = new TableStore(spark, root, partitioning = Map.empty,
      bloomColumns = Map.empty)
    val srcDir = java.nio.file.Files
      .createTempDirectory("warc-src").toString

    val recs = Seq(
      ("a", 1L, "response", "https://a/x", "2026-08-01T00:00:00Z",
        "application/http; msgtype=response",
        "HTTP/1.1 200 OK\r\n\r\nalpha body", false),
      ("a", 2L, "response", "https://a/y", "2026-08-01T00:00:00Z",
        "application/http; msgtype=response", "poisoned away", true),
      ("b", 3L, "response", null, "2026-08-02T00:00:00Z",
        "application/http; msgtype=response",
        "HTTP/1.1 200 OK\r\n\r\nlost uri", false),
      ("b", 4L, "request", "https://b/z", "2026-08-02T00:00:00Z",
        "application/http; msgtype=request", "GET /z HTTP/1.1\r\n\r\n",
        false))
      .toDF("src", "id", "rtype", "url", "ts", "ct", "txt", "poison")
      .withColumn("payload", encode(col("txt"), "UTF-8"))
    val arcs = CrawlArchive.encodeWarc(spark, recs, "src", "id", "rtype",
      "url", "ts", "ct", "payload", poisonIfCol = Some("poison"))
      .localCheckpoint(eager = true)

    def ingest(batch: DataFrame, batchId: Long): Unit = {
      val rows = CrawlArchive.extractWarc(spark, batch, "archive", "bytes")
        .toDF()
        .select(col("archive"), col("rec_idx"), col("status"),
          col("rec_type"), col("url"), col("warc_date"), col("n_bytes"),
          md5(col("body")).as("body_md5"))
        .localCheckpoint(eager = true)
      val clean = DeadLetter.quarantineBatch(store, "warc_dlq",
        source = "warc", batchId = batchId, rows,
        rules = Seq("not_ok" -> (col("status") =!= "ok")))
      store.merge("warc_records", clean, Seq("archive", "rec_idx"))
    }

    arcs.filter(col("archive") === "a")
      .write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema("archive STRING, bytes BINARY").parquet(srcDir)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) ingest(b.localCheckpoint(eager = true), id)
      }
      .start()
    try {
      stream.processAllAvailable()
      arcs.filter(col("archive") === "b")
        .write.mode("append").parquet(srcDir)
      stream.processAllAvailable()
    } finally stream.stop()

    val want = CrawlArchive.extractWarc(spark, arcs, "archive", "bytes")
      .toDF()
      .filter(col("status") === "ok")
      .select(col("archive"), col("rec_idx"), col("status"),
        col("rec_type"), col("url"), col("warc_date"), col("n_bytes"),
        md5(col("body")).as("body_md5"))
    val got = store.read("warc_records").get
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == 2) // a/1 response + b/4 request

    // both quarantine classes landed in the DLQ with payloads intact
    val dlq = store.read("warc_dlq").get.collect()
    assert(dlq.length == 2)
    assert(dlq.forall(_.getAs[String]("reason") == "not_ok"))
    val payloads = dlq.map(_.getAs[String]("payload")).mkString(" ")
    assert(payloads.contains("corrupt_gzip") && payloads.contains("corrupt"))

    // replay fixpoint on the WARC path too
    val before = (got.count(), dlq.length.toLong)
    ingest(arcs.filter(col("archive") === "a"), batchId = 0L)
    val after = (store.read("warc_records").get.count(),
      store.read("warc_dlq").get.count())
    assert(before == after, s"replay must be a no-op: $before vs $after")
  }
}
