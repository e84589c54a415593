package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Archive round-trip + the corruption contract: records extract in
  * order, a missing required header quarantines (kept, not dropped),
  * container/framing damage degrades to typed quarantine rows. */
class CrawlArchiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    Seq(
      ("a", 1L, "https://a/x", "2026-08-01", "text/html", "hello"),
      ("a", 2L, null, "2026-08-02", "text/plain", "lost request line"),
      ("a", 3L, "https://a/z", "2026-08-03", "text/plain", ""),
      ("b", 7L, "https://b/q", "2026-08-04", "text/html", "other archive"))
      .toDF("src", "id", "url", "ts", "mime", "txt")
      .withColumn("payload", encode(col("txt"), "UTF-8"))
  }

  test("round-trip: records extract in id order; quarantine keeps bytes") {
    val arc = CrawlArchive.encode(spark, fixture, "src", "id", "url", "ts",
      "mime", "payload")
    val got = CrawlArchive.extract(spark, arc, "archive", "bytes")
      .collect().map(r => (r.archive, r.rec_idx) ->
        (r.status, Option(r.url), r.mime, r.n_bytes,
          new String(r.body, "UTF-8"))).toMap
    assert(got.size == 4)
    assert(got(("a", 0L)) ==
      (("ok", Some("https://a/x"), "text/html", 5L, "hello")))
    // the url-less record is QUARANTINED with everything framing
    // proves — mime, length, payload — intact
    assert(got(("a", 1L)) ==
      (("corrupt", None, "text/plain", 17L, "lost request line")))
    // zero-length payloads are legal records, not corruption
    assert(got(("a", 2L)) == (("ok", Some("https://a/z"), "text/plain", 0L, "")))
    assert(got(("b", 0L)) ==
      (("ok", Some("https://b/q"), "text/html", 13L, "other archive")))
  }

  test("bad magic / short blob → one corrupt_container row") {
    for (bytes <- Seq(Array[Byte](), "GARB1234extra".getBytes("UTF-8"),
        Array[Byte]('G', 'A'))) {
      val rows = CrawlArchive.demux("x", bytes)
      assert(rows.map(r => (r.rec_idx, r.status)) ==
        Seq((-1L, "corrupt_container")))
    }
  }

  test("newline-bearing header values never break framing downstream") {
    import spark.implicits._
    // hostile metadata: a url carrying \n, \r\n, and a blank-line
    // sequence — unescaped these would shift the framing and degrade
    // every LATER record in the blob to one 'truncated' row
    val recs = Seq(
      ("h", 1L, "https://h/a\nInjected: x", "2026-08-01", "text/html", "r1"),
      ("h", 2L, "https://h/b\r\n\r\nGARC", "2026\n-08-02", "text/\nplain", "r2"),
      ("h", 3L, "https://h/c", "2026-08-03", "text/plain", "r3"))
      .toDF("src", "id", "url", "ts", "mime", "txt")
      .withColumn("payload", encode(col("txt"), "UTF-8"))
    val arc = CrawlArchive.encode(spark, recs, "src", "id", "url", "ts",
      "mime", "payload")
    val rows = CrawlArchive.extract(spark, arc, "archive", "bytes")
      .collect().sortBy(_.rec_idx)
    // every record survives as ok — framing held; newline runs fold
    // to single spaces in the carried values
    assert(rows.map(_.status).toSeq == Seq("ok", "ok", "ok"))
    assert(rows(0).url == "https://h/a Injected: x")
    assert(rows(1).url == "https://h/b GARC" &&
      rows(1).fetch_ts == "2026 -08-02" && rows(1).mime == "text/ plain")
    assert(rows(2).url == "https://h/c" &&
      new String(rows(2).body, "UTF-8") == "r3")
  }

  test("framing break mid-archive → prior records kept, rest truncated") {
    val arc = CrawlArchive.encode(spark, fixture.filter(col("src") === "a"),
        "src", "id", "url", "ts", "mime", "payload")
      .collect().head.getAs[Array[Byte]]("bytes")
    // chop inside record 1's payload: record 0 must survive, the rest
    // must collapse to one typed 'truncated' row at the break index
    val cut = java.util.Arrays.copyOf(arc, arc.length - 30)
    val rows = CrawlArchive.demux("a", cut)
    assert(rows.head.status == "ok" && rows.head.rec_idx == 0L)
    assert(rows.last.status == "truncated")
    assert(rows.map(_.status).count(_ == "truncated") == 1)
  }
}
