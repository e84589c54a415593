package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming frontier cycles ≡ the batch schedule on the same
  * candidates: each (cycle, host) emits its top-k exactly once at
  * window close, the budget holds under backlog bigger than k, and a
  * late-but-in-watermark candidate still wins its slot. */
class FrontierStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("stream cycles ≡ batch; budget holds; in-watermark late row competes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("frontier-src").toString
    // cycle = 10 min. h1 has 5 candidates in cycle 0 (budget 3);
    // h2 has 2; cycle 1 has fresh arrivals for both hosts.
    val batch1 = Seq(
      (ts(1), "h1", 100.0, 7L), (ts(2), "h1", 100.0, 8L),
      (ts(3), "h1", 103.0, 9L), (ts(4), "h1", 12.0, 3L),
      (ts(5), "h2", 100.0, 7L), (ts(6), "h2", 5.0, 0L),
      (ts(11), "h1", 100.0, 17L))
    // late-but-in-watermark: lands in cycle 0 AFTER cycle-1 rows exist
    // (watermark = 10 min holds cycle 0 open), and its ord outranks
    // the stale candidate already there
    val batch2 = Seq((ts(7), "h1", 101.0, 5L), (ts(12), "h2", 100.0, 17L))
    // sentinels push the watermark past every cycle so all close
    val batch3 = Seq((ts(60), "hx", 1.0, 1L))
    val batch4 = Seq((ts(61), "hx", 1.0, 2L))

    def write(rows: Seq[(java.sql.Timestamp, String, Double, Long)]): Unit =
      rows.toDF("ts", "host", "ord", "tie")
        .write.mode("append").parquet(dir)

    write(batch1)
    val streamed = spark.readStream
      .schema("ts TIMESTAMP, host STRING, ord DOUBLE, tie BIGINT")
      .parquet(dir)
    val q = FrontierStream.scheduleCycles(streamed, "10 minutes",
        "10 minutes", k = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("frontier_out")
      .start()
    try {
      q.processAllAvailable()
      write(batch2); q.processAllAvailable()
      write(batch3); q.processAllAvailable()
      write(batch4); q.processAllAvailable()

      val got = spark.table("frontier_out")
        .filter(col("host") =!= "hx")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(2), r.getDouble(3),
          r.getLong(4), r.getLong(5))).toSet

      val all = (batch1 ++ batch2).toDF("ts", "host", "ord", "tie")
      val want = FrontierStream.scheduleCyclesBatch(all, "10 minutes", 3)
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(2), r.getDouble(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got == want)

      // budget: h1 cycle 0 had 6 candidates, exactly 3 scheduled,
      // and the late 101.0 row beat the 100.0 ones on priority
      val h1c0 = got.filter(g => g._2 == "h1" && g._1 == ts(0))
      assert(h1c0.size == 3)
      assert(h1c0.map(_._3) == Set(103.0, 101.0, 100.0))
      // the 100.0 tie went to the lowest tie id (7)
      assert(h1c0.find(_._3 == 100.0).get._4 == 7L)
    } finally q.stop()
  }

  test("crawl-delay budgets: stream ≡ batch, per-host caps hold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("frontier-cd").toString
    // cycle = 10 min (600 s), k = 3. Delays: h1 300 s → budget 2;
    // h3 1200 s (> cycle) → the 1-fetch floor; h2 states none → full 3.
    val delays = Seq(("h1", 300.0), ("h3", 1200.0))
      .toDF("host", "crawl_delay")
    val rows = Seq(
      (ts(1), "h1", 10.0, 1L), (ts(2), "h1", 20.0, 2L),
      (ts(3), "h1", 30.0, 3L), (ts(4), "h1", 40.0, 4L),
      (ts(5), "h2", 10.0, 1L), (ts(6), "h2", 20.0, 2L),
      (ts(7), "h2", 30.0, 3L), (ts(8), "h2", 40.0, 4L),
      (ts(2), "h3", 10.0, 1L), (ts(4), "h3", 20.0, 2L),
      (ts(6), "h3", 30.0, 3L))
    val sentinel = Seq((ts(60), "hx", 1.0, 1L), (ts(61), "hx", 1.0, 2L))

    def write(rs: Seq[(java.sql.Timestamp, String, Double, Long)]): Unit =
      rs.toDF("ts", "host", "ord", "tie")
        .write.mode("append").parquet(dir)

    write(rows)
    val streamed = spark.readStream
      .schema("ts TIMESTAMP, host STRING, ord DOUBLE, tie BIGINT")
      .parquet(dir)
    val q = FrontierStream.scheduleCyclesDelayed(streamed, "10 minutes",
        "10 minutes", k = 3, delays, cycleSecs = 600.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("frontier_cd_out")
      .start()
    try {
      q.processAllAvailable()
      sentinel.grouped(1).foreach { s => write(s); q.processAllAvailable() }

      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0), r.getString(2), r.getDouble(4),
          r.getLong(5), r.getLong(6))
      val got = spark.table("frontier_cd_out")
        .filter(col("host") =!= "hx").collect().map(key).toSet
      val want = FrontierStream.scheduleCyclesDelayedBatch(
          rows.toDF("ts", "host", "ord", "tie"), "10 minutes", 3,
          delays, 600.0)
        .collect().map(key).toSet
      assert(got == want)
      // budgets: h1 capped at 2 (highest-ord pair), h2 full k = 3,
      // h3 floored at 1 despite 3 candidates
      val perHost = got.groupBy(_._2).view.mapValues(_.size).toMap
      assert(perHost == Map("h1" -> 2, "h2" -> 3, "h3" -> 1))
      assert(got.filter(_._2 == "h1").map(_._3) == Set(40.0, 30.0))
      assert(got.filter(_._2 == "h3").map(_._3) == Set(30.0))
    } finally q.stop()
  }

  test("domain grain: stream ≡ batch, subdomains share one eTLD+1 budget") {
    import graft.operators.HostRules
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("frontier-dom").toString
    val psl = Seq("org")
    // one registrant, two sub-hosts, 6 candidates in one cycle: the
    // domain-keyed 300 s delay (cycle 600 s) trims the SHARED budget
    // to 2 — the per-host grain would have scheduled up to 3 each.
    // other.org has no delay and keeps the full k = 3.
    val delays = Seq(("site.org", 300.0)).toDF("host", "crawl_delay")
    val rows = Seq(
      (ts(1), "www.site.org", 10.0, 1L), (ts(2), "cdn.site.org", 20.0, 2L),
      (ts(3), "www.site.org", 30.0, 3L), (ts(4), "cdn.site.org", 40.0, 4L),
      (ts(5), "www.site.org", 50.0, 5L), (ts(6), "cdn.site.org", 60.0, 6L),
      (ts(1), "www.other.org", 10.0, 1L), (ts(2), "www.other.org", 20.0, 2L),
      (ts(3), "cdn.other.org", 30.0, 3L), (ts(4), "cdn.other.org", 40.0, 4L))
    val sentinel = Seq((ts(60), "zz.zz", 1.0, 1L), (ts(61), "zz.zz", 1.0, 2L))

    def write(rs: Seq[(java.sql.Timestamp, String, Double, Long)]): Unit =
      rs.toDF("ts", "host", "ord", "tie").write.mode("append").parquet(dir)

    // the domain key is a stream-side PROJECTION — no join, no state
    def domained(df: org.apache.spark.sql.DataFrame) =
      df.select(col("ts") +: col("ord") +: col("tie") +:
          HostRules.registrableDomainCols(col("host"), psl): _*)
        .select(col("ts"),
          coalesce(col("etld1"), col("public_suffix")).as("host"),
          col("ord"), col("tie"))

    write(rows)
    val streamed = spark.readStream
      .schema("ts TIMESTAMP, host STRING, ord DOUBLE, tie BIGINT")
      .parquet(dir)
    val q = FrontierStream.scheduleCyclesDelayed(domained(streamed),
        "10 minutes", "10 minutes", k = 3, delays, cycleSecs = 600.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("frontier_dom_out")
      .start()
    try {
      q.processAllAvailable()
      sentinel.grouped(1).foreach { s => write(s); q.processAllAvailable() }

      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0), r.getString(2), r.getDouble(4),
          r.getLong(5), r.getLong(6))
      val got = spark.table("frontier_dom_out")
        .filter(col("host") =!= "zz").collect().map(key).toSet
      val want = FrontierStream.scheduleCyclesDelayedBatch(
          domained(rows.toDF("ts", "host", "ord", "tie")),
          "10 minutes", 3, delays, 600.0)
        .collect().map(key).toSet
      assert(got == want)
      // the budget is shared at the DOMAIN grain: 6 site.org
      // candidates from two sub-hosts → exactly 2 scheduled (the two
      // highest ords, one from each sub-host); other.org keeps k = 3
      val perDom = got.groupBy(_._2).view.mapValues(_.size).toMap
      assert(perDom == Map("site.org" -> 2, "other.org" -> 3))
      assert(got.filter(_._2 == "site.org").map(_._3) == Set(60.0, 50.0))
    } finally q.stop()
  }
}
