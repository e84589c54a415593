package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming per-key rate cap over a single-batch replay must equal
  * the batch `row_number ≤ k` form — per-user winners, sequence numbers
  * and timestamps alike. Cross-batch the cap is arrival-order (an
  * online limiter), which the second test pins: a key exhausted in
  * batch 1 admits nothing in batch 2 even for earlier event times.
  */
class StreamingRateLimitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("single-batch replay equals the batch row_number cap") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("cap-src").toString
    val batch = Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"))
    batch.write.mode("overwrite").parquet(stage)

    val src = spark.readStream
      .schema("event_id LONG, ts_us LONG, user_id LONG")
      .parquet(stage).as[EventStream.CapEvent]
    val q = EventStream.rateLimit(src, maxPerKey = 5L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cap_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cap_out")
        .select(col("user_id"), col("event_id"), col("ts_us"), col("seq"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val expected = batch
        .withColumn("seq", row_number().over(w).cast("long"))
        .filter(col("seq") <= 5L)
        .select(col("user_id"), col("event_id"), col("ts_us"), col("seq"))
      assert(streamed.count() === expected.count())
      assert(streamed.exceptAll(expected).isEmpty &&
             expected.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("across batches the cap is arrival-order: exhausted keys stay shut") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[EventStream.CapEvent]
    val q = EventStream.rateLimit(mem.toDS(), maxPerKey = 2L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cap_two_batches")
      .start()
    try {
      mem.addData(EventStream.CapEvent(10L, 1000L, 1L),
                  EventStream.CapEvent(11L, 2000L, 1L),
                  EventStream.CapEvent(12L, 3000L, 1L))
      q.processAllAvailable()
      // earlier event time, later arrival: still dropped — key 1 is full
      mem.addData(EventStream.CapEvent(13L, 500L, 1L),
                  EventStream.CapEvent(20L, 900L, 2L))
      q.processAllAvailable()
      val out = spark.table("cap_two_batches")
        .select(col("event_id"), col("seq")).as[(Long, Long)]
        .collect().toSet
      assert(out == Set((10L, 1L), (11L, 2L), (20L, 1L)))
    } finally q.stop()
  }

  test("a cap above Int.MaxValue means effectively unlimited, not zero") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[EventStream.CapEvent]
    // (3e9 - 0).toInt wraps negative; take(negative) used to drop 100%
    val q = EventStream.rateLimit(mem.toDS(), maxPerKey = 3000000000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cap_huge")
      .start()
    try {
      mem.addData(EventStream.CapEvent(1L, 1000L, 1L),
                  EventStream.CapEvent(2L, 2000L, 1L))
      q.processAllAvailable()
      assert(spark.table("cap_huge").count() == 2L)
    } finally q.stop()
  }
}
