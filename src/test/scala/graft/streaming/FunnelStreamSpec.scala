package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel's final per-user snapshot must equal the batch
  * q82 funnel over the same events — steps and step timestamps both. */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming funnel final state matches batch q82 per user") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("funnel-src").toString
    val batchEvents = Tables.load(spark, TestSpark.sfDir, "events")
    batchEvents
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
      .write.mode("overwrite").parquet(stage)

    val src = spark.readStream
      .schema("event_id LONG, ts_us LONG, user_id LONG, event_type STRING")
      .parquet(stage).as[EventStream.FunnelEvent]
    val q = EventStream.funnel(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out")
      .start()
    try {
      q.processAllAvailable()
      // last (= max-steps) snapshot per user; funnel state only advances
      val streamed = spark.table("funnel_out")
        .groupBy(col("user_id"))
        .agg(max(struct(col("steps"), col("t1_us"), col("t2_us"), col("t3_us")))
          .as("s"))
        .select(col("user_id"), col("s.t1_us"), col("s.t2_us"),
          col("s.t3_us"), col("s.steps"))
      val expected = graft.queries.EventOps.queries("q82_funnel")(
          spark, TestSpark.sfDir)
        .filter(col("steps") > 0) // stream emits nothing for 0-step users
      assert(streamed.count() === expected.count())
      assert(streamed.exceptAll(expected).isEmpty &&
             expected.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }
}
