package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming windowed aggregation over the sf0.001 events by
  * staging them as a file-stream source and comparing the complete-mode
  * result to the equivalent batch aggregation. */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming windowed agg matches the batch equivalent") {
    val stage = java.nio.file.Files.createTempDirectory("stream-src").toString
    val batch = Tables.load(spark, TestSpark.sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    batch.write.mode("overwrite").parquet(stage)

    val q = EventStream.windowedAgg(EventStream.readEvents(spark, stage))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select(col("window_start"), col("event_type"), col("n_events"))
      val expected = batch
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"), col("event_type"),
                col("n_events"))
      assert(streamed.count() === expected.count())
      assert(streamed.exceptAll(expected).isEmpty &&
             expected.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }
}
