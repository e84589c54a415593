package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join vs the equivalent batch join: stage the
  * sf events as two file-stream sources split by event type and check
  * the streamed attribution pairs match batch exactly. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed interval join matches the batch range join") {
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    // view → click attribution; the sf0.001 fixture is sparse (~1k
    // events/15 users over a month), so a 2h window yields real pairs
    val (lType, rType) = ("view", "click")
    val lDir = java.nio.file.Files.createTempDirectory("ij-left").toString
    val rDir = java.nio.file.Files.createTempDirectory("ij-right").toString
    events.filter(col("event_type") === lType).write.mode("overwrite").parquet(lDir)
    events.filter(col("event_type") === rType).write.mode("overwrite").parquet(rDir)

    val q = EventStream.intervalJoin(
        EventStream.readEvents(spark, lDir),
        EventStream.readEvents(spark, rDir),
        watermark = "1 hour", maxDelay = "2 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ij_out")
      val l = events.filter(col("event_type") === lType)
        .select(col("event_id").as("l_event_id"), col("ts").as("l_ts"),
                col("user_id"))
      val r = events.filter(col("event_type") === rType)
        .select(col("event_id").as("r_event_id"), col("ts").as("r_ts"),
                col("user_id").as("r_user"), col("value").as("r_value"))
      val expected = l.join(r, expr(
          """user_id = r_user AND
             r_ts >= l_ts AND
             r_ts <= l_ts + interval 2 hours"""))
        .select(col("user_id"), col("l_event_id"), col("r_event_id"),
                col("l_ts"), col("r_ts"), col("r_value"))
      assert(expected.count() > 0, "fixture produced no joinable pairs")
      assert(streamed.count() == expected.count())
      assert(streamed.exceptAll(expected).isEmpty &&
             expected.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }
}
