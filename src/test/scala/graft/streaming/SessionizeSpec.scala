package graft.streaming

import graft.{Tables, TestSpark}
import graft.streaming.EventStream.{SessionEvent, SessionUpdate}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming sessionization must produce exactly the closed
  * sessions of the batch window-lag formulation (q30), bar the final
  * still-open session per user (never closed in an unbounded stream). */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val gapUs = 30L * 60 * 1000 * 1000

  test("flatMapGroupsWithState sessions match the batch sessionization") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("sess-src").toString
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    events.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
                  col("user_id"))
      .write.mode("overwrite").parquet(stage)

    val streamed = spark.readStream
      .schema("event_id BIGINT, ts_us BIGINT, user_id BIGINT")
      .parquet(stage)
      .as[SessionEvent]
    val q = EventStream.sessionize(streamed, gapUs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions_out").as[SessionUpdate].collect()
        .map(s => (s.user_id, s.session_id, s.n_events, s.start_us, s.end_us)).toSet

      // batch truth (same formulation as q30), minus each user's last session
      val batch = graft.SparkEntry.queries("q30_sessionize")(spark, TestSpark.sfDir)
      val lastW = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      val want = batch
        .withColumn("max_s", max(col("session_id")).over(lastW))
        .filter(col("session_id") < col("max_s"))
        .select("user_id", "session_id", "n_events", "start_us", "end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet

      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
