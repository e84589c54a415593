package graft.streaming

import graft.{Tables, TestSpark}
import graft.streaming.EventStream.{EpisodeEvent, EpisodeUpdate}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming episode assembly ≡ the batch q161 aggregation on the same
  * events: every session closes (gap roll within the stream, or
  * watermark timeout for the final idle ones) and emits its ordered
  * trajectory exactly once, value-equal to the batch row. */
class StreamingEpisodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val gapUs = 30L * 60 * 1000 * 1000

  test("stream episodes ≡ batch assembly; idle sessions close via watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ep-src").toString
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .filter(col("user_id") < 10)
      .select(col("event_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
    ev.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, ts_us BIGINT, " +
        "user_id BIGINT, event_type STRING")
      .parquet(dir)
      .withWatermark("ts", "0 seconds")
      .as[EpisodeEvent]
    val q = EventStream.assembleEpisodes(streamed, gapUs)
      .writeStream.outputMode("append")
      .format("memory").queryName("ep_out")
      .start()
    try {
      q.processAllAvailable()
      // sentinel batches from ANOTHER user push the watermark past every
      // open session + gap; the second batch lets the timeouts fire
      val far = ev.agg(max(col("ts_us"))).head().getLong(0) + 10L * gapUs
      def sentinel(id: Long, us: Long) =
        Seq((id, new java.sql.Timestamp(us / 1000), us, 999999L, "x"))
          .toDF("event_id", "ts", "ts_us", "user_id", "event_type")
      sentinel(900001L, far).write.mode("append").parquet(dir)
      q.processAllAvailable()
      sentinel(900002L, far + 1000L).write.mode("append").parquet(dir)
      q.processAllAvailable()

      val got = spark.table("ep_out").as[EpisodeUpdate]
        .collect().filter(_.user_id != 999999L)
        .map(u => (u.user_id, u.session_id) ->
          (u.n_turns, u.duration_us, u.trajectory)).toMap

      // the q161 batch aggregation on the same slice
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = ev
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_s", when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_turns"),
          (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
          array_join(transform(array_sort(collect_list(
            struct(col("ts_us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), "->").as("trajectory"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getString(4))).toMap

      assert(got == want)
      // the fixture is non-trivial: multi-turn sessions exist
      assert(want.nonEmpty && want.exists(_._2._1 > 1))
    } finally q.stop()
  }
}
