package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming forms of the engine's event operators.
  *
  * The reference pipeline is batch-with-iteration (SURVEY §2.7 — no
  * streaming operators), so these are engine extensions: the same
  * transforms as [[graft.queries.EventOps]] expressed over an unbounded
  * source, with watermarks bounding state. Because the batch stages are
  * pure DataFrame → DataFrame functions, they run under `foreachBatch`
  * unchanged — the design SURVEY §1.3 called out.
  *
  * Scale: state per window×type key only (watermark expires old state);
  * shuffle partitioning is the regular groupBy hash shuffle. A real
  * deployment reads Kafka; files here, the source is swappable.
  */
object EventStream {

  /** Schema of the streamed events source (ts arrives as epoch micros —
    * produced by [[graft.Tables]]' nanos conversion upstream). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** 5-minute tumbling windowed counts/sums with a 10-minute watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** Read a directory of parquet event files as a stream. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)
}
