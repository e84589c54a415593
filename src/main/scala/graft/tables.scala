package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish testdata
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
  *
  * All engine queries take `(SparkSession, sfDir)` and resolve tables
  * through here so the same query text runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has varied across driver testdata drops: parquet
    * TIMESTAMP(NANOS) (Spark's vectorized reader rejects it — read as
    * raw nanos and truncate to microseconds, exactly what DuckDB's
    * `CAST(ts AS TIMESTAMP)` does; integer `DIV` keeps full precision
    * where a double division would lose bits above 2^53) and plain
    * TIMESTAMP(MICROS) (reads natively as TIMESTAMP_NTZ). Branch on the
    * schema actually read; the sessions all run UTC, so the NTZ→LTZ
    * cast is value-identity and oracle comparisons stay exact. */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Register all tables as temp views (used by tests and Bench). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
