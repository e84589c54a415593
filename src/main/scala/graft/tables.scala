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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw nanos and truncate to microseconds
    * (exactly what DuckDB's `CAST(ts AS TIMESTAMP)` does, so oracle
    * comparisons stay value-exact). Integer `DIV` keeps full precision —
    * a double division would lose bits above 2^53. */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Register all tables as temp views (used by tests and Bench). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
