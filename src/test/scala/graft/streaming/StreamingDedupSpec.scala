package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact-dedup semantics: first copy wins within the
  * watermark window; state expires after it (bounded state is the point
  * of the operator — and its documented trade-off). */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  private def ts(minute: Int) = new Timestamp(3600_000L + minute * 60_000L)

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, Timestamp, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "ts", "text")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/staging_$name")
    // atomically publish into the watched dir (file source lists per batch)
    val src = new java.io.File(s"$dir/staging_$name")
    src.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
      case (f, i) => java.nio.file.Files.move(f.toPath,
        java.nio.file.Path.of(dir, s"$name-$i.parquet"))
    }
  }

  test("duplicates within the watermark window are suppressed, first copy wins") {
    val dir = Files.createTempDirectory("sdedup").toString
    writeBatch(dir, "b0", Seq(
      (1L, ts(0), "alpha"), (2L, ts(1), "alpha"), (3L, ts(1), "beta"),
      (4L, ts(2), "alpha"), (5L, ts(3), "beta")))

    val in = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingDedup.exactByContent(in, "text", "ts", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sdedup_out").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 3L)) // one survivor per distinct content
    } finally q.stop()
  }

  test("per-row simhash equals the batch explode+groupBy form on real docs") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sfDir, "documents")
    val perRow = docs
      .withColumn("_hs", graft.functions.TextFunctions.tokenHashes(col("text")))
      .select(col("doc_id"),
        graft.functions.TextFunctions.simhash16FromHashes(col("_hs")).as("simhash"))
    val batch = graft.operators.Dedup.simhash16(docs, "doc_id", "text")
    assert(perRow.exceptAll(batch).isEmpty && batch.exceptAll(perRow).isEmpty)
  }

  test("near-dup streaming dedup collapses whitespace variants exact dedup misses") {
    val dir = Files.createTempDirectory("sdedup-near").toString
    writeBatch(dir, "b0", Seq(
      (1L, ts(0), "alpha beta gamma"),
      (2L, ts(1), "alpha  beta   gamma"), // same tokens, different bytes
      (3L, ts(1), "something else entirely")))
    val in = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingDedup.nearBySimhash(in, "text", "ts", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_near").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sdedup_near").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 3L), s"whitespace variant not collapsed: $out")
    } finally q.stop()
  }

  test("a duplicate beyond the watermark window is emitted again (bounded state)") {
    val dir = Files.createTempDirectory("sdedup2").toString
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(dir)
    writeBatch(dir, "b0", Seq((1L, ts(0), "gamma")))
    val q = StreamingDedup.exactByContent(in, "text", "ts", "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_late").start()
    try {
      q.processAllAvailable() // batch 0: gamma@t0 emitted; watermark still behind
      // batch 1 advances the watermark far past t0+5m, expiring gamma's state
      writeBatch(dir, "b1", Seq((2L, ts(60), "delta")))
      q.processAllAvailable()
      // batch 2: duplicate gamma, re-emitted because its state is gone
      writeBatch(dir, "b2", Seq((3L, ts(61), "gamma")))
      q.processAllAvailable()
      val out = spark.table("sdedup_late").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 2L, 3L),
        "expected the post-expiry duplicate to be re-emitted")
    } finally q.stop()
  }
}
