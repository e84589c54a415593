package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Hamming-1 near-dup: every pair the batch multiprobe finds
  * within the watermark window is emitted exactly once; pairs farther
  * apart in event time than the delay are the batch sweep's job. */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  private def ts(minute: Int) = new Timestamp(3600_000L + minute * 60_000L)

  private def writeBatch(dir: String, name: String,
                         rows: Seq[(Long, Timestamp, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "ts", "text")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/staging_$name")
    val src = new java.io.File(s"$dir/staging_$name")
    src.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
      case (f, i) => java.nio.file.Files.move(f.toPath,
        java.nio.file.Path.of(dir, s"$name-$i.parquet"))
    }
  }

  /** Start the query, then publish each batch and drain it before the
    * next — one micro-batch per element, so the watermark advances
    * between them (all-files-up-front would collapse into one batch). */
  private def streamed(dir: String, delayMs: Long, sink: String,
                       batches: Seq[(Long, Timestamp, String)]*): Set[(Long, Long, Long)] = {
    val in = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingDedup.nearBySimhashH1(in, "doc_id", "text", "ts", delayMs)
      .writeStream.outputMode("append")
      .format("memory").queryName(sink).start()
    try batches.zipWithIndex.foreach { case (rows, i) =>
      writeBatch(dir, s"b$i", rows)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sink)
      .select(least(col("id_a"), col("id_b")), greatest(col("id_a"), col("id_b")),
        col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("streamed pairs equal the batch multiprobe on real documents") {
    // 40 real docs (plenty of near-dups in the synthetic corpus) in one
    // event-time window, streamed across two micro-batches
    val docs = graft.Tables.load(spark, graft.TestSpark.sfDir, "documents")
      .filter(col("doc_id") < 40L)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val rows = docs.map { case (id, text) => (id, ts(id.toInt % 20), text) }
    val dir = Files.createTempDirectory("sneardup").toString
    val got = streamed(dir, delayMs = 3600_000L, sink = "sneardup_out",
      rows.filter(_._1 % 2 == 0).toSeq, rows.filter(_._1 % 2 == 1).toSeq)
    val want = graft.operators.Dedup.simhashNearDup(
        graft.Tables.load(spark, graft.TestSpark.sfDir, "documents")
          .filter(col("doc_id") < 40L), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must actually contain near-dup pairs")
  }

  test("a near-dup arriving beyond the watermark delay is not matched") {
    val dir = Files.createTempDirectory("sneardup-exp").toString
    // identical token multisets → hamming 0; 30 min apart, 5 min delay.
    // The watermark is one batch behind (it advances AFTER a batch), so
    // an unrelated middle batch at ts(20) moves it past doc 1's expiry
    // before doc 2 arrives — the same sequencing the exact-dedup expiry
    // spec uses.
    val got = streamed(dir, delayMs = 5 * 60_000L, sink = "sneardup_exp_out",
      Seq((1L, ts(0), "the quick brown fox")),
      Seq((9L, ts(20), "zzz yyy xxx www")),
      Seq((2L, ts(30), "the quick brown fox")))
    assert(got.isEmpty)
  }

  test("a replayed identity row neither re-emits nor amplifies later pairs") {
    val dir = Files.createTempDirectory("sneardup-replay").toString
    val text = "replay guard fixture tokens"
    val got = streamed(dir, delayMs = 3600_000L, sink = "sneardup_rp_out",
      Seq((1L, ts(0), text)),
      Seq((1L, ts(0), text)),               // at-least-once replay of doc 1
      Seq((2L, ts(2), text)))               // genuine dup arrives after
    // exactly ONE (1,2) pair: the replayed registration must not have
    // created a second entry, and the replay itself must not match
    assert(got.toSeq == Seq((1L, 2L, 0L)))
  }

  test("within the window, both hamming-0 and hamming-1 pairs emit once") {
    val dir = Files.createTempDirectory("sneardup-h1").toString
    // same tokens → d=0; one substituted token → usually d<=1 at 16 bits:
    // pick texts verified to differ by exactly one fingerprint bit
    val base = "alpha beta gamma delta"
    val spark0 = spark
    import spark0.implicits._
    val fp = Seq((1L, base), (2L, base), (3L, "alpha beta gamma epsilon"))
      .toDF("doc_id", "text")
      .withColumn("_hs", graft.functions.TextFunctions.tokenHashes(col("text")))
      .select(col("doc_id"),
        graft.functions.TextFunctions.simhash16FromHashes(col("_hs")).as("sh"))
      .as[(Long, Long)].collect().toMap
    val d13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L)).toLong
    val got = streamed(dir, delayMs = 3600_000L, sink = "sneardup_h1_out",
      Seq((1L, ts(0), base), (2L, ts(1), base),
        (3L, ts(2), "alpha beta gamma epsilon")))
    val expected = scala.collection.mutable.Set((1L, 2L, 0L))
    if (d13 <= 1L) { expected += ((1L, 3L, d13)); expected += ((2L, 3L, d13)) }
    assert(got == expected.toSet)
  }
}
