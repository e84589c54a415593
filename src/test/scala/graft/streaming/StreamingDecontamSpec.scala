package graft.streaming

import graft.{Tables, TestSpark}
import graft.operators.{Decontaminate, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-time contamination gating on a STREAM: the benchmark table,
  * the train-frozen mean, and the bench band codes are static
  * index-build artifacts; arriving train vectors are centered, coded
  * and verified per micro-batch with zero state. The data-independent
  * hyperplane family is what makes stream codes joinable against
  * stored codes — this spec pins that the streamed gate emits exactly
  * the batch `semanticBanded` pair set. */
class StreamingDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed contamination gate ≡ batch semanticBanded") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val train = e.filter(col("id") >= 20L)
    val bench = e.filter(col("id") < 20L)

    val expected = Decontaminate.semanticBanded(train, bench,
        threshold = 0.3, bands = 16, planesPerBand = 4, dim = 64)
      .select(col("train_id"), col("bench_id"), col("band"))

    // the "index build": freeze the train mean once, store it
    val sums = Dedup.quantizedSums(train, 64).localCheckpoint(eager = true)

    val stage = java.nio.file.Files.createTempDirectory("dec-src").toString
    train.write.mode("overwrite").parquet(stage)
    val trainStream = spark.readStream.schema(train.schema).parquet(stage)

    val q = Decontaminate.semanticBandedStream(trainStream, bench, sums,
        threshold = 0.3, bands = 16, planesPerBand = 4, dim = 64)
      .select(col("train_id"), col("bench_id"), col("band"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dec_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("dec_out")
      assert(got.count() === expected.count())
      assert(got.exceptAll(expected).isEmpty &&
             expected.exceptAll(got).isEmpty)
    } finally q.stop()
  }
}
