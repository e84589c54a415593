package graft.streaming

import graft.TestSpark
import graft.gdl.TableStore
import graft.operators.QualityRules
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming quality gate must equal the batch rule battery: every
  * doc that arrives ends up in exactly one of curated/quarantine, split
  * exactly as q135's oracle-pinned rules split it, across micro-batch
  * boundaries. */
class StreamingQualityGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", StringType), StructField("text", StringType)))

  /** Passes every rule: 60 words, ~5.7 mean chars, 58 unique, 2 stop
    * words, no symbols/bullets/ellipses. */
  private def goodText(salt: Int): String =
    ("the and " + (1 to 58).map(i => s"word$salt$i").mkString(" "))

  test("streamed split equals the batch rule battery across micro-batches") {
    val docsDir = java.nio.file.Files.createTempDirectory("qg-docs").toString
    val tables = java.nio.file.Files.createTempDirectory("qg-tables").toString
    val ckpt = java.nio.file.Files.createTempDirectory("qg-ckpt").toString
    val store = new TableStore(spark, tables, partitioning = Map.empty)

    val batch1 = Seq(
      ("good1", goodText(1)),
      ("short1", "too short"), // fails r_word_count
      ("rep1", Seq.fill(60)("the").mkString(" "))) // fails r_mean_wl? no: fails r_unique
    val batch2 = Seq(
      ("good2", goodText(2)),
      // 7 hashes over 61 words = 114754 ppm ≥ the 100000 cap, while
      // every earlier rule still passes — isolates fails_r_symbol
      ("sym1", goodText(9) + " #######"))

    batch1.toDF("doc_id", "text").write.mode("append").parquet(docsDir)
    val q = StreamingQualityGate.start(spark, docsDir, schema, store,
      "curated", "quarantine", ckpt)
    try {
      q.processAllAvailable()
      batch2.toDF("doc_id", "text").write.mode("append").parquet(docsDir)
      q.processAllAvailable()

      val curated = store.read("curated").get
      val quarantined = store.read("quarantine").get

      // streamed ≡ batch: the same docs pass as the batch operator says
      val allDocs = (batch1 ++ batch2).toDF("doc_id", "text")
      val batchPass = QualityRules.withSignals(allDocs, "text")
        .filter(col("passes")).select("doc_id").as[String].collect().toSet
      assert(batchPass == Set("good1", "good2")) // the fixture intends this
      assert(curated.select("doc_id").as[String].collect().toSet == batchPass)
      // curated keeps the clean document schema + the replay tag
      assert(curated.schema.fieldNames.toSet == Set("doc_id", "text", "batch_id"))

      // quarantine holds the rest, tagged with the FIRST violated rule
      val reasons = quarantined
        .select(org.apache.spark.sql.functions.get_json_object(
          col("payload"), "$.doc_id").as("doc_id"), col("reason"))
        .as[(String, String)].collect().toMap
      assert(reasons.keySet == Set("short1", "rep1", "sym1"))
      assert(reasons("short1") == "fails_r_word_count")
      assert(reasons("rep1") == "fails_r_unique")
      assert(reasons("sym1") == "fails_r_symbol")

      // nothing vanished and nothing double-landed
      assert(curated.count() + quarantined.count() == 5L)
    } finally q.stop()
  }

  test("a replayed micro-batch converges instead of double-writing") {
    val docsDir = java.nio.file.Files.createTempDirectory("qg2-docs").toString
    val tables = java.nio.file.Files.createTempDirectory("qg2-tables").toString
    val ckpt = java.nio.file.Files.createTempDirectory("qg2-ckpt").toString
    val store = new TableStore(spark, tables, partitioning = Map.empty)

    Seq(("good1", goodText(1)), ("short1", "too short"))
      .toDF("doc_id", "text").write.mode("append").parquet(docsDir)
    val q1 = StreamingQualityGate.start(spark, docsDir, schema, store,
      "curated", "quarantine", ckpt)
    try q1.processAllAvailable() finally q1.stop()

    // restart from a WIPED checkpoint: the same files replay as batch 0
    // again; the per-sink guards must make the reprocessing a no-op
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    val q2 = StreamingQualityGate.start(spark, docsDir, schema, store,
      "curated", "quarantine", ckpt)
    try q2.processAllAvailable() finally q2.stop()

    assert(store.read("curated").get.count() == 1L)
    assert(store.read("quarantine").get.count() == 1L)
  }
}
