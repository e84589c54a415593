package graft.streaming

import graft.TestSpark
import graft.gdl.TableStore
import graft.operators.CorpusCard
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained corpus card fed by a REAL stream: each foreachBatch
  * micro-batch lands in the source table and folds into the card via
  * batch-id-keyed merges, so the additive families are a fixpoint
  * under at-least-once replay — asserted by (a) stream-fed card ≡
  * fresh full rebuild, and (b) an explicit replay of a completed
  * micro-batch changing nothing. */
class StreamingCorpusCardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sentences: DataFrame => DataFrame = docs =>
    docs.select(col("doc_id"),
        posexplode(split(col("text"), "\\|")).as(Seq("sent_idx", "sent_text")))
      .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
        col("sent_text"))

  private val score: DataFrame => DataFrame = docs =>
    docs.select(col("doc_id"),
      (pmod(col("n_chars"), lit(7)).cast("double") / 10.0).as("quality"))

  private def doc(id: Long, src: String, text: String) =
    (id, src, text.length.toLong, text)

  private def df(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("doc_id", "source", "n_chars", "text")

  test("stream-fed card ≡ fresh rebuild; micro-batch replay is a fixpoint") {
    val srcDir = java.nio.file.Files.createTempDirectory("scc-src").toString
    val sourceStore = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("scc-lake").toString)
    val card = new CorpusCard(new TableStore(spark,
        java.nio.file.Files.createTempDirectory("scc-card").toString),
      "c", sentences, score)

    val b1 = Seq(
      doc(10L, "a", "shared first sentence here|second one"),
      doc(11L, "b", "totally different opener|second one"))
    val b2 = Seq(
      doc(20L, "a", "shared first sentence here|fresh tail"),
      doc(21L, "b", "mirror mirror wall|x"))
    val b3 = Seq(
      doc(30L, "a", "mirror mirror wall|x"), // exact dup of 21 → cluster
      doc(31L, "c", "novel closing text|second one"))

    // seed: batch 1 is the built base, already in the lake
    sourceStore.append("docs", df(b1))
    card.build(df(b1))

    def write(rows: Seq[(Long, String, Long, String)]): Unit =
      df(rows).coalesce(1).write.mode("append").parquet(srcDir)

    write(b2)
    val q = card.ingestStream(
        spark.readStream.schema(
          "doc_id BIGINT, source STRING, n_chars BIGINT, text STRING")
          .parquet(srcDir),
        sourceStore, "docs")
      .start()
    try {
      q.processAllAvailable()
      write(b3); q.processAllAvailable()

      val fresh = new CorpusCard(new TableStore(spark,
          java.nio.file.Files.createTempDirectory("scc-fresh").toString),
        "c", sentences, score)
      fresh.build(sourceStore.read("docs").get
        .select(col("doc_id"), col("source"), col("n_chars"), col("text")))
      def cardSet(c: CorpusCard) = c.card().collect().map(_.toSeq).toSet
      assert(cardSet(card) == cardSet(fresh))
      // the dup family actually fired through the stream (21 vs 30)
      val dup = card.card().agg(sum(col("dup_docs"))).collect()(0).getLong(0)
      assert(dup >= 1L)

      // at-least-once replay: re-running micro-batch 0's fold (same
      // batchId, same rows) leaves every state table a fixpoint
      card.refreshBatch(df(b2), sourceStore.read("docs").get, batchId = 0L)
      assert(cardSet(card) == cardSet(fresh))
    } finally q.stop()
  }
}
