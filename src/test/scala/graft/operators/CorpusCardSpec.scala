package graft.operators

import graft.TestSpark
import graft.gdl.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained corpus card ≡ a full recompute, across a sequence
  * of change-feed-driven refreshes with a source-table compaction in
  * the middle (the IncrementalAggSpec poll pattern): volume/quality
  * fold additively, sentence counts through the min-combine index
  * under the monotone-pk batch contract, and dup counts re-derive
  * from the exactly-maintained closure — so card() after N polls must
  * hash-match card() from one fresh build over the full corpus. */
class CorpusCardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic toy families: sentences = split on "|", quality =
  // (n_chars % 7) / 10.0 — stateless, so frozen-model additivity is
  // exact by construction
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

  test("change-feed-driven card equals full recompute across appends + compaction") {
    val root = java.nio.file.Files.createTempDirectory("card-spec").toString
    val store = new TableStore(spark, root)
    val cardStore = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("card-state").toString)
    val card = new CorpusCard(cardStore, "c", sentences, score)

    // batch 1: a near-dup pair (10, 11) within the batch, duplicated
    // sentences within and across docs
    val b1 = Seq(
      doc(10L, "a", "the quick brown fox jumps clear|second sentence here"),
      doc(11L, "a", "the quick brown fox jumps clear|unique tail sentence"),
      doc(12L, "b", "completely different text body|second sentence here"))
    // batch 2: doc 20 near-dups the stored pair's text (cross-batch
    // cluster growth); doc 21 repeats a stored sentence verbatim
    val b2 = Seq(
      doc(20L, "b", "the quick brown fox jumps clear|late copy arrives"),
      doc(21L, "c", "second sentence here|brand new material"))
    // batch 3 (post-compaction): singleton + an intra-batch dup pair
    val b3 = Seq(
      doc(30L, "c", "nothing like the others at all"),
      doc(31L, "a", "mirror mirror on the wall text|x"),
      doc(32L, "a", "mirror mirror on the wall text|x"))

    var checkpoint = -1L
    def poll(first: Boolean): Unit = {
      val until = store.history("docs").last._1
      store.readChangesSince("docs", checkpoint, until).foreach { delta =>
        val d = delta.select(col("doc_id"), col("source"),
          col("n_chars"), col("text"))
        if (first) card.build(d)
        // the change-feed checkpoint seq IS the batch key: a replayed
        // poll of the same window merges onto itself
        else card.refreshBatch(d, store.read("docs").get, batchId = until)
      }
      checkpoint = until
    }

    store.append("docs", df(b1)); poll(first = true)
    store.append("docs", df(b2)); poll(first = false)
    store.compact("docs") // no data change; the checkpoint must survive
    poll(first = false)
    store.append("docs", df(b3)); poll(first = false)

    val fresh = new CorpusCard(new TableStore(spark,
        java.nio.file.Files.createTempDirectory("card-fresh").toString),
      "c", sentences, score)
    fresh.build(store.read("docs").get
      .select(col("doc_id"), col("source"), col("n_chars"), col("text")))

    val got = card.card().collect().map(_.toSeq).toSet
    val want = fresh.card().collect().map(_.toSeq).toSet
    assert(got == want)

    // spot values: source a has docs 10, 11, 31, 32. The 31/32 pair
    // is bit-identical, so the dup family is exercised for real (the
    // equality assert above would also pass on an all-singleton
    // corpus); sentence strikes in a: 11's first sentence loses to
    // 10's, and both of 32's lose to 31's — 3 total.
    val a = card.card().filter(col("source") === "a").collect().head
    assert(a.getAs[Long]("n_docs") == 4L)
    assert(a.getAs[Long]("dup_docs") >= 1L)
    assert(a.getAs[Long]("n_struck") == 3L)
  }
}
