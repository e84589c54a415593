package graft.streaming

import graft.TestSpark
import graft.gdl.TableStore
import graft.operators.SpanIndex
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest-time SPAN dedup (the C4 grain) ≡ the batch q191
  * rule over everything that has arrived, and an at-least-once replay
  * of a micro-batch is verdict-identical — the SentenceIndex algebra
  * inherited at span grain, asserted end-to-end through a real
  * foreachBatch stream of whole documents. */
class StreamingSpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def doc(id: Long, sents: String*) =
    sents.zipWithIndex.map { case (s, i) =>
      (id, i.toLong, s, id * 1000000L + i)
    }

  test("foreachBatch span strike+refresh ≡ the q191 rule; replay is identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spd-src").toString
    val idx = new SpanIndex(new TableStore(spark,
      java.nio.file.Files.createTempDirectory("spd-idx").toString), "s")
    idx.build(Seq.empty[(Long, Long, String, Long)]
      .toDF("doc_id", "sent_idx", "sent_text", "pk"))

    val got = scala.collection.mutable.Map.empty[(Long, Long), Boolean]
    // ONE part file per logical batch: SpanIndex's input contract is
    // WHOLE documents per micro-batch (spans derive from per-doc
    // windows), and a multi-file write lets the file source split one
    // document's sentences across micro-batches — the torn halves
    // never form their spans (caught as a flake in the full-suite
    // run: doc 60's duplicate span intermittently went unstruck)
    def writeBatch(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("doc_id", "sent_idx", "sent_text", "pk")
        .coalesce(1).write.mode("append").parquet(dir)

    writeBatch(doc(1L, "a", "b", "c", "d")) // spans abc, bcd — all first
    val q = spark.readStream
      .schema("doc_id BIGINT, sent_idx BIGINT, sent_text STRING, pk BIGINT")
      .parquet(dir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        idx.ingestBatch(b).collect().foreach(r =>
          got((r.getAs[Long]("doc_id"), r.getAs[Long]("sent_idx"))) =
            r.getAs[Boolean]("removed"))
        ()
      }.start()
    try {
      q.processAllAvailable()
      // doc 50 repeats span abc → all 3 struck; doc 51 is fresh
      writeBatch(doc(50L, "a", "b", "c") ++ doc(51L, "x", "y", "z"))
      q.processAllAvailable()
      // doc 60 repeats span bcd from the FIRST micro-batch
      writeBatch(doc(60L, "b", "c", "d"))
      q.processAllAvailable()

      val want = Map[(Long, Long), Boolean](
        (1L, 0L) -> false, (1L, 1L) -> false, (1L, 2L) -> false,
        (1L, 3L) -> false,
        (50L, 0L) -> true, (50L, 1L) -> true, (50L, 2L) -> true,
        (51L, 0L) -> false, (51L, 1L) -> false, (51L, 2L) -> false,
        (60L, 0L) -> true, (60L, 1L) -> true, (60L, 2L) -> true)
      assert(got.toMap == want)

      // at-least-once replay of micro-batch 2: same verdicts, same state
      val stateBefore = idx.storedMins().collect().map(_.toString).sorted.toSeq
      val replay = idx.ingestBatch(
          (doc(50L, "a", "b", "c") ++ doc(51L, "x", "y", "z"))
            .toDF("doc_id", "sent_idx", "sent_text", "pk"))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sent_idx")) ->
          r.getAs[Boolean]("removed")).toMap
      assert(replay == want.filter { case ((d, _), _) => d == 50L || d == 51L })
      val stateAfter = idx.storedMins().collect().map(_.toString).sorted.toSeq
      assert(stateAfter == stateBefore)
    } finally q.stop()
  }
}
