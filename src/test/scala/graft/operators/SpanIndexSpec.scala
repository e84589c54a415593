package graft.operators

import graft.TestSpark
import graft.gdl.TableStore
import org.scalatest.funsuite.AnyFunSuite

/** The min-combine contract at SPAN grain: incremental refresh ≡
  * rebuild, replay and out-of-order batches converge, per-sentence
  * strikes match the from-scratch q191 rule (overlapping duplicate
  * spans strike through one distinct position set), and partial tail
  * spans never index. */
class SpanIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (doc_id, sent_idx, sent_text, pk) whole-document sentence rows
  private def doc(id: Long, sents: String*) =
    sents.zipWithIndex.map { case (s, i) =>
      (id, i.toLong, s, id * 1000000L + i)
    }

  private def df(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("doc_id", "sent_idx", "sent_text", "pk")

  private def fresh(tag: String) = new SpanIndex(
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory(s"spidx-$tag").toString),
    "s")

  private def state(i: SpanIndex): Map[String, Long] =
    i.storedMins().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("refresh == rebuild; replay and order are no-ops") {
    val a = doc(1L, "a", "b", "c", "d") // spans abc@0, bcd@1
    val b = doc(500L, "a", "b", "c")    // span abc@500e6 — a dup
    val inc = fresh("inc"); inc.build(df(a)); inc.refresh(df(b))
    val scratch = fresh("scratch"); scratch.build(df(a ++ b))
    assert(state(inc) == state(scratch))
    inc.refresh(df(b)) // crash replay
    assert(state(inc) == state(scratch))
    // an earlier-pk doc arriving later still wins its span keys
    val early = doc(0L, "a", "b", "c")
    inc.refresh(df(early))
    val rebuilt = fresh("rb"); rebuilt.build(df(a ++ b ++ early))
    assert(state(inc) == state(rebuilt))
  }

  test("strikeSentences: overlapping duplicate spans strike a distinct set") {
    // stored doc 1: sentences s0..s4 → spans (s0s1s2)(s1s2s3)(s2s3s4)
    val idx = fresh("strike")
    idx.build(df(doc(1L, "s0", "s1", "s2", "s3", "s4")))
    // batch doc 500 repeats s0..s3: spans (s0s1s2)@0 and (s1s2s3)@1
    // are BOTH stored-duplicates; their covers {0,1,2} ∪ {1,2,3} must
    // strike each position once — all four sentences removed
    val v = idx.strikeSentences(df(doc(500L, "s0", "s1", "s2", "s3")))
      .collect().map(r => r.getAs[Long]("sent_idx") ->
        r.getAs[Boolean]("removed")).toMap
    assert(v == Map(0L -> true, 1L -> true, 2L -> true, 3L -> true))
    // a batch doc with NO duplicated span keeps everything, including
    // sentences the stored corpus knows at SENTENCE grain (span grain
    // is the laxer rule — that's the point of the C4 grain)
    val v2 = idx.strikeSentences(df(doc(600L, "s0", "x", "s2")))
      .collect().map(r => r.getAs[Boolean]("removed"))
    assert(v2.forall(_ == false))
  }

  test("strike ≡ from-scratch q191 rule on a mixed corpus") {
    val stored = doc(1L, "a", "b", "c", "d") ++ doc(2L, "p", "q", "r")
    val batch = doc(500L, "b", "c", "d", "z") ++
      doc(501L, "p", "q", "r") ++ doc(502L, "q", "r", "p")
    val idx = fresh("mixed"); idx.build(df(stored))
    val got = idx.strikeSentences(df(batch)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sent_idx")) ->
        r.getAs[Boolean]("removed")).toMap
    // from-scratch: group all spans of stored ∪ batch, min pk wins,
    // non-first occurrences strike their three positions
    val all = stored ++ batch
    val spans = all.groupBy(_._1).toSeq.flatMap { case (d0, rows) =>
      val s = rows.sortBy(_._2)
      s.sliding(3).filter(_.size == 3).map(w =>
        (w.map(_._3).mkString("\n"), d0, w.head._2, w.head._4))
    }
    val firstPk = spans.groupBy(_._1).view.mapValues(_.map(_._4).min)
    val removedSet = spans.filter(s => s._4 != firstPk(s._1))
      .flatMap(s => (s._3 to s._3 + 2).map(i => (s._2, i))).toSet
    val want = batch.map(r => (r._1, r._2) ->
      removedSet.contains((r._1, r._2))).toMap
    assert(got == want)
  }

  test("documents shorter than one span index nothing and strike nothing") {
    val idx = fresh("short")
    idx.build(df(doc(1L, "a", "b"))) // no complete 3-span
    assert(idx.storedMins().count() == 0)
    val v = idx.strikeSentences(df(doc(500L, "a", "b")))
      .collect().map(r => r.getAs[Boolean]("removed"))
    assert(v.length == 2 && v.forall(_ == false))
  }
}
