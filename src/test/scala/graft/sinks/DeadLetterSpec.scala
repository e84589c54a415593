package graft.sinks

import graft.TestSpark
import graft.gdl.TableStore
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dead-letter routing: rows a stage cannot process land in a
  * queryable quarantine table with a reason, the stage sees only clean
  * rows, and nothing is lost or double-logged under replay. */
class DeadLetterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def fixture: DataFrame = {
    import spark.implicits._
    Seq[(java.lang.Long, String)](
      (1L, "ok one"), (2L, null), (3L, ""), (null, "orphan"), (5L, "ok two"))
      .toDF("id", "text")
  }

  private def freshStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("dlq").toString)

  private val rules = Seq(
    "null_id" -> col("id").isNull,
    "null_text" -> col("text").isNull,
    "empty_text" -> (col("text") === ""))

  test("split is first-match-wins and loses nothing") {
    val (clean, bad) = DeadLetter.split(fixture, rules)
    assert(clean.count() + bad.count() == fixture.count())
    val reasons = bad.select("id", "dl_reason").collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSet
    // the null-id row also has non-empty text: null_id (first rule) wins;
    // the null-text row must hit null_text, not fall through === ""
    // (a null predicate does not match — SQL semantics)
    assert(reasons == Set(
      (Some(2L), "null_text"), (Some(3L), "empty_text"), (None, "null_id")))
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 5L))
  }

  test("quarantine appends (source, reason, payload) and returns clean") {
    val store = freshStore()
    val clean = DeadLetter.quarantine(store, "dlq", "docs_stage",
      fixture, rules)
    assert(clean.count() == 2)
    val q = store.read("dlq").get
    assert(q.count() == 3)
    assert(q.select("source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("docs_stage"))
    // payload round-trips through from_json with the source schema
    val back = q.select(from_json(col("payload"),
        fixture.schema).as("row"), col("reason"))
      .select(col("row.id"), col("row.text"), col("reason"))
    val got = back.collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getString(2))).toSet
    assert(got == Set(
      (Some(2L), None, "null_text"),
      (Some(3L), Some(""), "empty_text"),
      (None, Some("orphan"), "null_id")))
  }

  test("an all-clean input appends no generation at all") {
    val store = freshStore()
    DeadLetter.quarantine(store, "dlq", "s",
      fixture.filter(col("id") === 1L), rules)
    assert(store.read("dlq").isEmpty)
  }

  test("a replayed batch id does not double-log") {
    val store = freshStore()
    val c1 = DeadLetter.quarantineBatch(store, "dlq", "s", 7L, fixture, rules)
    val n = store.read("dlq").get.count()
    assert(n == 3 && c1.count() == 2)
    // at-least-once replay of the same micro-batch
    val c2 = DeadLetter.quarantineBatch(store, "dlq", "s", 7L, fixture, rules)
    assert(store.read("dlq").get.count() == n)
    assert(c2.count() == 2) // clean rows still flow on the replay
    // a DIFFERENT source sharing the table and batch id is not a replay
    DeadLetter.quarantineBatch(store, "dlq", "other", 7L, fixture, rules)
    assert(store.read("dlq").get.count() == 2 * n)
  }

  test("replay returns one source's typed rows for reprocessing") {
    val store = freshStore()
    DeadLetter.quarantine(store, "dlq", "stage_a", fixture, rules)
    DeadLetter.quarantine(store, "dlq", "stage_b",
      fixture.filter(col("id").isNull), Seq("null_id" -> col("id").isNull))
    val back = DeadLetter.replay(store, "dlq", "stage_a", fixture.schema)
    assert(back.columns.toSeq == Seq("id", "text", "reason"))
    val got = back.collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getString(2))).toSet
    // only stage_a's three rows, malformed state intact
    assert(got == Set(
      (Some(2L), None, "null_text"),
      (Some(3L), Some(""), "empty_text"),
      (None, Some("orphan"), "null_id")))
  }

  test("decodeQuarantined routes unprocessable media, decodes the rest") {
    import spark.implicits._
    val store = freshStore()
    val media = Seq[(java.lang.Long, Array[Byte])](
      (1L, "frame-bytes".getBytes("UTF-8")),
      (2L, null),
      (null, "lost".getBytes("UTF-8")))
      .toDF("id", "media")
    val decoded = Multimodal.decodeQuarantined(spark, media, "id", "media",
      store, "dlq", "media_decode")
    val rows = decoded.collect()
    assert(rows.map(_.id).toSeq == Seq(1L))
    assert(rows.head == Multimodal.decodeStub(1L, "frame-bytes".getBytes("UTF-8")))
    val reasons = store.read("dlq").get.select("reason").collect()
      .map(_.getString(0)).toSet
    assert(reasons == Set("null_id", "null_blob"))
  }
}
