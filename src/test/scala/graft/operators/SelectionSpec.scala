package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the data-selection operators added this round:
  * DSIR importance weighting, maximal duplicated spans, and the
  * logistic-regression quality-classifier trainer. Fixtures are
  * hand-checkable.
  */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dsir: target-domain lookalikes score positive, others negative") {
    val docs = Seq(
      (1L, "good good good"),
      (2L, "good good good"),
      (3L, "bad bad bad"),
      (4L, "bad bad bad")).toDF("doc_id", "text")
    val r = Dsir.importance(docs, "doc_id", "text",
        isTarget = col("doc_id") <= 2L)
      .collect().map(x => x.getLong(0) -> x).toMap
    // target tokens: 6×"good"; raw: 6×"good"+6×"bad" — "good" is more
    // likely under the target model, "bad" never appears in it
    assert(r(1L).getDouble(2) > 0 && r(1L).getBoolean(3))
    assert(r(2L).getDouble(2) > 0 && r(2L).getBoolean(3))
    assert(r(3L).getDouble(2) < 0 && !r(3L).getBoolean(3))
    assert(r(3L).getDouble(2) == r(4L).getDouble(2)) // identical docs tie
    assert(r.values.forall(_.getLong(1) == 3L))      // n_tokens
  }

  test("dup spans: overlapping hits merge, touching hits merge, gaps split") {
    // shared 3-grams between the two docs: "a b c" and "d e f"
    // docA positions {1,4}: 4-1 = 3 ≤ n → ONE span [1,6]
    // docB positions {1,5}: 5-1 = 4 > n → spans [1,3] and [5,7]
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c z d e f")).toDF("doc_id", "text")
    val spans = Boilerplate.dupSpans(docs, "doc_id", "text", n = 3, minDf = 2L)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(spans.toSeq == Seq(
      (1L, 1L, 6L, 6L, 2L),
      (2L, 1L, 3L, 3L, 1L),
      (2L, 5L, 7L, 3L, 1L)))
  }

  test("dup spans: a corpus with no repeated n-grams yields no spans") {
    val docs = Seq((1L, "a b c d"), (2L, "p q r s")).toDF("doc_id", "text")
    assert(Boilerplate.dupSpans(docs, "doc_id", "text", 3, 2L).isEmpty)
  }

  test("logreg: separable data drives the feature weight positive") {
    val feats = (1 to 40).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      val x1 = if (y == 1.0) 1.0 else -1.0
      (y, 1.0, x1)
    }.toDF("y", "x0", "x1")
    val w = LogReg.train(feats, dim = 2, lr = 0.5, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(w.size == 4)
    assert(w((1L, 1L)) > 0)                  // x1 separates after round 1
    assert(w((2L, 1L)) > w((1L, 1L)))        // and keeps growing
    assert(math.abs(w((2L, 0L))) < 0.05)     // balanced labels ⇒ tiny bias
    // scoring with the trained weights separates the classes
    val s = feats.select(col("y"),
      LogReg.score(Seq(w((2L, 0L)), w((2L, 1L))),
        Seq(col("x0"), col("x1"))).as("p"))
      .groupBy(col("y")).agg(min(col("p")).as("mn"), max(col("p")).as("mx"))
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(s(1.0)._1 > s(0.0)._2)
  }

  test("logreg: training is deterministic across repeated runs") {
    val feats = (1 to 30).map { i =>
      ((i % 3 == 0).compareTo(false).toDouble, 1.0, i / 30.0, (i % 7) / 7.0)
    }.toDF("y", "x0", "x1", "x2")
    val a = LogReg.train(feats, 3, 0.5, 2).collect().toSeq
    val b = LogReg.train(feats, 3, 0.5, 2).collect().toSeq
    assert(a == b)
  }
}
