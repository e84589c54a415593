package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for reciprocal-rank fusion: both-list documents beat
  * single-list winners, missing ranks contribute zero (and surface as
  * NULL), ties break by id, topK truncates. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fuse(a: Seq[(Long, Long)], b: Seq[(Long, Long)], topK: Int = 10) =
    Retrieval.rrfFuse(
      a.toDF("id", "rank_a"), b.toDF("id", "rank_b"),
      "id", "rank_a", "rank_b", k0 = 60, topK = topK)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3), r.getLong(4)))

  test("a mid-rank document in BOTH lists outranks each list's #1") {
    // doc 7: rank 3 in both → 2/(60+3) ≈ 0.0317 beats 1/(60+1) ≈ 0.0164
    val out = fuse(
      a = Seq((1L, 1L), (5L, 2L), (7L, 3L)),
      b = Seq((2L, 1L), (6L, 2L), (7L, 3L)))
    assert(out.head._1 == 7L && out.head._5 == 1L)
    val expected = 1.0 / 63.0 + 1.0 / 63.0
    assert(out.head._4 == expected) // bitwise: fixed op shape both sides
  }

  test("single-list documents carry a NULL rank for the other system") {
    val out = fuse(a = Seq((1L, 1L)), b = Seq((2L, 1L)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 1L && byId(1L)._3 == -1L)
    assert(byId(2L)._2 == -1L && byId(2L)._3 == 1L)
    // identical contribution → tie → id ascending wins
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.map(_._5).toSeq == Seq(1L, 2L))
  }

  test("topK truncates the fused list, ranks stay dense 1..topK") {
    val out = fuse(
      a = (1L to 8L).map(i => (i, i)),
      b = (3L to 10L).map(i => (i, i - 2L)), topK = 4)
    assert(out.length == 4)
    assert(out.map(_._5).toSeq == Seq(1L, 2L, 3L, 4L))
    // rrf is non-increasing down the fused list
    assert(out.sliding(2).forall(w => w(0)._4 >= w(1)._4))
  }
}
