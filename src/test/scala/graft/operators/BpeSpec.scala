package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable BPE training fixtures, including the only case where
  * merge candidates can be consecutive (sym_a == sym_b runs). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("three rounds on a tiny corpus match the hand computation") {
    // words: abab x2, abc x1
    val docs = Seq((1L, "abab abab abc")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", nMerges = 3)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    // r1: (a,b) seen 2x2 + 1 = 5; r2: abab -> ab|ab so (ab,ab) = 2;
    // r3: only (ab,c) = 1 remains
    assert(got.toSeq == Seq(
      (1L, "a", "b", 5L), (2L, "ab", "ab", 2L), (3L, "ab", "c", 1L)))
  }

  test("identical-symbol runs merge leftmost non-overlapping") {
    // aaaa: (a,a) x3; aaab: (a,a) x2 + (a,b) -> best (a,a, 5)
    // merge: aaaa -> aa|aa, aaab -> aa|a|b
    // round 2 counts are all 1; tie-break picks (a,b) lexicographically
    val docs = Seq((1L, "aaaa aaab")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", nMerges = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", "a", 5L), (2L, "a", "b", 1L)))
  }

  test("applyMerges replays the learned rules to the training-end state") {
    val docs = Seq((1L, "abab abab abc")).toDF("doc_id", "text")
    val pieces = Bpe.applyMerges(docs, "text", Seq(("a", "b"), ("ab", "ab")))
      .as[(String, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._4).toSeq).toMap
    assert(pieces("abab") == Seq("abab"))
    assert(pieces("abc") == Seq("ab", "c"))
  }
}
