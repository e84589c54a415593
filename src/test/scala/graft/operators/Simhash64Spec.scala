package graft.operators

import graft.{Tables, TestSpark}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 64-bit SimHash: the multiprobe near-dup must equal brute-force
  * Hamming ≤ 1 over all pairs — same contract the 16-bit form proves
  * via its DuckDB oracle, verified here by direct comparison because
  * 64 bit-sums are not reasonably oracle-expressible. */
class Simhash64Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multiprobe pairs equal brute-force Hamming <= 1; exact dups land at 0") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id") < 150L)
    val got = Dedup.simhashNearDup64(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet

    val fp = docs
      .withColumn("_hs", TextFunctions.tokenHashes64(col("text")))
      .select(col("doc_id"),
        TextFunctions.simhash64FromHashes(col("_hs")).as("sh"))
      .as[(Long, Long)].collect()
    val want = (for {
      (ia, ha) <- fp; (ib, hb) <- fp
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 1
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet

    assert(got == want)
    assert(want.exists(_._3 == 0L),
      "fixture should contain exact-duplicate token multisets")
  }

  test("identical token multisets fingerprint identically; a reordering too") {
    val d = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"), // same multiset, different order
      (3L, "totally different words here")).toDF("doc_id", "text")
    val fp = d.withColumn("_hs", TextFunctions.tokenHashes64(col("text")))
      .select(col("doc_id"),
        TextFunctions.simhash64FromHashes(col("_hs")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}
