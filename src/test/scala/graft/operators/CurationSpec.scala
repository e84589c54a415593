package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-4 curation operators: benchmark
  * decontamination, BM25 ranking, boilerplate-span coverage, and
  * int8 scalar-quantized top-k. Fixtures are hand-checkable.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontamination report: overlap fraction, candidates, flags") {
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b c x"),     // shares "a b c" = 1 of bench's 2 shingles
      (2L, "a b c d"),     // exact copy: overlap 1.0
      (3L, "z z z z z")    // no overlap
    ).toDF("doc_id", "text")
    val r = Decontaminate.report(train, bench, "doc_id", "text",
      shingleN = 3, contaminatedAt = 0.5).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 100L)          // bench_id
    assert(row.getLong(1) == 2L)            // n_bench_sh: "a b c", "b c d"
    assert(row.getLong(2) == 2L)            // docs 1 and 2 are candidates
    assert(row.getDouble(3) == 1.0)         // doc 2 overlaps fully
    assert(row.getLong(4) == 2L)            // both cross the 0.5 line
  }

  test("decontamination: clean benchmark doc reports zero candidates") {
    val bench = Seq((100L, "a b c d"), (200L, "p q r s")).toDF("doc_id", "text")
    val train = Seq((1L, "a b c x")).toDF("doc_id", "text")
    val byId = Decontaminate.report(train, bench, "doc_id", "text", 3, 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(200L).getLong(2) == 0L)
    assert(byId(200L).getDouble(3) == 0.0)
  }

  test("bm25: more term hits rank higher; termless docs score zero") {
    val docs = Seq(
      (1L, "x x y y"),
      (2L, "x y y y"),
      (3L, "y y y y")).toDF("doc_id", "text")
    val ranked = Bm25.rank(docs, "doc_id", "text", terms = Seq("x"), topK = 3)
      .orderBy("rank").collect()
    assert(ranked.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(ranked(0).getDouble(2) > ranked(1).getDouble(2))
    assert(ranked(1).getDouble(2) > 0.0)
    assert(ranked(2).getDouble(2) == 0.0) // no "x" in doc 3
  }

  test("bm25: shorter doc with equal tf outranks longer (length norm)") {
    val docs = Seq(
      (1L, "x y"),
      (2L, "x y y y y y y y")).toDF("doc_id", "text")
    val ranked = Bm25.rank(docs, "doc_id", "text", terms = Seq("x"), topK = 2)
      .orderBy("rank").collect()
    assert(ranked.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("boilerplate coverage: frequent span counted, covered tokens deduped") {
    // "a b c" appears in all 3 docs (df=3 >= minDf); each tail is unique
    val docs = Seq(
      (1L, "a b c u1 u2"),
      (2L, "a b c v1 v2"),
      (3L, "a b c w1 w2")).toDF("doc_id", "text")
    val r = Boilerplate.spanCoverage(docs, "doc_id", "text", n = 3, minDf = 3L)
      .collect().map(x => x.getLong(0) -> x).toMap
    (1L to 3L).foreach { id =>
      assert(r(id).getLong(1) == 5L)                  // n_tokens
      assert(r(id).getLong(2) == 1L)                  // only "a b c" is bp
      assert(r(id).getLong(3) == 3L)                  // tokens 1..3 covered
      assert(r(id).getDouble(4) == 3.0 / 5.0)
    }
  }

  test("boilerplate coverage: overlapping spans cover without double count") {
    // "a a a a" in both docs: spans (a a a)@1 and (a a a)@2 overlap; the
    // union covers all 4 positions, not 6
    val docs = Seq((1L, "a a a a"), (2L, "a a a a")).toDF("doc_id", "text")
    val r = Boilerplate.spanCoverage(docs, "doc_id", "text", n = 3, minDf = 2L)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(2) == 2L)   // two boilerplate spans
    assert(r(1L).getLong(3) == 4L)   // 4 distinct covered positions
    assert(r(1L).getDouble(4) == 1.0)
  }

  test("sq8 top-k: integer ranking tracks exact ranking, dot_hat is close") {
    val dim = 8
    def vec(seed: Int) = Array.tabulate(dim)(i =>
      (math.sin(seed * 31 + i) * 1.27).toFloat)
    val data = (0L until 40L).map(i => (i, vec(i.toInt))).toDF("id", "embedding")
    val q = data.filter(col("id") < 2L)
    val got = Similarity.sq8TopK(q, data, k = 5).collect()
    assert(got.length == 10)
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    }
    // dot_hat within the quantization error envelope of the true dot
    val exactDot = q.select(col("id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(data.select(col("id").as("vec_id"), col("embedding").as("ce")))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("qe"), col("ce"),
          (a, b) => a.cast("double") * b.cast("double")), lit(0.0), _ + _).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { r =>
      val d = exactDot((r.getLong(0), r.getLong(1)))
      assert(math.abs(r.getDouble(3) - d) < 0.05,
        s"dot_hat ${r.getDouble(3)} vs exact $d")
    }
  }
}
