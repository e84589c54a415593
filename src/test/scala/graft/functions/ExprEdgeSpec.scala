package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases for the column helpers and native expressions under
  * Spark's default ANSI mode: short/empty documents, zero vectors,
  * null array elements, and hostile SQL-literal parameters — each of
  * these previously produced a runtime error or silent garbage. */
class ExprEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import TextFunctions._
  import VectorFunctions._

  test("shingles of short/empty docs are empty, not errors or fragments") {
    val toks = Seq(Seq("a", "b"), Seq.empty[String], Seq("a", "b", "c"))
      .toDF("toks")
    val sh = toks.select(wordShinglesFromTokens(col("toks"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).isEmpty && sh(1).isEmpty && sh(2) == Seq("a b c"))
    val ch = Seq("ab", "", "abc").toDF("t")
      .select(charShingles(col("t"), 3).as("c"))
      .collect().map(_.getSeq[String](0))
    assert(ch(0).isEmpty && ch(1).isEmpty && ch(2) == Seq("abc"))
  }

  test("minhash near-dup survives a corpus containing empty and tiny docs") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                   (2L, "the quick brown fox jumps over the lazy cat"),
                   (3L, ""), (4L, "hi"), (5L, "   ")).toDF("doc_id", "text")
    // docs 3-5 have < 3 tokens: they must be silently shingle-less, not
    // an ANSI element_at crash that kills the whole dedup job
    val pairs = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("jaccard of two empty sets is 0.0, not DIVIDE_BY_ZERO") {
    val r = Seq((Seq.empty[String], Seq.empty[String]))
      .toDF("a", "b").select(jaccard(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 0.0)
  }

  test("cosine with a zero-norm vector is 0.0, not DIVIDE_BY_ZERO") {
    val r = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0)))
      .toDF("a", "b").select(cosine(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 0.0)
  }

  test("dot over an array with a null element is null, not garbage") {
    val df = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
                 (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("a", "b")
    val rows = df.select(dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 6.0)
  }

  test("hostile rolling_hash parameters fail at construction, not per row") {
    graft.GraftExtensions.registerAll(spark)
    val zero = intercept[Exception](
      spark.sql("SELECT rolling_hash('abc', 31, 0)").head())
    assert(zero.getMessage.contains("positive"))
    val overflow = intercept[Exception](
      spark.sql(s"SELECT rolling_hash('abc', 31, ${Long.MaxValue})").head())
    assert(overflow.getMessage.contains("overflow"))
  }

  test("z_order rejects non-bigint inputs at analysis, not at runtime") {
    graft.GraftExtensions.registerAll(spark)
    // int columns previously passed analysis, then interpreted eval
    // ClassCastExceptioned while codegen silently computed
    val e = intercept[Exception](
      spark.sql("SELECT z_order(CAST(3 AS INT), CAST(1 AS INT), 2)").head())
    assert(e.getMessage.contains("bigint"))
    val r = spark.sql("SELECT z_order(CAST(3 AS BIGINT), CAST(1 AS BIGINT), 2)").head()
    // 3 = 0b11 interleaved with 1 = 0b01: bits 0,1 from x, bit 0 from y
    assert(r.getLong(0) == ((1L << 0) | (1L << 2) | (1L << 1)))
  }
}
