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

  test("banded semantic decontam: brute-force parity, exactly-once pairs") {
    import graft.functions.VectorFunctions._
    val e = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val train = e.filter(col("id") >= 20L)
    val bench = e.filter(col("id") < 20L)
    val got = Decontaminate.semanticBanded(train, bench,
        threshold = 0.3, bands = 16, planesPerBand = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly-once: one row per (train, bench) pair even when several
    // bands collide
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
    // independent expectation: collect the centered vectors and redo
    // everything in plain Scala — brute-force cross product, any-band
    // collision, FIRST colliding band, left-to-right double folds
    // (the same IEEE accumulation order as the engine's HOF folds)
    val (tcDf, bcDf) = Decontaminate.centered(train, bench, 64)
    def grab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val tc = grab(tcDf); val bc = grab(bcDf)
    def dotS(a: Array[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def keysOf(v: Array[Double]): Seq[Long] = (0 until 16).map { l =>
      (0 until 4).map { t =>
        if (dotS(v, hyperplaneWeights(l * 4 + t, 64)) >= 0.0) 1L << t else 0L
      }.sum + l * 16L
    }
    val want = for {
      (tid, te) <- tc.toSeq
      (bid, be) <- bc.toSeq
      m = keysOf(te).zip(keysOf(be)).map(p => p._1 == p._2)
      if m.contains(true)
      denom = math.sqrt(dotS(te, te.toSeq)) * math.sqrt(dotS(be, be.toSeq))
      sim = if (denom == 0.0) 0.0 else dotS(te, be.toSeq) / denom
      if sim >= 0.3
    } yield (tid, bid, m.indexWhere(identity).toLong)
    assert(got.toSet == want.toSet)
    assert(got.nonEmpty)
  }

  test("bigram queries survive 0- and 1-token docs (descending-sequence guard)") {
    // Spark's sequence(1, 0) is the DESCENDING [1, 0] — the unguarded
    // bigram expansion evaluated element_at(toks, 0) (ANSI error) on
    // short docs where DuckDB's range(1, 1) is empty (ADVICE r6).
    // A corpus dir whose documents table is mostly short docs:
    val dir = java.nio.file.Files.createTempDirectory("shortdocs").toString
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "single", "en", "web", 6L),
      (3L, "   ", "en", "web", 3L),
      (4L, "two words and more here", "en", "web", 23L),
      (5L, "alpha beta alpha beta gamma", "en", "web", 27L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (q <- Seq("q71_bigram_lm", "q79_repetition", "q141_perplexity_buckets")) {
      val rows = graft.queries.CurationOps.queries(q)(spark, dir).collect()
      // only the two >=2-token docs can contribute bigrams
      assert(rows.nonEmpty, q)
      assert(!rows.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L), q)
    }
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
