package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tight, well-separated clusters in 8 dims (2 subspaces of 4):
  // ids 0..9 near +1s, ids 10..19 near -1s, with small deterministic noise
  private def clustered = (0L until 20L).map { i =>
    val base = if (i < 10) 1.0f else -1.0f
    (i, Array.tabulate(8)(d => base + 0.01f * ((i + d) % 5)))
  }.toDF("id", "embedding")

  test("non-zero-based ids still seed k codebook entries per subspace") {
    val shifted = clustered.select((col("id") + 5000L).as("id"), col("embedding"))
    val cb = Pq.train(shifted, m = 2, subDim = 4, k = 2, iters = 1)
    // id<k seeding would return an EMPTY codebook here
    assert(cb.groupBy(col("m")).count().collect().forall(_.getLong(1) == 2L))
  }

  test("codebooks cover every (m, cid); encoding gives m codes per vector") {
    val cb = Pq.train(clustered, m = 2, subDim = 4, k = 2, iters = 1)
    assert(cb.count() == 4) // 2 subspaces x 2 codes
    assert(cb.select("m").distinct().count() == 2)
    val codes = Pq.encode(clustered, cb, m = 2, subDim = 4)
    assert(codes.count() == 40) // 20 vectors x 2 subspaces
    assert(codes.groupBy("id").count().collect().forall(_.getLong(1) == 2))
  }

  test("ADC ranking keeps same-cluster vectors on top") {
    val cb = Pq.train(clustered, m = 2, subDim = 4, k = 2, iters = 1)
    val q = clustered.filter(col("id") === 0L || col("id") === 15L)
    val top = Pq.adcTopK(q, clustered, cb, m = 2, subDim = 4, k = 5)
      .collect().groupBy(_.getLong(0))
    // query 0 lives in the +1 cluster (ids < 10), query 15 in the -1 one
    assert(top(0L).map(_.getLong(1)).forall(_ < 10L))
    assert(top(15L).map(_.getLong(1)).forall(v => v >= 10L && v != 15L))
    // ranks are 1..5, scores monotone in rank
    top.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)).toSeq == (1L to 5L))
      assert(sorted.map(_.getLong(2)).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("production parameters on real embeddings: k=64 codebooks, 2 rounds, rerank dominates raw ADC") {
    val e = graft.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val (m, subDim, k) = (4, 16, 64)
    val cb = Pq.train(e, m, subDim, k, iters = 2).localCheckpoint(true)
    // every (m, cid) slot survives training (empty clusters keep their
    // previous centroid, so the codebook never shrinks)
    assert(cb.count() == m.toLong * k)
    // every vector encodes to m codes, each within [0, k)
    val codes = Pq.encode(e, cb, m, subDim)
    assert(codes.count() == 500L * m)
    assert(codes.filter(col("cid") < 0 || col("cid") >= k).count() == 0)

    val q = e.filter(col("id") < 5L)
    def hits(ann: org.apache.spark.sql.DataFrame): Long =
      Similarity.topK(q, e, k = 5).select("query_id", "vec_id")
        .join(ann.select("query_id", "vec_id"), Seq("query_id", "vec_id"),
          "left_semi").count()
    val adcHits = hits(Pq.adcTopK(q, e, cb, m, subDim, k = 5))
    val rerankHits = hits(Pq.adcRerank(q, e, cb, m, subDim, shortlist = 50, k = 5))
    // theorem, not tuning: a true top-5 member found by ADC top-5 is in
    // the 50-wide page, and fewer than 5 rows anywhere beat it on exact
    // cosine, so it survives the re-rank — rerank recall >= ADC recall
    assert(rerankHits >= adcHits, s"rerank $rerankHits < adc $adcHits")
    // at production codebook sizes the 50-wide page recovers most of
    // the true top-5 (25 possible hits over 5 queries)
    assert(rerankHits >= 15L, s"rerank recall too low: $rerankHits/25")
  }

  test("adc_hat approximates the true dot for in-cluster pairs") {
    val cb = Pq.train(clustered, m = 2, subDim = 4, k = 2, iters = 1)
    val q = clustered.filter(col("id") === 0L)
    val got = Pq.adcTopK(q, clustered, cb, m = 2, subDim = 4, k = 3).collect()
    val exact = clustered.select(col("id").as("vec_id"),
      aggregate(zip_with(col("embedding"),
        typedLit(Array.tabulate(8)(d => 1.0f + 0.01f * (d % 5))),
        (a, b) => a.cast("double") * b.cast("double")), lit(0.0), _ + _).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { r =>
      // quantization noise is the codebook residual: coarse but bounded
      assert(math.abs(r.getDouble(3) - exact(r.getLong(1))) < 0.5,
        s"adc_hat ${r.getDouble(3)} vs exact ${exact(r.getLong(1))}")
    }
  }
}
