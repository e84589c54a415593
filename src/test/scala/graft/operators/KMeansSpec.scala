package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))

  private def sse(corpus: DataFrame, cents: DataFrame): Double = {
    val dist = aggregate(
      zip_with(col("emb"), col("centroid"), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
    val v = corpus.select(col("id"),
      transform(col("embedding"), _.cast("double")).as("emb"))
    v.crossJoin(broadcast(cents.select(col("cid"), col("centroid"))))
      .select(col("id"), dist.as("d"))
      .groupBy(col("id")).agg(min(col("d")).as("d"))
      .agg(sum(col("d"))).head().getDouble(0)
  }

  test("non-zero-based ids still seed k clusters (smallest ids, not id < k)") {
    val shifted = corpus.select((col("id") + 1000L).as("id"), col("embedding"))
    val cents = KMeans.train(shifted, k = 4, iters = 1)
    assert(cents.count() == 4L, "id<k seeding would return ZERO clusters here")
    // same vectors, same training — centroids must match the 0-based run
    val base = KMeans.train(corpus, k = 4, iters = 1)
      .select(col("centroid")).collect().map(_.getSeq[Double](0)).toSet
    val got = cents.select(col("centroid")).collect()
      .map(_.getSeq[Double](0)).toSet
    assert(got == base)
  }

  test("iters = 0 is rejected, not an NPE") {
    val e = intercept[IllegalArgumentException](KMeans.train(corpus, 4, 0))
    assert(e.getMessage.contains("iters"))
  }

  test("each Lloyd's round reduces within-cluster SSE") {
    val s1 = sse(corpus, KMeans.train(corpus, k = 4, iters = 1))
    val s2 = sse(corpus, KMeans.train(corpus, k = 4, iters = 2))
    val s3 = sse(corpus, KMeans.train(corpus, k = 4, iters = 3))
    assert(s2 <= s1 && s3 <= s2, s"SSE not monotone: $s1, $s2, $s3")
  }

  test("members partition the corpus; empty clusters keep their centroid") {
    import spark.implicits._
    val n = corpus.count()
    val trained = KMeans.train(corpus, k = 4, iters = 2)
    assert(trained.count() == 4)
    assert(trained.agg(sum("n_members")).head().getLong(0) == n)

    // duplicate init vectors: every tie breaks to the smaller cid, so
    // centroid 1 gets zero members and must keep its init value
    val dup = Seq(
      (0L, Array.fill(4)(0.0f)), (1L, Array.fill(4)(0.0f)),
      (2L, Array.fill(4)(1.0f))).toDF("id", "embedding")
    val t2 = KMeans.train(dup, k = 2, iters = 1)
    val byCid = t2.collect().map(r => r.getLong(0) -> r).toMap
    assert(byCid(0L).getLong(1) == 3L)
    assert(byCid(1L).getLong(1) == 0L)
    assert(byCid(1L).getSeq[Double](2).forall(_ == 0.0)) // init preserved
  }

  test("trained centroids drop IVF top-k into place of the stand-ins") {
    val trained = KMeans.train(corpus, k = 8, iters = 2)
      .select(col("cid"), col("centroid").as("embedding"))
    val hits = Similarity.ivfTopK(
      corpus.filter(col("id") < 3L), corpus, trained, nprobe = 2, k = 5)
    assert(hits.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
  }
}
