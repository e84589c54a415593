package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design (100 TB corpus):
  *  - `topK` is a broadcast of the (small) query set against a single
  *    scan of the corpus — per-query top-k via a window partitioned by
  *    query id, so the corpus is read once regardless of query count.
  *    The sort inside each window is bounded by AQE partition sizing.
  *  - `hyperplaneBuckets` is the scale path: bucket assignment is a
  *    map-only pass (no shuffle); candidate generation becomes an
  *    equi-join on the bucket key instead of a cross product, trading
  *    recall for a ~2^planes reduction in compared pairs. Probing
  *    neighboring buckets (Hamming distance 1) recovers recall.
  *  - `knnClassify` keeps the labeled corpus on the scan side and
  *    broadcasts the test rows; majority vote is a partial-aggregable
  *    count. All deterministic: ties broken by (sim desc, vec_id).
  */
object Similarity {

  /** Exact brute-force top-k neighbors of each query row.
    * `queries`/`corpus`: (id, embedding). Output:
    * (query_id, vec_id, sim, rank) with rank 1..k, self-matches excluded. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms are precomputed per row (not per pair): the pair loop then
    // does ONE dot product instead of three — same doubles, third the work
    val q = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
                           norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("id").as("vec_id"), col("embedding").as("c_emb"),
                          norm(col("embedding")).as("c_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
              (dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
                .as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** k-NN majority-vote classification of `test` rows against the
    * labeled `train` corpus. Output: (id, predicted_label, votes).
    * Majority ties break toward the smaller label. */
  def knnClassify(test: DataFrame, train: DataFrame, k: Int): DataFrame = {
    val neighbors = topK(
      test.select(col("id"), col("embedding")),
      train.select(col("id"), col("embedding")), k)
      .join(train.select(col("id").as("vec_id"), col("label")), Seq("vec_id"))
    val voteW = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    neighbors
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(voteW))
      .filter(col("rn") === 1)
      .select(col("query_id").as("id"), col("label").as("predicted_label"),
              col("votes"))
  }

  /** Map-only LSH bucket assignment (the ANN scale path). */
  def hyperplaneBuckets(corpus: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    corpus.select(col("id").as("vec_id"),
                  hyperplaneBucket(col("embedding"), nPlanes, dim).as("bucket"))

  /** ANN top-k restricted to same-bucket candidates: equi-join on the
    * bucket key replaces the cross product. Output like [[topK]] plus
    * the bucket; recall < 1 by construction. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int, dim: Int): DataFrame = {
    val qb = hyperplaneBuckets(queries, nPlanes, dim)
      .withColumnRenamed("vec_id", "query_id")
      .join(queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
                           norm(col("embedding")).as("q_norm")),
            Seq("query_id"))
    val cb = hyperplaneBuckets(corpus, nPlanes, dim)
      .join(corpus.select(col("id").as("vec_id"), col("embedding").as("c_emb"),
                          norm(col("embedding")).as("c_norm")),
            Seq("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("bucket"),
              (dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
                .as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
