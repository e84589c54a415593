package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword ranking over a document corpus — the retrieval scorer
  * behind corpus search / quality-by-query curation passes.
  *
  * score(d, Q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
  * with the Robertson idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Scale design (100 TB):
  *  - per-doc term frequencies are a map-only pass over the token array
  *    (one fixed column per query term — query terms are few);
  *  - corpus stats (N, Σ|d|, df per term) are ONE tiny aggregate row,
  *    broadcast back via crossJoin — no second corpus shuffle;
  *  - the global top-k is orderBy(..).limit(k) = TakeOrdered (per-
  *    partition heaps + driver merge of k·partitions rows), never a
  *    single-partition global sort; only the k winners see a window.
  *
  * Value-exactness: tf/df/dl/N are integers, avgdl = Σdl/N from an exact
  * long sum, and the score tree is a fixed-shape double expression. The
  * only transcendental is ln, where libm implementations (JVM StrictMath
  * vs an engine's libc) can disagree by 1 ulp — so the idf is quantized
  * to the 1e-9 grid (floor(x·1e9 + 0.5)/1e9, the same discipline as the
  * k-means centroid means), which absorbs the ulp without affecting any
  * ranking-relevant digit.
  */
object Bm25 {

  def rank(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 10): DataFrame = {
    val ts = col("_toks")
    val tf = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(Seq(col("doc_id"), size(ts).cast("long").as("dl")) ++
        terms.indices.map(i =>
          size(filter(ts, x => x === terms(i))).cast("long").as(s"tf_$i")): _*)
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0L, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = tf.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def termScore(i: Int): Column = {
      val dfD = col(s"df_$i").cast("double")
      val tfD = col(s"tf_$i").cast("double")
      // idf is the one transcendental — engines' libm may differ by 1 ulp
      // on ln, so quantize it to the 1e-9 grid (the k-means NOTES.md
      // discipline); 1e-9 is far below any ranking-relevant difference
      val idf = floor(log(lit(1.0) +
        (col("n_docs").cast("double") - dfD + 0.5) / (dfD + 0.5)) * 1e9 + 0.5)
        .cast("double") / 1e9
      idf * (tfD * (k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    val score = terms.indices.map(termScore).reduce(_ + _) // fixed fold order
    val top = tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
    // rank the k winners only — the unpartitioned window sees topK rows,
    // not the corpus
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("long"))
  }
}
