package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** DSIR-style data selection via importance reweighting (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw document by how much more likely its
  * tokens are under a target-domain bag-of-words model than under the
  * raw-corpus model, then keep the documents whose importance log-ratio
  * is positive — the standard recipe for skimming "looks like the
  * high-quality target domain" data out of a web-scale crawl.
  *
  * The feature space is HASHED: tokens map to `buckets` slots through
  * the same base-31 polynomial hash the document fingerprint uses
  * (cross-engine reproducible, unlike murmur). That bound is the point
  * of DSIR's hashed n-grams — the model is 2·`buckets` longs no matter
  * how large the corpus vocabulary grows, so the scoring join
  * broadcasts at any corpus size.
  *
  * Scale shape (100 TB): one explode + map-side-combinable groupBy
  * builds the bucket model; totals are ONE tiny row; scoring re-joins
  * the token stream against the broadcast model (no shuffle beyond the
  * final per-doc aggregate, which is keyed on doc_id and combinable).
  * The token stream feeds both the model build and the scoring join, so
  * it is persisted for the call and dropped once the per-doc result
  * materializes.
  *
  * Value-exactness: counts are longs; both log-probabilities are
  * add-one smoothed over the bucket count so they are defined for empty
  * buckets; each ln is quantized to the 1e-9 grid (floor(x·1e9), the
  * libm-ulp discipline) BEFORE the subtraction and the per-doc sum, so
  * the sum is order-free long arithmetic and any engine agrees bitwise.
  */
object Dsir {

  /** @param isTarget row predicate marking the target-domain exemplars
    *                 (e.g. a curated source) inside `docs`
    * @return (doc_id, n_tokens, avg_logratio, keep) — keep ⇔ the doc's
    *         total importance log-ratio is positive
    */
  def importance(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 1024): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), col("is_t"),
        pmod(TextFunctions.rollingFingerprint(col("tok")),
          lit(buckets.toLong)).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = tok.groupBy(col("b")).agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val totals = model.agg(sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"))
    def lq(num: Column, den: Column): Column =
      floor(log(num.cast("double") / den.cast("double")) * 1e9).cast("long")
    val out = tok.join(broadcast(model), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (lq(col("c_t") + 1L, col("n_t") + buckets.toLong) -
          lq(col("c_r") + 1L, col("n_r") + buckets.toLong)).as("lr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("slr"))
      .select(col("doc_id"), col("n_tokens"),
        (col("slr").cast("double") / 1e9 /
          col("n_tokens").cast("double")).as("avg_logratio"),
        (col("slr") > 0L).as("keep"))
      .localCheckpoint(eager = true) // per-doc sized; then drop the token cache
    tok.unpersist(blocking = false)
    out
  }
}
