package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means for training the IVF coarse quantizer
  * (q38/q39 currently ship stand-in centroids; this trains real ones).
  *
  * Every step is deterministic, so the whole training run is
  * value-exact reproducible (and DuckDB-oracle-checkable):
  *  - init: centroids = the k corpus vectors with the smallest ids
  *    (k-means‖ would be the production choice; init strategy is
  *    orthogonal to the distributed step);
  *  - assign: per vector, argmin of squared-L2 distance computed as the
  *    same sequential left-fold the oracle uses, ties toward the
  *    smaller centroid id;
  *  - update: per-dimension mean over values quantized to the 1e-12
  *    grid via `floor(x·1e12)` summed as longs — integer addition is
  *    exact, so the result is independent of partitioning and
  *    accumulation order (double sums are not), and floor has no
  *    rounding ties (a DECIMAL cast does: exact binary fractions like
  *    0.1983642578125 end in "…5" and HALF_UP vs half-to-even engines
  *    disagree); quantization error 1e-12 is noise at clustering
  *    precision. Empty clusters keep their previous centroid.
  *
  * Scale shape: assignment is one broadcast of k·dim doubles against a
  * corpus scan (no shuffle); the update shuffles k·dim tiny partial
  * sums (map-side combined). Centroids are localCheckpointed per round
  * so the plan stays O(1) deep across iterations — the standard
  * distributed k-means layout.
  */
object KMeans {

  /** @param corpus (id: Long, embedding: Array[Float|Double])
    * @return (cid, n_members, centroid: Array[Double]) after `iters`
    *         assign+update rounds; n_members counts the final assignment
    *         that produced the returned centroids (0 for empty clusters)
    */
  def train(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val v = corpus
      .select(col("id"), transform(col("embedding"), _.cast("double")).as("emb"))
    var cents = v.filter(col("id") < k)
      .select(col("id").as("cid"), col("emb").as("cent"))
      .localCheckpoint()
    var lastAssign: DataFrame = null

    for (_ <- 1 to iters) {
      val dist = aggregate(
        zip_with(col("emb"), col("cent"), (x, y) => (x - y) * (x - y)),
        lit(0.0), _ + _)
      val w = Window.partitionBy(col("id")).orderBy(col("dist"), col("cid"))
      val assigned = v.crossJoin(broadcast(cents))
        .select(col("id"), col("emb"), col("cid"), dist.as("dist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("emb"), col("cid"))
      val means = assigned
        .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(floor(col("x") * 1e12).cast("long")).cast("double")
                / 1e12 / count(lit(1)).cast("double")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("cent_new"))
      cents = cents.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cent_new"), col("cent")).as("cent"))
        .localCheckpoint() // cut lineage; k·dim doubles, trivially small
      lastAssign = assigned
    }

    val counts = lastAssign.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"))
    cents.join(counts, Seq("cid"), "left")
      .select(col("cid"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        col("cent").as("centroid"))
  }
}
