package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *    grid via `floor(x·1e12)` summed as DECIMAL(38,0) — integer
  *    addition is exact, so the result is independent of partitioning
  *    and accumulation order (double sums are not), and floor has no
  *    rounding ties (a DECIMAL value cast does: exact binary fractions
  *    like 0.1983642578125 end in "…5" and HALF_UP vs half-to-even
  *    engines disagree); the 38-digit accumulator cannot overflow at
  *    any realistic cluster size (a LONG accumulator wraps/throws past
  *    ~9.2M members of unit-scale values — exactly the 100 TB case);
  *    quantization error 1e-12 is noise at clustering precision.
  *    Empty clusters keep their previous centroid.
  *
  * Scale shape: assignment is MAP-ONLY — the k·dim centroids are
  * collected (k rows; the same size every k-means implementation
  * broadcasts) and shipped as an array literal, and each vector picks
  * its nearest via `array_min` over per-centroid (dist, cid) structs,
  * so no crossJoin row expansion and NO shuffle carries embeddings.
  * The update shuffles k·dim tiny partial sums (map-side combined).
  * Centroids are localCheckpointed per round so the plan stays O(1)
  * deep across iterations — the standard distributed k-means layout.
  */
object KMeans {

  /** The shared map-only argmin: centroids as ONE array literal of
    * (cent, cid) structs, nearest picked via `array_min` over
    * (sqdist, cid) — struct comparison IS (dist asc, cid asc), the
    * oracle's row_number tie-break. Expects an `emb` column of doubles
    * in scope. */
  private def argminStruct(centRows: Array[(Long, Seq[Double])]): Column = {
    val centLit: Column = array(centRows.sortBy(_._1).map { case (cid, cent) =>
      struct(typedLit(cent).as("cent"), lit(cid).as("cid")) }.toSeq: _*)
    array_min(transform(centLit, c =>
      struct(
        aggregate(
          zip_with(col("emb"), c.getField("cent"), (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _).as("d"),
        c.getField("cid").as("cid"))))
  }

  /** Map-only nearest-centroid assignment against TRAINED (or stored)
    * centroids: (id, cid, sqdist) — zero shuffle, the same argmin and
    * tie-break as [[train]]'s rounds. The squared-L2 sibling of
    * [[Similarity.ivfAssign]] (which assigns by cosine); this one also
    * returns the distance, the raw material for drift monitoring
    * (q136): rising mean cell distance = the retrain trigger every IVF
    * deployment watches.
    *
    * @param centroids (cid: Long, centroid: Array[Float|Double]) */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val v = corpus
      .select(col("id"), transform(col("embedding"), _.cast("double")).as("emb"))
    val best = argminStruct(
      centroids
        .select(col("cid"), transform(col("centroid"), _.cast("double")).as("cent"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))))
    v.select(col("id"), best.getField("cid").as("cid"),
      best.getField("d").as("sqdist"))
  }

  /** @param corpus (id: Long, embedding: Array[Float|Double])
    * @param iters  number of assign+update rounds, ≥ 1
    * @return (cid, n_members, centroid: Array[Double]) after `iters`
    *         assign+update rounds; n_members counts the final assignment
    *         that produced the returned centroids (0 for empty clusters)
    */
  def train(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val v = corpus
      .select(col("id"), transform(col("embedding"), _.cast("double")).as("emb"))
    // the k corpus vectors with the SMALLEST ids — not `id < k`, which
    // silently under-seeds (or empties) the codebook for sparse or
    // non-zero-based id spaces
    var cents = v.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("emb").as("cent"))
      .localCheckpoint()
    var lastAssign: DataFrame = null

    for (round <- 1 to iters) {
      // centroids → one array literal per round (k·dim doubles, the
      // broadcast every k-means ships); argmin is then a map-only
      // array_min over (dist, cid) structs — struct order IS
      // (dist asc, cid asc), the same tie-break as the oracle's
      // row_number over ORDER BY dist, cid
      val best = argminStruct(
        cents.select(col("cid"), col("cent")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1))))
      var assigned = v.select(col("id"), col("emb"),
        best.getField("cid").as("cid"))
      // the final round's assignment feeds BOTH the means and the
      // n_members count — materialize it once instead of re-running
      // the assignment scan for the count
      if (round == iters) assigned = assigned.localCheckpoint(eager = true)
      val means = assigned
        .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(floor(col("x") * 1e12).cast("decimal(38,0)")).cast("double")
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
