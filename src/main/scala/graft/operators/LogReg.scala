package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression trainer — the quality-classifier
  * primitive (a fastText-style linear filter surrogate): full-batch
  * gradient descent where each round is ONE map-side-combinable
  * aggregate over the corpus, and the model (a handful of doubles)
  * lives on the driver between rounds — the same model-sized-state
  * discipline as [[KMeans]]'s centroid table.
  *
  * Scale shape (100 TB): per round, every row computes its margin
  * against literal weights (no join — the model is folded into the
  * plan), contributes dim quantized gradient terms, and the aggregate
  * reduces to ONE row of dim longs. No shuffle beyond that aggregate;
  * rounds are unrolled so the plan depth is rounds·O(1).
  *
  * Value-exactness (the cross-engine disciplines from NOTES.md):
  *  - the sigmoid is the one transcendental — it is quantized to the
  *    1e-9 grid (floor(σ·1e9)/1e9) so a ≤1-ulp libm exp difference
  *    cannot leak into the gradient;
  *  - each per-row gradient term (p−y)·x_j is floor-quantized to the
  *    1e-12 long grid before summing, so the corpus sum is order-free
  *    integer arithmetic (independent of partitioning);
  *  - the weight update runs in driver double arithmetic with a fixed
  *    expression shape, `w_j − lr·((g_j/1e12)/n)`, that an oracle
  *    replays bitwise.
  */
object LogReg {

  /** @param feats one row per example with `y` ∈ {0.0, 1.0} and
    *              feature columns `x0..x{dim-1}` (x0 = 1.0 bias)
    * @return (round 1..rounds, j, w) — the weight vector after each
    *         full-batch GD round, starting from w = 0
    */
  def train(feats: DataFrame, dim: Int, lr: Double, rounds: Int): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    var w = Array.fill(dim)(0.0)
    val hist = Seq.newBuilder[(Long, Long, Double)]
    for (r <- 1 to rounds) {
      val z = (0 until dim).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
      val p = floor(lit(1.0) / (lit(1.0) + exp(-z)) * 1e9).cast("long")
        .cast("double") / 1e9
      val gradAggs = count(lit(1)).as("n") +:
        (0 until dim).map(j =>
          sum(floor((p - col("y")) * col(s"x$j") * 1e12).cast("long")).as(s"g$j"))
      val row = feats.select(col("y") +: (0 until dim).map(j => col(s"x$j")): _*)
        .agg(gradAggs.head, gradAggs.tail: _*)
        .collect()(0) // model-sized: 1 row of dim longs
      val n = row.getLong(0).toDouble
      w = Array.tabulate(dim) { j =>
        w(j) - lr * (row.getLong(j + 1).toDouble / 1e12 / n)
      }
      (0 until dim).foreach(j => hist += ((r.toLong, j.toLong, w(j))))
    }
    hist.result().toDF("round", "j", "w")
  }

  /** Fused one-vs-rest trainer: every class's gradient in ONE
    * map-side-combinable aggregate per round — `rounds` corpus passes
    * total instead of `classes·rounds`. Per-class weights are bitwise
    * identical to running [[train]] once per class: the quantized
    * sigmoid, the per-row 1e-12 gradient grid, and the driver update
    * keep the exact expression shapes; fusion only shares the row scan.
    *
    * The per-class sigmoids are staged through ONE projection
    * (`_p0.._p{k-1}`) so the classes·dim sum children stay flat
    * (p_k − y_k)·x_j terms — the aggregate's generated update code is
    * linear in classes·dim, well clear of the Janino method cliff that
    * inlining classes·dim dot products would risk.
    *
    * @param feats one row per example with label columns
    *              `y_0..y_{classes-1}` (each ∈ {0.0, 1.0}) and feature
    *              columns `x0..x{dim-1}` (x0 = 1.0 bias)
    * @return per-class final weight vectors, index-aligned with the
    *         label columns
    */
  def trainMulti(feats: DataFrame, classes: Int, dim: Int, lr: Double,
                 rounds: Int): Seq[Seq[Double]] = {
    var ws = Array.fill(classes)(Array.fill(dim)(0.0))
    for (_ <- 1 to rounds) {
      val ps = (0 until classes).map { k =>
        val z = (0 until dim).map(j => lit(ws(k)(j)) * col(s"x$j")).reduce(_ + _)
        (floor(lit(1.0) / (lit(1.0) + exp(-z)) * 1e9).cast("long")
          .cast("double") / 1e9).as(s"_p$k")
      }
      val staged = feats.select(
        (0 until classes).map(k => col(s"y_$k")) ++
          (0 until dim).map(j => col(s"x$j")) ++ ps: _*)
      val aggs = count(lit(1)).as("n") +:
        (for { k <- 0 until classes; j <- 0 until dim } yield
          sum(floor((col(s"_p$k") - col(s"y_$k")) * col(s"x$j") * 1e12)
            .cast("long")).as(s"g_${k}_$j"))
      val row = staged.agg(aggs.head, aggs.tail: _*)
        .collect()(0) // model-sized: 1 row of classes·dim longs
      val n = row.getLong(0).toDouble
      ws = Array.tabulate(classes)(k => Array.tabulate(dim)(j =>
        ws(k)(j) - lr * (row.getLong(1 + k * dim + j).toDouble / 1e12 / n)))
    }
    ws.toSeq.map(_.toSeq)
  }

  /** Scoring column for a trained weight vector: the quantized sigmoid
    * of the margin — same expression shape as training, so scores are
    * reproducible anywhere. */
  def score(w: Seq[Double], xs: Seq[Column]): Column = {
    val z = w.zip(xs).map { case (wj, x) => lit(wj) * x }.reduce(_ + _)
    floor(lit(1.0) / (lit(1.0) + exp(-z)) * 1e9).cast("long").cast("double") / 1e9
  }
}
