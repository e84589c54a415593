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

  /** Scoring column for a trained weight vector: the quantized sigmoid
    * of the margin — same expression shape as training, so scores are
    * reproducible anywhere. */
  def score(w: Seq[Double], xs: Seq[Column]): Column = {
    val z = w.zip(xs).map { case (wj, x) => lit(wj) * x }.reduce(_ + _)
    floor(lit(1.0) / (lit(1.0) + exp(-z)) * 1e9).cast("long").cast("double") / 1e9
  }
}
