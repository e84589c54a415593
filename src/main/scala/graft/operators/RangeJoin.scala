package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tolerance (band) range join: pairs of left/right rows with equal keys
  * and |left.ts − right.ts| ≤ tolerance.
  *
  * The naive plan is an equi-join on the keys with the band predicate as
  * a post-filter — fine per key group, quadratic in hot keys. This
  * implementation buckets time into tolerance-sized windows and joins on
  * (keys, bucket) with each left row duplicated into its two candidate
  * buckets, so the join key carries the band: a pair within tolerance is
  * at most one bucket apart, and the equi-join only materializes
  * same-or-adjacent-bucket candidates before the exact filter. That
  * turns the per-key cross product into a per-(key, 2·tolerance-window)
  * cross product — the standard band-join decomposition, all shuffle
  * hash joins.
  */
object RangeJoin {

  /** @param left  must contain `keys` and `tsCol` (numeric, e.g. µs)
    * @param right must contain `keys` and `tsCol`; its other columns are
    *              suffixed on collision by the caller
    * @param tolerance same unit as `tsCol` */
  def byTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    // a right row within [t−tol, t+tol] lives in bucket(t)−1 … bucket(t)+1,
    // so each left row probes exactly those three buckets; a qualifying
    // pair matches on exactly ONE bucket value (right's bucket is fixed),
    // so the join produces no duplicates.
    // INTEGER division, not `/`: Column `/` on longs is double division,
    // and timestamps past 2^53 (nanosecond epochs are ~1.7e18) lose
    // precision — buckets land arbitrarily far from the true bucket and
    // in-tolerance pairs silently vanish. Trunc-div still maps any
    // tolerance-wide interval onto ≤ 2 adjacent buckets, which the ±1
    // probe covers.
    def bucketOf(ts: String): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
      column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        expression(col(ts).cast("long")), expression(lit(tolerance))))
    }
    val l = left
      .withColumn("_lb", bucketOf(leftTs))
      .withColumn("_bucket",
        explode(array(col("_lb") - 1, col("_lb"), col("_lb") + 1)))
      .drop("_lb")
    val r = right.withColumn("_bucket", bucketOf(rightTs))
    l.join(r, keys :+ "_bucket")
      .filter(abs(col(leftTs) - col(rightTs)) <= tolerance)
      .drop("_bucket")
  }
}
