package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase salted groupBy.
  *
  * A plain `groupBy(key)` over a skewed 100 TB table funnels every row
  * of a hot key through one reducer. Salting splits each key into
  * `saltBuckets` sub-groups for the first (map-side-combinable) partial
  * aggregation, then merges partials in a second, tiny shuffle keyed by
  * the original column — the classic two-stage pattern AQE's skew-join
  * handling doesn't cover for aggregations.
  *
  * The salt is derived from stable row content (not `rand()`), keeping
  * results deterministic and replayable under task retry — over ALL
  * columns, not just (key, value): a hot key whose value is constant
  * (the common skew shape — think a default/zero value) would hash to
  * ONE salt bucket under a (key, value) salt and get no mitigation at
  * all. Fully identical rows still co-bucket; spread them upstream
  * with any distinct per-row column. The aggregate itself is
  * salt-independent (counts/sums are associative), so the salt basis
  * never changes results.
  */
object Salted {

  /** count + sum(valueCol as decimal) per key, salted. Result is exactly
    * the unsalted aggregate (counts/sums are associative). */
  def aggregate(df: DataFrame, keyCol: String, valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"),
           sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
             .as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n_rows"),
           sum(col("_s")).cast("double").as("sum_value"))
  }

}
