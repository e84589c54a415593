package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join: the runtime re-plan path for skewed JOIN keys (the
  * `Salted` operator covers skewed AGGREGATION keys). Pinned by a plan
  * assertion so the 100 TB skew story is demonstrated, not claimed.
  *
  * Two behaviors worth pinning, both learned the hard way:
  *  - the split fires only off real map-output statistics (hot key
  *    spread across many mappers, partition > factor×median AND >
  *    threshold) — fixture-scale data with default thresholds never
  *    triggers it;
  *  - nothing downstream may REQUIRE hash-partitioning on the join key:
  *    a groupBy(join key) right after the join makes AQE keep the
  *    partitioning intact (splitting a skewed partition would break the
  *    aggregate's required distribution), so the join stays unsplit.
  */
class AqeSkewJoinSpec extends AnyFunSuite {

  /** Separate session: skew thresholds are runtime SQL confs, scoped to
    * the session, so the shared TestSpark context is untouched. */
  private lazy val spark: SparkSession = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  /** 90 % of left rows share key 0; md5 payload defeats shuffle
    * compression; repartition by row id spreads the hot key across 16
    * mappers so map-output stats show a genuinely multi-mapper hot
    * reduce partition (single-mapper hot keys can't be split). */
  private def skewedJoin(s: SparkSession) = {
    val left = s.range(200000).select(
      when(col("id") % 10 === 0, col("id") % 997 + 1).otherwise(lit(0L)).as("k"),
      md5(col("id").cast("string")).as("payload"))
      .repartition(16, col("id") % 16)
    val right = s.range(1000).select(col("id").as("k"),
      md5(col("id").cast("string")).as("rpayload"))
      .repartition(8, col("id") % 8)
    left.join(right, "k")
  }

  private def skewJoinCount(df: org.apache.spark.sql.DataFrame): Int = {
    // collect, not a noop write: a write executes a SEPARATE
    // QueryExecution, leaving df.queryExecution's adaptive plan
    // unexecuted and the skew split invisible to the node walk
    df.collect()
    PlanAudit.flatten(df.queryExecution.executedPlan)
      .count { case s: SortMergeJoinExec => s.isSkewJoin; case _ => false }
  }

  test("OptimizeSkewedJoin splits the hot partition of a skewed SMJ") {
    assert(skewJoinCount(skewedJoin(spark)) >= 1,
      "expected SortMergeJoin(skew=true) in the executed plan")
  }

  test("a downstream agg on the join key blocks the split (required distribution)") {
    val df = skewedJoin(spark).groupBy("k").agg(count(lit(1)).as("n"))
    df.collect()
    val skewed = PlanAudit.flatten(df.queryExecution.executedPlan)
      .count { case s: SortMergeJoinExec => s.isSkewJoin; case _ => false }
    assert(skewed == 0,
      "split should be suppressed when the join's output partitioning is required downstream")
  }
}
