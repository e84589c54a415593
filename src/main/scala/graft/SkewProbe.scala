package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Scratch probe: make AQE's OptimizeSkewedJoin fire at test scale. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.log4j.LogManager
      .getLogger("org.apache.spark.sql.execution.adaptive")
      .setLevel(org.apache.log4j.Level.DEBUG)
    import spark.implicits._

    // 90% of left rows share key 0; md5 payload defeats compression;
    // repartition by row id spreads the hot key across 16 mappers
    val left = spark.range(200000).select(
      when(col("id") % 10 === 0, col("id") % 997 + 1).otherwise(lit(0L)).as("k"),
      md5(col("id").cast("string")).as("payload"))
      .repartition(16, col("id") % 16)
    val right = spark.range(1000).select(col("id").as("k"),
      md5(col("id").cast("string")).as("rpayload"))
      .repartition(8, col("id") % 8)

    // IMPORTANT: nothing downstream may require hash-partitioning on the
    // join key (a groupBy("k") after the join blocks OptimizeSkewedJoin —
    // splitting a skewed partition would violate the agg's required
    // distribution, so AQE skips the split)
    val out = left.join(right, "k")
    // collect, not a noop write: the write would execute a SEPARATE
    // QueryExecution, leaving out.queryExecution's adaptive plan
    // unexecuted and the skew split invisible to the node walk below
    out.collect()

    def deep(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(deep)
    }
    val nodes = deep(out.queryExecution.executedPlan)
    println("==== executed nodes ====")
    nodes.foreach(n => println("  " + n.getClass.getSimpleName + (n match {
      case s: SortMergeJoinExec => s" isSkewJoin=${s.isSkewJoin}"
      case _ => ""
    })))
    val skew = nodes.collect { case s: SortMergeJoinExec if s.isSkewJoin => s }
    println(s"==== skew joins found: ${skew.size}")
    spark.stop()
  }
}
