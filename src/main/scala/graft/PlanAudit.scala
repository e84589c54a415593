package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of representative queries and
  * flag the properties the 100 TB design depends on — parquet predicate
  * pushdown, column-pruned scans, broadcast joins, whole-stage codegen.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_prefix", "q07_outcome_filter", "q11_status_merge",
               "q17_revenue_agg", "q24_minhash_lsh", "q26_cosine_topk",
               "q31_asof_join")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n======== $name ========")
      println(plan.linesIterator.take(60).mkString("\n"))
      val full = df.queryExecution.executedPlan.toString
      println(s"-- audit: pushedFilters=${plan.contains("PushedFilters: [")}" +
        s" broadcast=${full.contains("BroadcastHashJoin") || plan.contains("BroadcastHashJoin")}" +
        s" codegen=${plan.contains("WholeStageCodegen")}")
    }
    spark.stop()
  }
}
