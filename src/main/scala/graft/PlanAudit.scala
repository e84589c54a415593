package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** One parquet scan's scale-relevant properties: which columns it
  * actually reads (column pruning) and which predicates reached the
  * reader (predicate pushdown). */
final case class ScanAudit(source: String, readColumns: Seq[String],
                           pushedFilters: String)

/** Structural audit of a physical plan — the properties the 100 TB
  * design depends on, read from plan NODES rather than the explain
  * string (string-matching the formatted explain reported false
  * negatives: codegen prints as `[codegen id : N]`, not
  * `WholeStageCodegen`, and scans with nothing to push omit the
  * `PushedFilters` line entirely). */
final case class PlanReport(scans: Seq[ScanAudit],
                            wholeStageCodegen: Boolean,
                            broadcastJoins: Int,
                            shuffleJoins: Int,
                            cartesianProducts: Int,
                            generates: Int) {
  def render: String = {
    val scanLines = scans.map(s =>
      s"  scan ${s.source}: read=[${s.readColumns.mkString(",")}] pushed=${s.pushedFilters}")
    val head = s"-- audit: codegen=$wholeStageCodegen" +
      s" broadcastJoins=$broadcastJoins shuffleJoins=$shuffleJoins" +
      s" cartesian=$cartesianProducts generates=$generates"
    (head +: scanLines).mkString("\n")
  }
}

/** Dev tool: audit representative queries' physical plans for parquet
  * predicate pushdown, column-pruned scans, broadcast joins and
  * whole-stage codegen. `audit` is the pure, spec-tested core; `main`
  * dumps formatted plans plus the report.
  *
  * Run audits with AQE off: before execution an adaptive plan carries
  * no codegen nodes (AQE inserts them per query stage at
  * materialization), so a pre-execution audit under AQE would
  * under-report codegen — the false negative this tool used to have in
  * string form. */
object PlanAudit {

  def audit(df: DataFrame): PlanReport = {
    val nodes = flatten(df.queryExecution.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec =>
      ScanAudit(
        f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"),
        f.requiredSchema.fieldNames.toSeq,
        f.metadata.getOrElse("PushedFilters", "[]"))
    }
    PlanReport(
      scans,
      nodes.exists(_.isInstanceOf[WholeStageCodegenExec]),
      nodes.count(n => n.isInstanceOf[BroadcastHashJoinExec] ||
                       n.isInstanceOf[BroadcastNestedLoopJoinExec]),
      nodes.count(n => n.isInstanceOf[SortMergeJoinExec] ||
                       n.isInstanceOf[ShuffledHashJoinExec]),
      nodes.count(_.isInstanceOf[CartesianProductExec]),
      nodes.count(_.isInstanceOf[GenerateExec]))
  }

  /** Pre-order traversal that descends through the AQE wrapper and
    * materialized query stages (their current plan is a field, not a
    * child, so TreeNode collect misses everything under them). */
  def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // off so the static plan carries codegen nodes (see scaladoc)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_prefix", "q07_outcome_filter", "q11_status_merge",
               "q17_revenue_agg", "q24_minhash_lsh", "q26_cosine_topk",
               "q31_asof_join", "q41_topk_per_group")
    if (names == Seq("ALL")) {
      // fleet sweep: one audit summary line per query, no plan dumps —
      // the every-plan sanity pass (cartesians, codegen, scan shapes)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val r = audit(fn(spark, sfDir))
          val scanCols = r.scans.map(s =>
            s"${s.source}:${s.readColumns.size}c").mkString(" ")
          println(f"AUDIT $name%-26s codegen=${r.wholeStageCodegen}%-5s " +
            f"bcast=${r.broadcastJoins}%-2d shuf=${r.shuffleJoins}%-2d " +
            f"cart=${r.cartesianProducts} scans[$scanCols]")
        } catch { case e: Throwable =>
          println(s"AUDIT $name ERROR ${e.getClass.getSimpleName}")
        }
      }
    } else names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n======== $name ========")
      println(plan.linesIterator.take(60).mkString("\n"))
      println(audit(df).render)
    }
    spark.stop()
  }
}
