package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning — the partition-layout counterpart of the
  * runtime bloom filter: when a partitioned fact table joins a dim
  * whose filter determines the partition keys only at runtime, the
  * optimizer injects a `dynamicpruning` subquery into the fact scan's
  * PARTITION filters, so entire directories are skipped before any
  * file is opened. On a dataset_id-partitioned lake table (TableStore's
  * layout) this is what makes "join the catalog, read one dataset"
  * touch one partition instead of the whole lake. */
class DynamicPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dim filter prunes fact partitions via dynamicpruning subquery") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpp-fact").toString
    Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // runtime-only dim: file-backed so the selective filter survives as
    // a plan node (a LocalRelation dim would be constant-folded by
    // ConvertToLocalRelation and DPP sees no selective predicate)
    val dimDir = java.nio.file.Files.createTempDirectory("dpp-dim").toString
    Seq(("purchase", 1L), ("error", 0L), ("click", 0L))
      .toDF("event_type", "keep")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val j = fact.join(dim, Seq("event_type")).filter(col("keep") === 1L)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))

    val scans = PlanAudit.flatten(j.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    val factScan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("dpp-fact"))).get
    assert(factScan.partitionFilters.exists(
        _.toString.contains("dynamicpruning")),
      s"no dynamic pruning on fact partitions: ${factScan.partitionFilters}")

    // and the pruned plan still computes the right answer
    val rows = j.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "purchase")
  }
}
