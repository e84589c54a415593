package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the mechanism that keeps a
  * selective dim⋈fact join from scanning the full fact side at 100 TB:
  * the optimizer aggregates a bloom filter over the filtered creation
  * side and injects `might_contain(...)` into the fact scan's filters,
  * so most fact rows drop at the scan, before the join shuffle.
  *
  * The thresholds exist for real clusters (fact side must be large
  * enough to be worth it); the spec zeroes the application-side
  * threshold so the rule fires at fixture scale, and disables
  * broadcast so the join actually shuffles (broadcast joins don't need
  * the filter). Asserting both the plan shape AND result equality
  * pins that the filter is a pure pruning optimization. */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim join injects might_contain into the fact side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
      val o = Tables.load(spark, TestSpark.sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no runtime bloom filter injected:\n${opt.take(2000)}")
      assert(opt.contains("bloom_filter_agg"),
        "creation-side bloom aggregate missing")

      // pruning must not change the result
      val expected = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
          .collect()
      }
      assert(j.collect().toSeq == expected.toSeq)
    }
  }
}
