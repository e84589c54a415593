package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: writing both join sides bucketed by the
  * join key lets Spark plan a SortMergeJoin with NO shuffle exchange —
  * the pre-partitioning strategy for repeated large-table joins at
  * 100 TB (pay the shuffle once at write time, never at read time).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("bucket-wh").toString
    // (warehouse.dir is static; explicit per-table paths below instead)
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
    val lineitem = Tables.load(spark, TestSpark.sfDir, "lineitem")

    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    // sf0.001 sides are broadcast-sized; force the SMJ path the bucketed
    // layout exists for (at real scale neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (only the final
    // aggregation exchanges, keyed by o_orderstatus)
    val joinSubtree = plan.split("\n").dropWhile(l => !l.contains("SortMergeJoin"))
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!joinSubtree.mkString("\n").contains("Exchange hashpartitioning(l_orderkey")
        && !joinSubtree.mkString("\n").contains("Exchange hashpartitioning(o_orderkey"),
      joinSubtree.take(30).mkString("\n"))

    // and the result matches the unbucketed join
    val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(joined.collect().toSet == expected.collect().toSet)

    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
