package graft.functions

import graft.{PlanAudit, TestSpark}
import graft.operators.TopK
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

class MinKLongsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def minK(vals: Seq[(String, java.lang.Long)], k: Int): Map[String, Seq[Long]] =
    vals.toDF("g", "v")
      .repartition(7) // force partial buffers so merge runs
      .groupBy(col("g")).agg(TopK.minKPacked(k)(col("v")).as("mk"))
      .as[(String, Seq[Long])].collect().toMap

  test("property: equals sorted-take-k per group, across partial merges") {
    val gen = Gen.listOfN(200,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-1000000L, 1000000L)))
    (1 to 8).foreach { _ =>
      val vs = gen.sample.get
      val vals = vs.map { case (g, v) => (g, java.lang.Long.valueOf(v)) }
      val got = minK(vals, 3)
      val want = vals.groupBy(_._1)
        .map { case (g, xs) => g -> xs.map(_._2.longValue).sorted.take(3) }
      assert(got == want)
    }
  }

  test("nulls are ignored; k larger than the group truncates cleanly") {
    val got = minK(Seq(("a", 5L), ("a", null), ("a", 2L)), 4)
    assert(got == Map("a" -> Seq(2L, 5L)))
  }

  test("Long.MaxValue is the documented empty sentinel and is dropped") {
    val got = minK(Seq(("a", Long.MaxValue), ("a", 9L)), 2)
    assert(got == Map("a" -> Seq(9L)))
  }

  test("plan: flat long buffer keeps the aggregate in codegen'd HashAggregate") {
    val df = (1L to 100L).map(i => (i % 5, i)).toDF("g", "v")
      .groupBy(col("g")).agg(TopK.minKPacked(3)(col("v")))
    val nodes = PlanAudit.flatten(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[HashAggregateExec]) >= 2,
      nodes.map(_.nodeName).distinct.mkString(", "))
    assert(!nodes.exists(_.isInstanceOf[ObjectHashAggregateExec]),
      "primitive buffer slots must not fall back to ObjectHashAggregate")
  }
}
