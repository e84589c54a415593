package graft.operators

import graft.{PlanAudit, Tables, TestSpark}
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aggregate form equals the window form row-for-row") {
    val win = graft.queries.RelationalOps.queries("q41_topk_per_group")(
      spark, TestSpark.sfDir)
    val agg = graft.queries.RelationalOps.queries("q87_topk_agg")(
      spark, TestSpark.sfDir)
    assert(win.exceptAll(agg).isEmpty && agg.exceptAll(win).isEmpty)
  }

  test("plan is a partial/final aggregate pair with no window and no row shuffle") {
    val joined = Tables.load(spark, TestSpark.sfDir, "orders")
      .join(broadcast(Tables.load(spark, TestSpark.sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
    val df = TopK.perKeyDesc(joined, "c_mktsegment", "o_totalprice",
      "o_orderkey", k = 3)
    val nodes = PlanAudit.flatten(df.queryExecution.executedPlan)
    // two ObjectHashAggregates (partial below the exchange, final above):
    // the shuffle between them carries ONLY the k-bounded buffers
    assert(nodes.count(_.isInstanceOf[ObjectHashAggregateExec]) >= 2,
      nodes.map(_.nodeName).distinct.mkString(", "))
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      "aggregate form must not fall back to a window")
  }

  test("buffer stays bounded at k under skewed merges") {
    // one hot key, many rows: result must still be exactly k rows
    val hot = (1L to 5000L).map(i => ("hot", i.toDouble % 97, i)).toDF(
      "k", "ord", "tie")
    val r = TopK.perKeyDesc(hot, "k", "ord", "tie", k = 3)
      .as[(String, Double, Long, Long)].collect().sortBy(_._4)
    assert(r.length == 3)
    // desc by ord (max 96.0), ties by smallest tie id
    assert(r.map(_._2).toSeq == Seq(96.0, 96.0, 96.0))
    assert(r.map(_._3).toSeq == Seq(96L, 193L, 290L))
  }
}
