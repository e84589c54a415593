package graft.plans

import graft.{PlanAudit, TestSpark}
import graft.operators.AsOfJoin
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator as-of join (LogicalPlan → Strategy →
  * SparkPlan) must (a) actually plan as AsOfJoinExec, (b) get its
  * exchanges and sorts from EnsureRequirements, and (c) agree row-exact
  * with the composed union+window implementation on dense random data —
  * ties, missing matches, multi-row groups and all. */
class AsOfJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randomSides(seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // small key space + small time space → dense collisions and exact
    // timestamp ties, the edge cases that break as-of implementations
    val left = Seq.tabulate(400)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "left_id")
    val right = Seq.tabulate(150)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, i.toLong * 10))
      .toDF("k", "t", "payload")
      // dedup (k, t) so "latest right at time t" is unique — without
      // this both implementations tie-break arbitrarily within a timestamp
      .groupBy("k", "t").agg(max("payload").as("payload"))
    (left, right)
  }

  test("plans as AsOfJoinExec with planner-inserted exchanges and sorts") {
    val (l, r) = randomSides(1)
    val df = AsOfJoin.backwardPlanned(l, r, Seq("k"), "t", Seq("payload"))
    df.collect()
    val nodes = PlanAudit.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]), "custom node not planned")
    // EnsureRequirements must have inserted a hash exchange per side and
    // a (key, time) sort per side — the node declares, never schedules
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) >= 2)
    val sorts = nodes.collect { case s: SortExec => s.sortOrder.map(_.child.toString) }
    assert(sorts.count(_.length == 2) >= 2, s"expected (key,time) sorts, got $sorts")
  }

  test("row-exact vs the composed union+window implementation") {
    for (seed <- 1 to 3) {
      val (l, r) = randomSides(seed)
      val planned = AsOfJoin.backwardPlanned(l, r, Seq("k"), "t", Seq("payload"))
        .select("k", "t", "left_id", "payload").collect().map(_.toSeq).toSet
      val composed = AsOfJoin.backward(l, r, Seq("k"), "t", Seq("payload"))
        .select("k", "t", "left_id", "payload").collect().map(_.toSeq).toSet
      assert(planned == composed, s"seed $seed mismatch")
    }
  }

  test("left rows with no preceding right row carry nulls; ties are inclusive") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (9L, 1L, "r9"))
      .toDF("k", "t", "p")
    val out = AsOfJoin.backwardPlanned(l, r, Seq("k"), "t", Seq("p"))
      .select("tag", "p").collect().map(x => (x.getString(0), x.getString(1))).toMap
    assert(out == Map("a" -> "r10", // tie at t=10 matches (inclusive)
                      "b" -> "r15", // latest preceding, not first
                      "c" -> null)) // key 2 has no right rows at all
  }

  test("a REAL null in the matched right row is carried, not a stale value") {
    import spark.implicits._
    val l = Seq((1L, 3L, "q")).toDF("k", "t", "tag")
    val r = Seq((1L, 1L, Some(5L), Some(7L)), (1L, 2L, None, Some(8L)))
      .toDF("k", "t", "x", "y")
    // the latest preceding right row is (t=2, x=null, y=8); per-column
    // carry would stitch (x=5, y=8) — a row that never existed
    val out = AsOfJoin.backward(l, r, Seq("k"), "t", Seq("x", "y"))
      .select("x", "y").head()
    assert(out.isNullAt(0) && out.getLong(1) == 8L,
      s"expected (null, 8), got $out")
    val planned = AsOfJoin.backwardPlanned(l, r, Seq("k"), "t", Seq("x", "y"))
      .select("x", "y").head()
    assert(planned.isNullAt(0) && planned.getLong(1) == 8L)
  }

  test("key predicates push through the custom node into both parquet scans") {
    val sf = graft.TestSpark.sfDir
    val events = graft.Tables.load(spark, sf, "events")
    val l = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value"))
    val joined = AsOfJoin.backwardPlanned(l, r, Seq("user_id"), "ts", Seq("value"))
      .filter(col("user_id") < 50L)

    val audit = PlanAudit.audit(joined)
    assert(audit.scans.nonEmpty)
    // the key filter must reach EVERY events scan — Catalyst alone
    // cannot push through an unknown binary node, AsOfJoinKeyPushdown can
    audit.scans.foreach { s =>
      assert(s.pushedFilters.contains("LessThan(user_id,50)"),
        s"key filter not pushed into scan ${s.source}: ${s.pushedFilters}")
    }

    // and the rewrite is semantics-preserving
    val expected = AsOfJoin.backwardPlanned(
      l.filter(col("user_id") < 50L), r.filter(col("user_id") < 50L),
      Seq("user_id"), "ts", Seq("value")).collect().map(_.toSeq).toSet
    assert(joined.collect().map(_.toSeq).toSet == expected)
  }

  test("non-key predicates stay above the join") {
    import spark.implicits._
    val l = Seq((1L, 10L, 5.0), (1L, 20L, 9.0)).toDF("k", "t", "v")
    val r = Seq((1L, 10L, "r10"), (1L, 15L, "r15")).toDF("k", "t", "p")
    // filtering on the carried payload must NOT drop right rows early:
    // "b" still matches r15 even though r10 is filtered from the OUTPUT
    val out = AsOfJoin.backwardPlanned(l, r, Seq("k"), "t", Seq("p"))
      .filter(col("p") === "r15")
    assert(out.collect().map(_.getDouble(2)).toSeq == Seq(9.0))
  }

  test("self-joining two derivations of one table resolves (fresh right ids)") {
    import spark.implicits._
    val base = Seq((1L, 1L, "x", 1.0), (1L, 2L, "y", 2.0), (1L, 3L, "x", 3.0))
      .toDF("k", "t", "side", "v")
    val l = base.filter(col("side") === "y").select("k", "t", "v")
    val r = base.filter(col("side") === "x")
      .select(col("k"), col("t"), col("v").as("rv"))
    val rows = AsOfJoin.backwardPlanned(l, r, Seq("k"), "t", Seq("rv")).collect()
    assert(rows.length == 1 && rows.head.getDouble(3) == 1.0)
  }
}
