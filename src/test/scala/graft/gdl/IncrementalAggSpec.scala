package graft.gdl

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental view maintenance on top of the TableStore change feed:
  * a per-key (count, sum) aggregate snapshot maintained ONLY from
  * `readChangesSince` deltas must equal a full recompute after any
  * sequence of appends — and compaction must not disturb the
  * checkpoint. This is the materialized-aggregate pattern a 100 TB
  * deployment uses to avoid re-scanning the fact table per refresh:
  * each poll costs O(new data) + a merge on the (small) aggregate.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mergeAgg(snapshot: DataFrame, delta: DataFrame): DataFrame = {
    val d = delta.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"))
    snapshot.unionByName(d)
      .groupBy(col("k"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sv")).as("sv"))
  }

  test("delta-maintained aggregate equals full recompute across appends+compaction") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("store-iagg").toString
    val store = new TableStore(spark, root, autoCompactDeltas = 100)
    var snapshot = Seq.empty[(String, Long, Long)].toDF("k", "cnt", "sv")
    var checkpoint = -1L

    def poll(): Unit = {
      val until = store.history("ev").last._1 // snapshot the head FIRST
      store.readChangesSince("ev", checkpoint, until).foreach { delta =>
        snapshot = mergeAgg(snapshot, delta).localCheckpoint()
      }
      checkpoint = until
    }

    store.append("ev", Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v"))
    poll()
    store.append("ev", Seq(("a", 3L), ("c", 5L)).toDF("k", "v"))
    poll()
    store.compact("ev") // no data change; checkpoint must survive
    poll()
    store.append("ev", Seq(("b", 4L)).toDF("k", "v"))
    poll()

    val expected = store.read("ev").get.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"))
    assert(snapshot.exceptAll(expected).isEmpty &&
           expected.exceptAll(snapshot).isEmpty)
    val m = snapshot.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map("a" -> (3L, 6L), "b" -> (2L, 14L), "c" -> (1L, 5L)))
  }

  test("schema evolution: pre-evolution generations read as null for new columns") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("store-evo").toString
    val store = new TableStore(spark, root, autoCompactDeltas = 100)
    store.append("ev", Seq(("a", 1L)).toDF("k", "v"))
    // evolved writer adds a column; old generation must stay readable
    store.append("ev", Seq(("b", 2L, "en")).toDF("k", "v", "lang"))
    val rows = store.read("ev").get
      .select(col("k"), col("v"), col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2))))
      .toSet
    assert(rows == Set(("a", 1L, None), ("b", 2L, Some("en"))))
    // the change feed sees the evolved schema too
    val delta = store.readChangesSince("ev", 0L).get
    assert(delta.columns.toSeq == Seq("k", "v", "lang"))
  }

  test("a concurrent append between snapshot and poll lands in the NEXT poll") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("store-iagg2").toString
    val store = new TableStore(spark, root, autoCompactDeltas = 100)
    store.append("ev", Seq(("a", 1L)).toDF("k", "v"))
    val until = store.history("ev").last._1
    // "concurrent" append after the head snapshot: bounded poll skips it
    store.append("ev", Seq(("a", 100L)).toDF("k", "v"))
    val bounded = store.readChangesSince("ev", -1L, until).get
    assert(bounded.as[(String, Long)].collect().toSeq == Seq(("a", 1L)))
    // the next poll from the checkpoint picks it up exactly once
    val next = store.readChangesSince("ev", until).get
    assert(next.as[(String, Long)].collect().toSeq == Seq(("a", 100L)))
  }
}
