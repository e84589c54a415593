package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-fixture pins for the rank-symmetric preference-pair miner —
  * the semantics the synthetic corpus can't isolate: margin boundary
  * inclusivity, the odd-n middle self-pair exclusion, per-stratum
  * independence, and determinism of the shard hash. */
class PreferencePairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one stratum, one shard: scores 50 > 40 > 30 > 20 > 10
  private def five = Seq(
    (1L, "s", 50L), (2L, "s", 40L), (3L, "s", 30L),
    (4L, "s", 20L), (5L, "s", 10L)).toDF("id", "src", "q")

  test("rank-symmetric matching: best-vs-worst first, middle excluded") {
    val p = PreferencePairs.mine(five, "id", "src", "q",
        nShards = 1, marginQ = 0L)
      .orderBy("pair_rank")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // i=1: (50,10); i=2: (40,20); i=3 is the middle row — no self-pair
    assert(p.toSeq == Seq((1L, 1L, 5L, 40L), (2L, 2L, 4L, 20L)))
  }

  test("margin boundary is inclusive; above-margin pairs cut") {
    val atBoundary = PreferencePairs.mine(five, "id", "src", "q",
      nShards = 1, marginQ = 20L)
    assert(atBoundary.count() == 2) // gap 20 kept at margin 20
    val above = PreferencePairs.mine(five, "id", "src", "q",
      nShards = 1, marginQ = 21L)
    assert(above.count() == 1) // only the (50,10) gap-40 pair
  }

  test("strata pair independently; even n pairs everything") {
    val df = Seq(
      (1L, "a", 90L), (2L, "a", 10L),
      (3L, "b", 80L), (4L, "b", 60L), (5L, "b", 40L), (6L, "b", 20L))
      .toDF("id", "src", "q")
    val p = PreferencePairs.mine(df, "id", "src", "q", 1, 0L)
      .orderBy("stratum", "pair_rank").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(p.toSeq == Seq(("a", 1L, 2L), ("b", 3L, 6L), ("b", 4L, 5L)))
  }

  test("sharding is deterministic and partitions the id space") {
    val df = (1L to 40L).map(i => (i, "s", i * 10L)).toDF("id", "src", "q")
    val p1 = PreferencePairs.mine(df, "id", "src", "q", 4, 0L).collect()
    val p2 = PreferencePairs.mine(df, "id", "src", "q", 4, 0L).collect()
    assert(p1.map(_.toString).sorted.toSeq ==
      p2.map(_.toString).sorted.toSeq)
    // every id appears at most once across all pairs
    val ids = p1.flatMap(r => Seq(r.getLong(3), r.getLong(4)))
    assert(ids.distinct.length == ids.length)
    // shards within [0, 4)
    assert(p1.map(_.getLong(1)).forall(s => s >= 0 && s < 4))
  }
}
