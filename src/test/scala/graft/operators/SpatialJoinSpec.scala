package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class SpatialJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pts(xs: Seq[(Long, Long, Long)]): DataFrame =
    xs.toDF("id", "px", "py")
  private def qs(xs: Seq[(Long, Long, Long)]): DataFrame =
    xs.toDF("query_id", "qx", "qy")

  private def sorted(df: DataFrame) =
    df.as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))

  test("far pairs saturate the packing instead of failing the job") {
    // corpus span >> 23k: the brute path sees pairs with d2 >= 2^30,
    // which previously tripped a per-candidate assert even though the
    // true nearest neighbors fit the packing comfortably
    val ps = Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 4L),
      (4L, 50000L, 50000L))
    val got = sorted(SpatialJoin.knn(pts(ps), qs(Seq((10L, 1L, 1L))), k = 3))
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L))
    // ...but a saturated pair WINNING a slot still fails loudly: k=4
    // forces the far point into the top-k with a clamped distance
    val e = intercept[Exception](
      SpatialJoin.knn(pts(ps), qs(Seq((10L, 1L, 1L))), k = 4).collect())
    assert(e.getMessage.contains("saturated") ||
      e.getCause != null && e.getCause.getMessage.contains("saturated"))
  }

  test("withinDist equals the brute-force θ-join, boundary inclusive") {
    val rnd = new Random(1411)
    val ps = (1L to 300L).map(i =>
      (i, rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
    val queries = (1L to 40L).map(i =>
      (i, rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
    val r = 25L
    val got = SpatialJoin.withinDist(pts(ps), qs(queries), r)
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (qid, qx, qy) <- queries
      (id, px, py) <- ps
      d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
      if d2 <= r * r
    } yield (qid, id, d2)).toSet
    assert(got == brute && got.nonEmpty)
    // a pair at EXACTLY r on an axis is included (closed ball) and a
    // pair one past it is not — also pins the 3x3 probe completeness
    // at the cell boundary
    val exact = SpatialJoin.withinDist(
      pts(Seq((1L, 25L, 0L), (2L, 26L, 0L))), qs(Seq((9L, 0L, 0L))), r)
      .as[(Long, Long, Long)].collect().toSet
    assert(exact == Set((9L, 1L, 625L)))
    // negative coordinates: floor cells keep the probe complete
    val neg = SpatialJoin.withinDist(
      pts(Seq((1L, -3L, -4L))), qs(Seq((9L, 0L, 0L))), 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(neg == Set((9L, 1L, 25L)))
  }

  test("grid plan equals brute force on a dense random point set") {
    val rnd = new Random(7)
    val ps = (1L to 400L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val queries = (1L to 30L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val brute = SpatialJoin.knn(pts(ps), qs(queries), k = 3)
    val grid = SpatialJoin.knnGrid(pts(ps), qs(queries), k = 3, cell = 50L)
    assert(sorted(grid).toSeq == sorted(brute).toSeq)
  }

  test("sparse data forces the brute rescue path and stays exact") {
    // every point is far outside the query's 3x3 cell block, so the
    // probe yields zero candidates and ONLY the rescue union answers
    val ps = Seq((1L, 900L, 900L), (2L, 880L, 910L), (3L, 870L, 860L),
      (4L, 0L, 999L))
    val queries = Seq((10L, 5L, 5L))
    val got = sorted(SpatialJoin.knnGrid(pts(ps), qs(queries), k = 3, cell = 50L))
    val want = sorted(SpatialJoin.knn(pts(ps), qs(queries), k = 3))
    assert(got.toSeq == want.toSeq)
    assert(got.map(_._3).toSeq == Seq(4L, 3L, 2L)) // nearest first
  }

  test("negative coordinates: grid equals brute force (floor cells, not trunc)") {
    val rnd = new Random(13)
    val ps = (1L to 300L).map(i =>
      (i, rnd.nextInt(2000).toLong - 1000L, rnd.nextInt(2000).toLong - 1000L))
    val queries = (1L to 20L).map(i =>
      (i, rnd.nextInt(2000).toLong - 1000L, rnd.nextInt(2000).toLong - 1000L))
    // d2 can reach 2000^2*2 = 8e6 < 2^30: packing stays in range even
    // though coordinates are signed
    val brute = SpatialJoin.knn(pts(ps), qs(queries), k = 3)
    val grid = SpatialJoin.knnGrid(pts(ps), qs(queries), k = 3, cell = 50L)
    assert(sorted(grid).toSeq == sorted(brute).toSeq)
  }

  test("int-typed coordinate columns rank identically to long-typed") {
    val ps = Seq((1, 10, 10), (2, 20, 20), (3, 500, 500), (4, 11, 9))
      .toDF("id", "px", "py")
    val queries = Seq((7, 10, 10)).toDF("query_id", "qx", "qy")
    val got = SpatialJoin.knn(ps, queries, k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._3).toSeq == Seq(1L, 4L, 2L))
    assert(got.map(_._4).toSeq == Seq(0L, 2L, 200L))
  }

  test("coordinates past the packing envelope fail loudly, never mis-rank") {
    val ps = Seq((1L, 0L, 0L), (2L, 60000L, 60000L)).toDF("id", "px", "py")
    val queries = Seq((7L, 0L, 0L)).toDF("query_id", "qx", "qy")
    val e = intercept[Exception](
      SpatialJoin.knn(ps, queries, k = 2).collect())
    assert(e.getMessage != null)
  }

  test("guarantee boundary: kth candidate exactly at (cell+1)^2 is not trusted") {
    // query at a cell corner; an in-probe point at d2 == (cell+1)^2 ties
    // an out-of-probe point at the same d2 with a SMALLER id — only the
    // rescue path ranks them correctly
    val cell = 50L
    // query at (102, 102): cell (2,2); probe covers cells 1..3 → coords 50..199
    // in-probe candidate at (153, 102): d2 = 51^2 = 2601 = (cell+1)^2, id 9
    // out-of-probe point at (102, 51): wait 51 is cell 1 → in probe. Use
    // x-axis: (102+51, 102) in probe; out point must differ ≥ 51 on an
    // axis AND sit in a cell outside 1..3 → coord ≤ 49 or ≥ 200.
    // (102, 49): cell y=0, d2 = 53^2 too big. Make query near the edge:
    // query (150, 150) cell (3,3), probe cells 2..4 → coords 100..249.
    // out point (99, 150): cell x=1 (outside), d2 = 51^2 = 2601, id 1.
    // in points: (201, 150) d2=2601 id 5; plus two close ones.
    val ps = Seq(
      (5L, 201L, 150L), // in-probe, d2 = 2601
      (1L, 99L, 150L),  // OUT of probe, d2 = 2601, smaller id — must win tie
      (6L, 151L, 150L), // d2 = 1
      (7L, 150L, 152L)) // d2 = 4
    val queries = Seq((20L, 150L, 150L))
    val got = sorted(SpatialJoin.knnGrid(pts(ps), qs(queries), k = 3, cell = cell))
    assert(got.map(r => (r._3, r._4)).toSeq ==
      Seq((6L, 1L), (7L, 4L), (1L, 2601L)))
  }
}
