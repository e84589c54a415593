package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L)((z, i) =>
      z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))

  test("expression matches the scala reference over a grid") {
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder2.zorder(col("x"), col("y"), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == reference(x, y, 4)) }
    // interleave is a bijection on the grid
    assert(got.map(_._3).distinct.length == rows.length)
  }

  test("registered SQL function agrees with the column API") {
    graft.GraftExtensions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT z_order(5L, 9L), z_order(5L, 9L, 16)").collect().head
    assert(viaSql.getLong(0) == reference(5, 9, 16))
    assert(viaSql.getLong(1) == reference(5, 9, 16))
  }

  test("z-sorted layout clusters both dimensions (bounded per-chunk extent)") {
    // 32x32 grid z-sorted then cut into 16 chunks of 64: each chunk is a
    // 2^k-aligned quad, so per-chunk x/y extents stay at 8 = sqrt(64),
    // vs 32 (full width) for a 1-D x-sort whose chunks span all of y
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder2.zorder(col("x"), col("y"), 5).as("z"))
      .orderBy(col("z")).as[(Long, Long, Long)].collect()
    grid.grouped(64).foreach { chunk =>
      val xs = chunk.map(_._1)
      val ys = chunk.map(_._2)
      assert(xs.max - xs.min <= 7 && ys.max - ys.min <= 7,
        s"chunk extent ${xs.max - xs.min} x ${ys.max - ys.min}")
    }
  }
}
