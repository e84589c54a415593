package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming geofence occupancy ≡ its batch twin on bounded input,
  * with append-mode exactly-once window emission under the
  * watermark. */
class GeoStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream equals batch; windows emit once, late-proof by sentinel") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2")
    import s.implicits._
    val base = 1735689600L
    // two square fences; points hit fence 1 in window 0, both in 1
    val polys = Seq(
      (1L, Seq(0L, 20L, 20L, 0L), Seq(0L, 0L, 20L, 20L)),
      (2L, Seq(100L, 140L, 140L, 100L), Seq(100L, 100L, 140L, 140L)))
      .toDF("poly_id", "xs", "ys")
    val pts = Seq(
      (10L, 5L, 5L, 0L), (11L, 6L, 7L, 10L), // fence 1, window 0
      (12L, 5L, 5L, 35L), // fence 1, window 1
      (13L, 120L, 120L, 40L), (14L, 130L, 110L, 50L), // fence 2, window 1
      (15L, 60L, 60L, 5L)) // no fence
      .toDF("p_id", "px", "py", "off")
      .select(col("p_id"), col("px"), col("py"),
        timestamp_seconds(lit(base) + col("off")).as("ts"))
    val expected = GeoStream.geofenceCountsBatch(pts, "ts", polys,
        cell = 32L, windowDur = "30 seconds")
      .select(col("window_start"), col("poly_id"), col("n_hits"))
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    assert(expected == Set(
      (new java.sql.Timestamp(base * 1000L), 1L, 2L),
      (new java.sql.Timestamp((base + 30) * 1000L), 1L, 1L),
      (new java.sql.Timestamp((base + 30) * 1000L), 2L, 2L)))
    // stream the same points through a file source + sentinels
    val tmp = java.nio.file.Files.createTempDirectory("geostream").toString
    def sentinel(j: Int) =
      Seq((-1L, 99999L, 99999L,
        new java.sql.Timestamp((base + 3600 + j) * 1000L)))
        .toDF("p_id", "px", "py", "ts")
    pts.unionByName(sentinel(1)).write.mode("append").parquet(tmp)
    val stream = s.readStream
      .schema("p_id BIGINT, px BIGINT, py BIGINT, ts TIMESTAMP")
      .parquet(tmp)
    val q = GeoStream.geofenceCounts(stream, "ts", polys, cell = 32L,
        windowDur = "30 seconds", watermark = "30 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("geostream_t").start()
    try {
      q.processAllAvailable()
      sentinel(2).write.mode("append").parquet(tmp)
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("geostream_t")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    assert(got == expected)
  }
}
