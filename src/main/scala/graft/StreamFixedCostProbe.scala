package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (r16, VERDICT #5): how much of the streaming queries'
  * per-cell wall is one-time (classload/codegen of the streaming
  * machinery — amortizable by an untimed warm-up) vs genuinely
  * per-query (fixture write, stream start, two micro-batch plans +
  * state store)? Four consecutive runs per query with the bench's own
  * scrub between: run1 >> run2≈run3≈run4 means session-scoped warm-up;
  * flat runs mean the cost is the per-query machinery itself. */
object StreamFixedCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n)
      .write.format("noop").mode("overwrite").save())
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    Seq("q203_frontier_domain_stream", "q236_stream_geofence",
        "q129_incremental_embedding_clusters").foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 4).foreach { i =>
        scrub()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PROF $name%-38s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
