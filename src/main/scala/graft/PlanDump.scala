package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write each named query's full `explain("formatted")` text
  * to `<outDir>/<query>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/ (the judge checks plan
  * claims against these files, so they must be the real formatted
  * explain, not excerpts).
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <query>[,<query>...]
  * AQE stays OFF here for the same reason as [[PlanAudit]]: the
  * pre-execution adaptive plan hides codegen and final join strategy;
  * with AQE off the static plan shows the shape the optimizer chose.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names =
      if (args.length > 2 && args(2) != "ALL") args(2).split(',').toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
            println(s"[plandump] wrote $outDir/${name}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
