package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated name substrings — run (and
    // dump oracles for) only matching queries, for fast local iteration
    val keep: String => Boolean =
      if (args.length > 2) { val pats = args(2).split(',').toSeq
                             n => pats.exists(n.contains) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // deterministic row order matching the oracles' ORDER BY ALL
        // NULLS FIRST (left-to-right over the output columns; Spark's
        // default asc = nulls first, same as the oracle's modifier)
        df.orderBy(df.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must FAIL the compare: stale parquet from a
        // previous run into the same outDir would otherwise be checked
        // against the still-emitted oracle and mask the regression.
        // Cleanup itself must not abort the loop (remaining queries
        // still run) and must scream if the stale output survives.
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        try {
          val stale = new java.io.File(s"$outDir/$name")
          rm(stale)
          if (stale.exists())
            System.err.println(s"[verify] WARNING: stale output for $name " +
              "could not be removed — compare may mask this failure")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] cleanup for $name failed: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
