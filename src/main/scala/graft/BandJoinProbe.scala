package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (r16, VERDICT #3): what does the LSH band-table
  * candidate self-join actually do at a scale where the band table
  * cannot broadcast? autoBroadcastJoinThreshold=-1 simulates the
  * 100 TB posture; the probe prints the final (AQE) plan and exchange
  * counts for the three staging variants so the optimization decision
  * is evidence, not guesswork:
  *   A) persist()ed band table, both sides projected from it (the
  *      minhashLsh / textDupClusters shape) — is the exchange
  *      reuse-shared?
  *   B) repartition(band, band_key) + persist — does the join go
  *      exchange-free off the cached partitioning?
  *   C) localCheckpoint()ed band table (the q139 shape) — does the
  *      ExistingRDD side still reuse?
  */
object BandJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, sfDir, "documents")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shArr = Dedup.shingleArrays(docs, "doc_id", "text", 3).persist(lvl)
    shArr.write.format("noop").mode("overwrite").save() // warm the cache
    def freshBands(): DataFrame =
      Dedup.lshBands(Dedup.minhashSignaturesFromArrays(shArr, 8), 2, 4)

    def candFrom(bandDf: DataFrame): DataFrame =
      bandDf.select(col("band"), col("band_key"), col("doc_id").as("id_a"))
        .join(bandDf.select(col("band"), col("band_key"),
          col("doc_id").as("id_b")), Seq("band", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()

    def run(tag: String, mkBands: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val cand = candFrom(mkBands) // staging job (if eager) is timed too
      val n = cand.collect().length // same QueryExecution -> final AQE plan
      val dt = (System.nanoTime() - t0) / 1e9
      val plan = cand.queryExecution.executedPlan.toString
      val nEx = "(?m)^.*\\bExchange hashpartitioning".r
        .findAllIn(plan).length
      val nReuse = "ReusedExchange".r.findAllIn(plan).length
      val nAqeRead = "AQEShuffleRead".r.findAllIn(plan).length
      println(f"PROBE $tag%-22s wall=$dt%6.2f s  pairs=$n%d exchanges=$nEx reused=$nReuse aqeRead=$nAqeRead")
      println(plan.linesIterator.take(45).mkString("\n"))
      println("-" * 70)
    }

    run("A-persist", freshBands().persist(lvl))
    run("B-repart-persist",
      freshBands().repartition(col("band"), col("band_key")).persist(lvl))
    run("C-localCheckpoint", freshBands().localCheckpoint(true))
    // second pass, caches warm from above runs are fresh per variant —
    // repeat to damp one-shot noise
    run("A2-persist", freshBands().persist(lvl))
    run("B2-repart-persist",
      freshBands().repartition(col("band"), col("band_key")).persist(lvl))
    run("C2-localCheckpoint", freshBands().localCheckpoint(true))
    spark.stop()
  }
}
