package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage-by-stage timing of the MinHash-LSH pipeline. */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingles") { sh.count() }
    val sig = Dedup.minhashSignatures(sh, 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("signatures") { sig.count() }
    val bandDf = Dedup.lshBands(sig, 2, 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("bands") { bandDf.count() }
    val a = bandDf.select(col("band"), col("band_key"), col("doc_id").as("id_a"))
    val b = bandDf.select(col("band"), col("band_key"), col("doc_id").as("id_b"))
    val cand = a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("candidates") { cand.count() }
    t("verify") { Dedup.verifyJaccard(cand, sh, 0.5).count() }
    t("full-q24") {
      Dedup.minhashLsh(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
