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

/** Dev profiler: phase timing of the q81 PageRank chain (added while
  * chasing the sf10 slope — times the edge build, the setup
  * materialization, and each round separately). */
object BenchProfilePr {
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
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val orders = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    // NOTE: localCheckpoint is EAGER — build it inside the timed
    // block or the work lands between phase prints, unattributed
    // (the first sf10 profile made the rounds look sub-second)
    var cs: org.apache.spark.sql.DataFrame = null
    t("cs-checkpoint") {
      cs = orders.join(li, orders("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("src"),
                (col("l_suppkey") + 10000000L).as("dst"))
        .distinct()
        .localCheckpoint()
      cs.count()
    }
    // the CURRENT operator shape (node-side outdegree; the original
    // edge-annotated shape this replaced profiled e-distinct 245 s,
    // nodes-union-distinct 68 s, eod join+persist 82 s, rounds <1 s
    // at sf10's 117 M edges — all setup, no round cost)
    val e = cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = e.select(col("src").as("id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("nodes") { nodes.count() }
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("outdeg") { outdeg.count() }
    var base: org.apache.spark.sql.DataFrame = null
    t("base") {
      base = nodes.crossJoin(broadcast(nRow))
        .select(col("id"), ((lit(1.0) - lit(0.85)) / col("n")).as("tele"),
          (lit(1.0) / col("n")).as("rank0"))
        .localCheckpoint()
      base.count()
    }
    var ranks = base.select(col("id"), col("rank0").as("rank"))
    for (i <- 1 to 2) {
      t(s"round-$i") {
        val rd = ranks
          .join(outdeg.withColumnRenamed("src", "id"), Seq("id"))
          .select(col("id").as("src"),
            (col("rank") / col("outdeg").cast("double")).as("w"))
        val contrib = e.join(rd, Seq("src"))
          .select(col("dst").as("id"),
            floor(col("w") * 1e12).cast("long").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("s"))
        ranks = base.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (col("tele") +
              lit(0.85) * (coalesce(col("s"), lit(0L)).cast("double") / 1e12))
              .as("rank"))
          .localCheckpoint()
        ranks.count()
      }
    }
    spark.stop()
  }
}
