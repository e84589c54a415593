package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (r16, VERDICT #1): where do q139_lsh_recall's seconds
  * go, and which staging variant is fastest at sf0.1? Phases of the
  * current shape are timed separately, then three whole-query variants
  * run back to back (same process = same window):
  *   cur  — r15 shape: shArr localCheckpoint + bands localCheckpoint
  *   per  — bands persist() instead of the eager checkpoint
  *   old  — r14 shape: exploded rows + distinct + groupBy sizes +
  *          explode/groupBy signatures (the pre-opt staging)
  */
object Q139Probe {
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
    Tables.load(spark, sfDir, "documents").write.format("noop")
      .mode("overwrite").save()

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    // ---- phase timing of the CURRENT shape --------------------------
    val docs = Tables.documentsWithEdges(spark, sfDir)
    var shArr: DataFrame = null
    t("shArr-cp") {
      shArr = graft.operators.Dedup
        .shingleArrays(docs, "doc_id", "text", 3).localCheckpoint(true)
    }
    var bands: DataFrame = null
    t("bands-cp") {
      bands = graft.operators.Dedup.lshBands(
        graft.operators.Dedup.minhashSignaturesFromArrays(shArr, 8), 2, 4)
        .localCheckpoint(true)
    }
    val sh = shArr.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val cnt = shArr.select(col("doc_id"),
      size(col("shingles")).cast("long").as("n_sh"))
    val inter = sh.select(col("doc_id").as("id_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    val exact = inter
      .join(cnt.select(col("doc_id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(cnt.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .filter(col("n_inter").cast("double")
        / (col("na") + col("nb") - col("n_inter")).cast("double") >= 0.5)
      .select(col("id_a"), col("id_b"))
    val cand = bands.select(col("band"), col("band_key"), col("doc_id").as("id_a"))
      .join(bands.select(col("band"), col("band_key"), col("doc_id").as("id_b")),
        Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    t("exact-count") { exact.write.format("noop").mode("overwrite").save() }
    t("cand-count") { cand.write.format("noop").mode("overwrite").save() }
    val ne = exact.agg(count(lit(1)).as("n_exact"))
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    val nh = exact.join(cand, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_caught"))
    t("final-crossjoin") {
      ne.crossJoin(nc).crossJoin(nh).write.format("noop")
        .mode("overwrite").save()
    }

    // ---- whole-query variants (the bench-timed shape) ---------------
    val fn = SparkEntry.queries("q139_lsh_recall")
    (1 to 2).foreach { i =>
      scrub()
      t(s"full-cur-$i") {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }

    def variant(stageBands: DataFrame => DataFrame,
                stageShArr: DataFrame => DataFrame): DataFrame = {
      val d2 = Tables.documentsWithEdges(spark, sfDir)
      val shArr2 = stageShArr(graft.operators.Dedup
        .shingleArrays(d2, "doc_id", "text", 3))
      val sh2 = shArr2.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      val cnt2 = shArr2.select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_sh"))
      val inter2 = sh2.select(col("doc_id").as("id_a"), col("shingle"))
        .join(sh2.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      val exact2 = inter2
        .join(cnt2.select(col("doc_id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
        .join(cnt2.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
        .filter(col("n_inter").cast("double")
          / (col("na") + col("nb") - col("n_inter")).cast("double") >= 0.5)
        .select(col("id_a"), col("id_b"))
      val bands2 = stageBands(graft.operators.Dedup.lshBands(
        graft.operators.Dedup.minhashSignaturesFromArrays(shArr2, 8), 2, 4))
      val cand2 = bands2.select(col("band"), col("band_key"), col("doc_id").as("id_a"))
        .join(bands2.select(col("band"), col("band_key"), col("doc_id").as("id_b")),
          Seq("band", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val ne2 = exact2.agg(count(lit(1)).as("n_exact"))
      val nc2 = cand2.agg(count(lit(1)).as("n_candidates"))
      val nh2 = exact2.join(cand2, Seq("id_a", "id_b"))
        .agg(count(lit(1)).as("n_caught"))
      ne2.crossJoin(nc2).crossJoin(nh2)
        .select(col("n_exact"), col("n_candidates"), col("n_caught"),
          expr("n_caught * 1000000L div n_exact").as("recall_ppm"),
          expr("n_caught * 1000000L div n_candidates").as("precision_ppm"))
    }
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    (1 to 2).foreach { i =>
      scrub()
      t(s"full-perBands-$i") {
        variant(_.persist(lvl), _.localCheckpoint(true))
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 2).foreach { i =>
      scrub()
      t(s"full-perBoth-$i") {
        variant(_.persist(lvl), _.persist(lvl))
          .write.format("noop").mode("overwrite").save()
      }
    }

    // old r14 shape: exploded rows + distinct + groupBy sizes +
    // explode/groupBy signature aggregate
    def oldShape(): DataFrame = {
      val d2 = Tables.documentsWithEdges(spark, sfDir)
      val sh2 = graft.operators.Dedup.shingleRows(d2, "doc_id", "text", 3)
        .distinct().localCheckpoint(true)
      val cnt2 = sh2.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val inter2 = sh2.select(col("doc_id").as("id_a"), col("shingle"))
        .join(sh2.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      val exact2 = inter2
        .join(cnt2.select(col("doc_id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
        .join(cnt2.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
        .filter(col("n_inter").cast("double")
          / (col("na") + col("nb") - col("n_inter")).cast("double") >= 0.5)
        .select(col("id_a"), col("id_b"))
      val bands2 = graft.operators.Dedup.lshBands(
        graft.operators.Dedup.minhashSignatures(sh2, 8), 2, 4)
        .localCheckpoint(true)
      val cand2 = bands2.select(col("band"), col("band_key"), col("doc_id").as("id_a"))
        .join(bands2.select(col("band"), col("band_key"), col("doc_id").as("id_b")),
          Seq("band", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val ne2 = exact2.agg(count(lit(1)).as("n_exact"))
      val nc2 = cand2.agg(count(lit(1)).as("n_candidates"))
      val nh2 = exact2.join(cand2, Seq("id_a", "id_b"))
        .agg(count(lit(1)).as("n_caught"))
      ne2.crossJoin(nc2).crossJoin(nh2)
        .select(col("n_exact"), col("n_candidates"), col("n_caught"),
          expr("n_caught * 1000000L div n_exact").as("recall_ppm"),
          expr("n_caught * 1000000L div n_candidates").as("precision_ppm"))
    }
    (1 to 2).foreach { i =>
      scrub()
      t(s"full-old-$i") {
        oldShape().write.format("noop").mode("overwrite").save()
      }
    }
    // value pin across variants
    val a = fn(spark, sfDir).collect().toSeq
    val b = variant(_.persist(lvl), _.persist(lvl)).collect().toSeq
    val c = oldShape().collect().toSeq
    println(s"VALUES cur=$a per=$b old=$c equal=${a == b && b == c}")
    spark.stop()
  }
}
