package graft

import graft.operators.{HtmlExtract, TextNormalize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r16, VERDICT #7): q154_ingest_report is the heaviest
  * non-streaming untouched cell — which regex stage dominates? The
  * chain is timed cumulatively: page build → dropNonContent+split
  * (block segmentation) → anchor extract → block normalize →
  * stripMarkup (the naive-strip length) → clean-token count → the full
  * query. Every stage is a codegen'd builtin; if ONE regex dominates,
  * the q228/TrigramBucketCounts native-pass lesson applies. */
object Q154Probe {
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
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROF $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val docs = Tables.documentsWithEdges(spark, sfDir)
    val dirty = docs.select(col("doc_id"),
      concat(lit(graft.queries.NormalizeOps.DirtyPrefix), col("text")).as("text"))
    val pages = HtmlExtract.syntheticHtml(dirty, "doc_id", "text")

    t("page-build")(pages)
    val frag = pages.select(col("doc_id"),
      posexplode(split(HtmlExtract.dropNonContent(col("html")),
        HtmlExtract.BlockSplitRe)).as(Seq("block_idx", "_frag")))
    t("dropNC+split")(frag)
    t("+anchor-extract")(frag.withColumn("_link_txt", concat_ws(" ",
      regexp_extract_all(col("_frag"), lit(HtmlExtract.AnchorRe), lit(1)))))
    t("+block-normalize")(frag
      .withColumn("block_text", trim(regexp_replace(
        HtmlExtract.decodeEntities(
          regexp_replace(col("_frag"), HtmlExtract.TagRe, " ")),
        "\\s+", " "))))
    t("blocks-full")(HtmlExtract.blocks(pages, "doc_id", "html"))
    t("stripMarkup-alone")(pages.select(col("doc_id"),
      length(HtmlExtract.stripMarkup(col("html"))).as("sc")))
    val main = HtmlExtract.extractMain(pages, "doc_id", "html")
    t("extractMain")(main)
    t("+cleanTokens")(main.select(col("doc_id"),
      graft.functions.TextFunctions
        .tokenCount(TextNormalize.cleanText(col("main_text")))
        .as("n_tokens_clean")))
    (1 to 2).foreach { i =>
      t(s"full-q154-$i")(
        SparkEntry.queries("q154_ingest_report")(spark, sfDir))
    }
    spark.stop()
  }
}
