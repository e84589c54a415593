package graft.gdl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.security.MessageDigest
import java.time.Instant
import org.apache.spark.sql.SparkSession
import scala.util.Random

/** Runnable end-to-end demo of the GDL engine: create a dataset, import
  * a STAC graph (catalog → collection → item + 2 assets) from a staging
  * dir, print the terminal import status — the same flow as the
  * reference's flagship deployed test
  * (/root/reference/tests/test_processing_stack.py:81-262), locally.
  *
  * Usage: sbt "runMain graft.gdl.Demo [workDir]"
  */
object Demo {
  private def mh256(b: Array[Byte]): String =
    "1220" + MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(Files.createTempDirectory("gdl-demo").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("gdl-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val asset1 = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val asset2 = Array.tabulate[Byte](64)(i => (i * 5 + 1).toByte)
    val docs = Map(
      "s3://staging/demo/catalog.json" ->
        """{"type":"Catalog","stac_version":"1.0.0-rc.3","id":"cat",
            "description":"demo catalog",
            "links":[{"href":"collection.json","rel":"child"},
                     {"href":"catalog.json","rel":"root"}]}""".getBytes(UTF_8),
      "s3://staging/demo/collection.json" ->
        s"""{"type":"Collection","stac_version":"1.0.0-rc.3","id":"col",
             "description":"demo collection","license":"MIT",
             "extent":{"spatial":{"bbox":[[-180,-90,180,90]]},
                       "temporal":{"interval":[["2000-01-01T00:00:00Z",null]]}},
             "assets":{"a2":{"href":"asset2.bin","file:checksum":"${mh256(asset2)}"}},
             "links":[{"href":"item.json","rel":"child"}]}""".getBytes(UTF_8),
      "s3://staging/demo/item.json" ->
        s"""{"type":"Feature","stac_version":"1.0.0-rc.3","id":"item",
             "geometry":null,"properties":{"datetime":"2000-01-01T00:00:00Z"},
             "assets":{"a1":{"href":"asset1.bin","file:checksum":"${mh256(asset1)}"}},
             "links":[]}""".getBytes(UTF_8),
      "s3://staging/demo/asset1.bin" -> asset1,
      "s3://staging/demo/asset2.bin" -> asset2)

    val store = new TableStore(spark, s"$work/tables")
    val pipeline = new ImportPipeline(spark, store,
      new InMemoryUrlReader(docs), s"$work/storage", new Random())

    val now = Instant.now()
    val dataset = pipeline.datasets.create("Demo_Dataset", now) match {
      case Right(d) => d
      case Left(err) => sys.error(err)
    }
    println(s"created dataset: id=${dataset.id} title=${dataset.title}")

    val execId = pipeline.run(dataset.id, "s3://staging/demo/catalog.json",
      now.plusSeconds(1)) match {
      case Right(e) => e
      case Left(err) => sys.error(err)
    }
    val report = new ImportStatus(spark, store).get(execId) match {
      case Right(r) => r
      case Left(err) => sys.error(err)
    }
    println(s"""import status:
       |  step function:   ${report.stepFunction}
       |  validation:      ${report.validation.status} errors=${report.validation.errors}
       |  metadata upload: ${report.metadataUpload.status}
       |  asset upload:    ${report.assetUpload.status}
       |  storage:         $work/storage/${dataset.title}-${dataset.id}/""".stripMargin)
    spark.stop()
  }
}
