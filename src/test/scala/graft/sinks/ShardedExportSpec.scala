package graft.sinks

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardedExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exactly one file per shard, lossless, balanced, reproducible") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "source", "text")
    val n = 8
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    ShardedExport.write(docs, "doc_id", n, out)

    // one parquet file per shard directory
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == n)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }

    // lossless round trip
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty)

    // assignment matches the documented function (reproducible contract)
    val mismatch = back
      .withColumn("expect", pmod(hash(col("doc_id")), lit(n)))
      .filter(col("shard") =!= col("expect"))
    assert(mismatch.isEmpty)

    // near-equal sizes: no shard more than 2x the smallest at this SF
    val sizes = back.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.max <= 2 * sizes.min, sizes.mkString(","))
  }
}
