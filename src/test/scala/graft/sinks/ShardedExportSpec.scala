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

  test("every shard directory exists even when some shards are empty") {
    import spark.implicits._
    // 3 distinct keys into 16 shards: most shards get zero rows, but a
    // shard->worker mapping must still find every shard=s/ path
    val out = java.nio.file.Files.createTempDirectory("shards-sparse").toString
    ShardedExport.write(Seq(1L, 2L, 3L).toDF("k"), "k", 16, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.map(_.getName).toSet == (0 until 16).map(s => s"shard=$s").toSet)
  }
}
