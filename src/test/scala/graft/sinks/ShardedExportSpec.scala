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

  // ---- resumable export (r14 VERDICT #5) -----------------------------

  private def diskManifest(out: String, keyCol: String) = {
    val back = spark.read.parquet(out)
    ExportManifest.manifest(back, col("shard"), col(keyCol),
        to_json(struct(back.columns.filter(_ != "shard").sorted
          .map(col).toIndexedSeq: _*)))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
  }

  test("resumable export: killed run resumes, identical manifests, idempotent") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "source", "text")
    val n = 8
    val out = java.nio.file.Files.createTempDirectory("shards-resume").toString

    // clean first run writes everything
    val r1 = ShardedExport.writeResumable(docs, "doc_id", n, out)
    assert(r1.written == (0 until n) && r1.skipped.isEmpty)
    val m1 = diskManifest(out, "doc_id")

    // a clean re-run is a metadata-only no-op: zero shards rewritten
    val r2 = ShardedExport.writeResumable(docs, "doc_id", n, out)
    assert(r2.written.isEmpty && r2.skipped == (0 until n))
    assert(diskManifest(out, "doc_id") == m1)

    // simulate a run killed between shard data and its marker commit
    // (marker absent) and a corrupt/stale delivery (marker mangled)
    val dead = new java.io.File(s"$out/shard=2/_SHARD_MANIFEST.json")
    assert(dead.exists()); dead.delete()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/shard=5/_SHARD_MANIFEST.json"),
      """{"n_rows":1,"n_chars":1,"content_fp":1}""".getBytes("UTF-8"))
    val r3 = ShardedExport.writeResumable(docs, "doc_id", n, out)
    assert(r3.written.sorted == Seq(2, 5), r3.toString)
    assert(r3.skipped.sorted == Seq(0, 1, 3, 4, 6, 7))
    // the resumed export lands the IDENTICAL manifest
    assert(diskManifest(out, "doc_id") == m1)

    // input change: only the affected shards rewrite
    val docs2 = docs.filter(col("doc_id") =!= 1L)
    val r4 = ShardedExport.writeResumable(docs2, "doc_id", n, out)
    val movedShard =
      docs.filter(col("doc_id") === 1L)
        .select(pmod(hash(col("doc_id")), lit(n))).head().getInt(0)
    assert(r4.written == Seq(movedShard), r4.toString)
    val m2 = diskManifest(out, "doc_id")
    assert(m2.filterNot(_._1 == movedShard) ==
      m1.filterNot(_._1 == movedShard))
    assert(m2(movedShard) != m1(movedShard))

    // verifyData tier: silent on-disk corruption is caught and healed
    val r5 = ShardedExport.writeResumable(docs2, "doc_id", n, out)
    assert(r5.written.isEmpty)
    val f = new java.io.File(s"$out/shard=3")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val victim = new java.io.File(s"$out/shard=1")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    victim.delete()
    // drop the Hadoop local-FS checksum sidecar too: the simulation
    // wants WRONG ROWS (silent rot), not a ChecksumException
    new java.io.File(victim.getParent, "." + victim.getName + ".crc").delete()
    java.nio.file.Files.copy(f.toPath, victim.toPath)
    val r6 = ShardedExport.writeResumable(docs2, "doc_id", n, out,
      verifyData = true)
    assert(r6.written == Seq(1), r6.toString)
    assert(diskManifest(out, "doc_id") == m2)
  }

  test("resumable export: shard emptied by input change is cleared") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("shards-empty").toString
    val keys = (1L to 64L).toDF("k")
    ShardedExport.writeResumable(keys, "k", 4, out)
    // drop every key of shard 0: its dir must end up with no data
    // files (dynamic overwrite alone would leave the stale ones)
    val shard0 = spark.read.parquet(out).filter(col("shard") === 0)
      .select("k").as[Long].collect().toSet
    assert(shard0.nonEmpty)
    val pruned = keys.filter(!col("k").isin(shard0.toSeq: _*))
    val r = ShardedExport.writeResumable(pruned, "k", 4, out)
    assert(r.written.contains(0))
    val files0 = new java.io.File(s"$out/shard=0")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files0.isEmpty)
    // and the marker commits the empty manifest so the NEXT run skips
    val r2 = ShardedExport.writeResumable(pruned, "k", 4, out)
    assert(!r2.written.contains(0))
  }
}
