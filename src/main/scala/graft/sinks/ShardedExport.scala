package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export — the sink side of a curation pipeline: the
  * selected corpus written as `nShards` parquet shard directories of
  * near-equal row count, deterministically, so a training job can map
  * shard → worker and a re-run reproduces the same shard contents.
  *
  * Shard assignment is `pmod(hash(key), n)` (murmur3 with Spark's fixed
  * seed — stable across runs and partitionings, unlike any
  * row-position-based scheme). Every row of shard s lives in exactly one
  * task after `repartition(n, shard)`, so each `shard=s/` directory gets
  * exactly ONE data file; `sortWithinPartitions(shard, key)` fixes the
  * row order inside it. Collisions (two shard values hashing to one
  * task) cost parallelism, not correctness.
  *
  * Determinism is at the CONTENT level: a re-run reproduces the same
  * rows in the same order per shard, but parquet part-file names embed
  * job/task UUIDs, so the files are not byte-identical across runs. A
  * shard value that receives zero rows (possible when nShards
  * approaches the distinct-key count) would naturally produce no
  * `shard=s/` directory at all; [[write]] creates an empty directory
  * for every such shard so a shard → worker mapping never hits a
  * nonexistent path.
  *
  * Scale: one shuffle sized by the output, a sort within each shard,
  * and parquet's directory-partition pruning on `shard=` for readers
  * that want a subset.
  */
object ShardedExport {

  def write(df: DataFrame, keyCol: String, nShards: Int, outDir: String): Unit = {
    df.withColumn("shard", pmod(hash(col(keyCol)), lit(nShards)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
    // guarantee every shard path exists, even for empty shards
    val out = new Path(outDir)
    val fs = out.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    (0 until nShards).foreach(s => fs.mkdirs(new Path(out, s"shard=$s")))
  }

  /** What a [[writeResumable]] run did per shard. */
  case class ResumeReport(written: Seq[Int], skipped: Seq[Int])

  private val MarkerName = "_SHARD_MANIFEST.json"

  /** Idempotent, RESTARTABLE shard export (r14 VERDICT #5 — the
    * TableStore pointer-commit discipline applied to the export
    * writer): each completed shard carries a marker file holding its
    * [[ExportManifest]] row (n_rows, n_chars, content_fp over
    * `to_json` of the full row), written ONLY after the shard's data
    * landed — the marker IS the commit. A re-run recomputes the
    * expected manifest from the input, then per shard:
    *
    *  - no marker (fresh dir, or a run died between data and marker)
    *    → rewrite;
    *  - marker ≠ expected (the input changed, or a stale/corrupt
    *    delivery) → rewrite;
    *  - marker = expected → SKIP: the shard is already the shard this
    *    input produces. With `verifyData = true` the skip additionally
    *    re-reads the shard's parquet and checks the ON-DISK manifest
    *    against the marker (paranoia tier for media that rots).
    *
    * Only the needed shards are rewritten (dynamic partition
    * overwrite — untouched `shard=` dirs keep their files and
    * markers), so a killed 10 000-shard export resumes at the cost of
    * the missing shards, and a clean re-run is a metadata-only no-op.
    * The expected manifest is one row per shard (driver-collected —
    * shard-count-sized metadata, the same envelope as TableStore's
    * pointer state, never row-sized).
    *
    * Restartability contract: markers commit shards, not the export —
    * a reader needing all-or-nothing still gates on the final
    * [[ResumeReport]] (or an outer TableStore pointer commit), not on
    * directory presence. */
  def writeResumable(df: DataFrame, keyCol: String, nShards: Int,
                     outDir: String,
                     verifyData: Boolean = false): ResumeReport = {
    val spark = df.sparkSession
    val dataCols = df.columns.toSeq
    def withShard(d: DataFrame): DataFrame =
      d.withColumn("shard", pmod(hash(col(keyCol)), lit(nShards)))
    def manifestOf(d: DataFrame): Map[Int, (Long, Long, Long)] =
      ExportManifest.manifest(d, col("shard"), col(keyCol),
          to_json(struct(dataCols.map(col): _*)))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap

    val sharded = withShard(df)
    val expected = manifestOf(sharded)
    val out = new Path(outDir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def markerPath(s: Int) = new Path(out, s"shard=$s/$MarkerName")
    def readMarker(s: Int): Option[(Long, Long, Long)] =
      if (!fs.exists(markerPath(s))) None
      else try {
        val in = fs.open(markerPath(s))
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  finally in.close()
        // fixed three-field layout written by writeMarker below
        val m = """\{"n_rows":(-?\d+),"n_chars":(-?\d+),"content_fp":(-?\d+)\}""".r
        txt.trim match {
          case m(a, b, c) => Some((a.toLong, b.toLong, c.toLong))
          case _ => None // corrupt marker = no marker
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    def writeMarker(s: Int, v: (Long, Long, Long)): Unit = {
      val o = fs.create(markerPath(s), true)
      try o.write(
        s"""{"n_rows":${v._1},"n_chars":${v._2},"content_fp":${v._3}}"""
          .getBytes("UTF-8"))
      finally o.close()
    }

    val empty = (0L, 0L, 0L)
    val needed = (0 until nShards).filter { s =>
      val want = expected.getOrElse(s, empty)
      readMarker(s) match {
        case Some(got) if got == want =>
          verifyData && want != empty && {
            // paranoia tier: the marker says done — does the disk agree?
            val disk = manifestOf(
              spark.read.parquet(s"$outDir/shard=$s")
                .withColumn("shard", lit(s)))
            disk.getOrElse(s, empty) != want
          }
        case _ => true
      }
    }

    if (needed.nonEmpty) {
      // dynamic overwrite only replaces shard dirs PRESENT in the new
      // data: a needed shard that is now EMPTY must have its stale
      // files cleared by hand before its marker commits
      needed.filter(s => expected.getOrElse(s, empty) == empty)
        .foreach { s =>
          fs.delete(new Path(out, s"shard=$s"), true)
          fs.mkdirs(new Path(out, s"shard=$s"))
        }
      val nonEmptyNeeded =
        needed.filter(s => expected.getOrElse(s, empty) != empty)
      if (nonEmptyNeeded.nonEmpty)
        sharded.filter(col("shard")
            .isin(nonEmptyNeeded.map(_.toLong): _*))
          .repartition(nonEmptyNeeded.size, col("shard"))
          .sortWithinPartitions(col("shard"), col(keyCol))
          .write.partitionBy("shard")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(outDir)
      needed.foreach(s =>
        writeMarker(s, expected.getOrElse(s, empty))) // the commit point
    }
    ResumeReport(needed, (0 until nShards).filterNot(needed.contains))
  }
}
