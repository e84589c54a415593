package graft.gdl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table store with atomic, generation-versioned commits —
  * the engine's replacement for the reference's three DynamoDB tables
  * (infrastructure/storage_stack.py:62-95) in an offline build without a
  * table format like Delta/Iceberg.
  *
  * Layout per table: `root/<table>/g<seq>-<full|delta>/part-*.parquet`.
  * Readers union the newest `full` generation with every later `delta`.
  * A commit writes to a `_tmp-` dir first and renames it into place —
  * rename is atomic on HDFS/local fs, which gives single-writer
  * atomicity (the reference's count-then-insert title check is likewise
  * unserialized, backend/datasets/create.py:32-39).
  *
  * Scale: appends (the hot path — validation/asset rows) are pure file
  * additions, no read-modify-write; only the small catalog table pays
  * the full-rewrite `overwrite` path. Readers prune by listing, not by
  * reading a manifest table. At 100 TB the per-table dir becomes a
  * partitioned layout (`dataset_id=` subdirs) with the same commit
  * protocol per partition.
  */
class TableStore(spark: SparkSession, root: String) {

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(table: String) = new Path(root, table)

  private def generations(table: String): Seq[(Long, String, Path)] = {
    val dir = tableDir(table)
    val f = fs(dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("g"))
      .flatMap { s =>
        s.getPath.getName.stripPrefix("g").split("-", 2) match {
          case Array(seq, kind) if seq.forall(_.isDigit) =>
            Some((seq.toLong, kind, s.getPath))
          case _ => None
        }
      }
      .sortBy(_._1)
  }

  /** Current table contents, or None if never written. */
  def read(table: String): Option[DataFrame] = {
    val gens = generations(table)
    if (gens.isEmpty) None
    else {
      val lastFull = gens.lastIndexWhere(_._2 == "full")
      val live = if (lastFull >= 0) gens.drop(lastFull) else gens
      Some(live.map(g => spark.read.parquet(g._3.toString)).reduce(_ unionByName _))
    }
  }

  def isEmptyTable(table: String): Boolean = read(table).forall(_.isEmpty)

  /** Append rows as a new delta generation (no read-modify-write).
    * `partitionBy` lays the generation out as `col=value/` subdirs so
    * reads with equality predicates on those columns prune whole
    * directories — the 100 TB layout for processing_assets /
    * validation_results is `partitionBy("dataset_id")` (SURVEY §7.4 #7). */
  def append(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
    commit(table, df, "delta", partitionBy)

  /** Replace table contents (new full generation supersedes the past). */
  def overwrite(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
    commit(table, df, "full", partitionBy)

  /** Compaction: fold the current generations into one full generation
    * (same contents, one pass) — run periodically so reads stop paying
    * per-delta file listings; superseded generations are GC'd. */
  def compact(table: String, partitionBy: Seq[String] = Nil): Unit =
    read(table).foreach(df => overwrite(table, df, partitionBy))

  private def commit(table: String, df: DataFrame, kind: String,
                     partitionBy: Seq[String] = Nil): Unit = {
    val dir = tableDir(table)
    val f = fs(dir)
    f.mkdirs(dir)
    // tmp dir is writer-unique (a shared name would let two concurrent
    // writers clobber each other's files mid-write); the generation slot
    // is claimed by the atomic rename, retried under a fresh number if
    // another writer took it first — optimistic concurrency, like any
    // log-structured table format's commit protocol
    val tmp = new Path(dir, s"_tmp-${java.util.UUID.randomUUID().toString}")
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(tmp.toString)
    var attempts = 0
    var committed = -1L
    while (committed < 0) {
      attempts += 1
      val next = generations(table).lastOption.map(_._1 + 1).getOrElse(0L)
      val dest = new Path(dir, f"g$next%07d-$kind")
      if (f.rename(tmp, dest)) committed = next
      else if (attempts >= 20) {
        f.delete(tmp, true)
        throw new IllegalStateException(s"atomic commit failed after $attempts tries: $dest")
      }
    }
    if (kind == "full") // GC superseded generations
      generations(table).filter(_._1 < committed).foreach(g => f.delete(g._3, true))
  }
}
