package graft.gdl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, desc, row_number}

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
  *
  * Retention: superseded generations are NOT deleted at commit time —
  * a concurrent reader (or a retained lazy DataFrame re-evaluated across
  * several actions) may still hold their file paths. They are GC'd only
  * once older than `gcGraceMs` (checked on later commits or an explicit
  * [[gc]]), the same grace-period discipline Delta/Iceberg use for
  * vacuum. Delta count per table is bounded: an append that leaves more
  * than `autoCompactDeltas` deltas since the last full generation folds
  * them into a new full generation, so read-time file listings stay O(1)
  * amortized no matter how many appends a table sees.
  *
  * @param autoCompactDeltas compact when an append leaves more than this
  *                          many deltas since the last full generation
  * @param gcGraceMs minimum age before a superseded generation is deleted
  */
class TableStore(spark: SparkSession, root: String,
                 autoCompactDeltas: Int = 64,
                 gcGraceMs: Long = 10L * 60 * 1000) {

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

  /** Last-wins resolution for tables maintained as status-delta appends
    * (e.g. `import_executions`): the row with the highest `seqCol` per
    * key. One window shuffle keyed on the key columns — point lookups
    * should instead filter on the key FIRST (parquet pushdown) and take
    * `ORDER BY seqCol DESC LIMIT 1`, as ImportStatus.get does. */
  def readLatestBy(table: String, keyCols: Seq[String],
                   seqCol: String): Option[DataFrame] =
    read(table).map { df =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(desc(seqCol))
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }

  /** Append rows as a new delta generation (no read-modify-write).
    * `partitionBy` lays the generation out as `col=value/` subdirs so
    * reads with equality predicates on those columns prune whole
    * directories — the 100 TB layout for processing_assets /
    * validation_results is `partitionBy("dataset_id")` (SURVEY §7.4 #7). */
  def append(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    commit(table, df, "delta", partitionBy)
    // bound read-time listings: fold long delta chains into a new full gen
    val gens = generations(table)
    val lastFull = gens.lastIndexWhere(_._2 == "full")
    if (gens.size - 1 - lastFull > autoCompactDeltas) compact(table, partitionBy)
  }

  /** Replace table contents (new full generation supersedes the past). */
  def overwrite(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
    commit(table, df, "full", partitionBy)

  /** Compaction: fold the current generations into one full generation
    * (same contents, one pass) — runs automatically once a table
    * accumulates `autoCompactDeltas` deltas; superseded generations are
    * deleted lazily by [[gc]] after the grace period. */
  def compact(table: String, partitionBy: Seq[String] = Nil): Unit =
    read(table).foreach(df => overwrite(table, df, partitionBy))

  /** Delete superseded generations (those older than the newest full
    * generation) that are past the grace period. Safe to run any time:
    * a generation younger than `gcGraceMs` is never touched, so lazy
    * DataFrames created before the supersession keep resolving. */
  def gc(table: String): Unit = {
    val gens = generations(table)
    val lastFull = gens.lastIndexWhere(_._2 == "full")
    if (lastFull > 0) {
      val dir = tableDir(table)
      val f = fs(dir)
      val cutoff = System.currentTimeMillis() - gcGraceMs
      gens.take(lastFull)
        .filter(g => f.getFileStatus(g._3).getModificationTime < cutoff)
        .foreach(g => f.delete(g._3, true))
    }
  }

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
    // superseded generations are GC'd lazily (grace period) — deleting
    // them here would break concurrent readers holding their file paths
    if (kind == "full") gc(table)
  }
}
