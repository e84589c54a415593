package graft.streaming

import graft.gdl.TableStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** CDC-apply sink: a stream of row versions (inserts + updates, e.g. a
  * status feed or a replicated table's change log) is applied to a
  * TableStore table as a row-level [[TableStore.merge]] per
  * micro-batch — the table converges to last-write-wins per key
  * instead of accumulating every version the way an append sink does.
  *
  * Exactly-once WITHOUT a replay guard: upsert is idempotent — applying
  * the same batch of (key → row) twice leaves the same table, and the
  * merge's expected-slot commit serializes it against concurrent
  * writers — so an at-least-once replay after a crash between commit
  * and checkpoint simply converges. (Contrast StreamingValidation's
  * append sink, which NEEDS the batch-id probe because a replayed
  * append would double rows.)
  *
  * In-batch ordering: a micro-batch may carry SEVERAL versions of one
  * key; `seqCol` (a monotone version/sequence column) picks the newest
  * per key before the merge, so applying a batch is order-insensitive.
  *
  * Scale: each micro-batch costs one touched-file discovery scan plus
  * a rewrite of O(files holding updated keys) — bounded by batch size,
  * not table size, once the table is clustered enough that a batch's
  * keys concentrate in few files; the change feed's Bloom sidecars keep
  * the subsequent point reads pruned.
  */
object StreamingUpsert {

  def start(spark: SparkSession, srcDir: String, schema: StructType,
            store: TableStore, table: String, keyCols: Seq[String],
            seqCol: String, checkpointDir: String): StreamingQuery = {
    require(keyCols.nonEmpty, "need at least one key column")
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newest = latestPerKey(batch, keyCols, seqCol)
        if (!newest.isEmpty) store.merge(table, newest, keyCols)
      }
      .start()
  }

  /** The newest version of each key in a batch (ties broken arbitrarily
    * but deterministically within a batch). One bounded shuffle over
    * the BATCH, never the table. */
  private[streaming] def latestPerKey(batch: DataFrame, keyCols: Seq[String],
                                      seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, desc, row_number}
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(desc(seqCol))
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
