package graft.streaming

import graft.gdl.{ChecksumValidator, ProcessingAssetRow, TableStore, UrlReader}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming form of the checksum-validation stage: because the batch
  * stage is a pure `Dataset → Dataset` function (SURVEY §1.3's design
  * constraint), wiring it under `foreachBatch` is composition, not a
  * redesign. New manifest rows arriving in the stream are checksummed
  * and their validation rows appended to the store, micro-batch by
  * micro-batch — continuous ingestion validation for a lake receiving
  * assets around the clock.
  *
  * Exactly-once note: `foreachBatch` gives at-least-once on restart;
  * the TableStore append is idempotent per (version, url, check) at the
  * summary level (re-validation writes identical rows), which is the
  * same property the reference's retry-driven Batch fleet relies on.
  */
object StreamingValidation {

  /** Start validating a stream of manifest rows (ProcessingAssetRow
    * schema, parquet files arriving in `manifestDir`). */
  def start(spark: SparkSession, manifestDir: String, reader: UrlReader,
            store: TableStore, checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[ProcessingAssetRow].schema
    spark.readStream.schema(schema).parquet(manifestDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = ChecksumValidator.validate(spark, batch.as[ProcessingAssetRow], reader)
        store.append("validation_results", rows.toDF())
      }
      .start()
  }
}
