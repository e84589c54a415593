package graft.gdl

import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.util.Random

/** The validate-and-import pipeline ≙ the reference's Step Function
  * (/root/reference/infrastructure/processing_stack.py:285-325, traced in
  * SURVEY §3.2): check_stac_metadata → content_iterator/checksum array
  * jobs → validation_summary → Choice → import_dataset.
  *
  * Stages become sequential driver-coordinated Spark jobs; the 10,000-item
  * iteration ladder collapses into partitioning of the checksum stage; the
  * Choice states are `if`s; Step-Function JSON state becomes the
  * `import_executions` row. Stage [1] errors are swallowed after being
  * recorded (utils.py:78-82) so the pipeline proceeds to a failing
  * summary instead of crashing — behavioral parity the status API
  * depends on.
  */
class ImportPipeline(spark: SparkSession, store: TableStore,
                     reader: UrlReader, storageRoot: String,
                     rng: Random = new Random()) {
  import spark.implicits._

  val datasets = new DatasetService(spark, store, rng)

  /** ≙ POST /dataset-versions (backend/dataset_versions/create.py:22-86)
    * + synchronous execution of the whole state machine. Returns the
    * execution id (≙ execution ARN). */
  def run(datasetId: String, metadataUrl: String, now: Instant): Either[String, String] = {
    // payload log ≙ the reference's EVENT_KEY debug line
    // (tests/test_import_dataset_logging.py should_log_payload)
    Log.debugEvent("import_dataset",
      "dataset_id" -> datasetId, "metadata_url" -> metadataUrl)
    val result = runImpl(datasetId, metadataUrl, now)
    result.left.foreach(e => Log.warningError("import_dataset", e))
    result
  }

  private def runImpl(datasetId: String, metadataUrl: String,
                      now: Instant): Either[String, String] =
    datasets.get(datasetId).map { dataset =>
      val versionId = Ulid.generate(now, rng)
      val executionId = s"execution-$versionId"
      val exec = ImportExecutionRow(executionId, datasetId, versionId,
        metadataUrl, Timestamp.from(now), "Running", None, "Pending", "Pending")
      store.append("import_executions", Seq(exec).toDS().toDF())

      val (validationSuccess, metaStatus, assetStatus) =
        try runStages(dataset, versionId, metadataUrl)
        catch { case e: Exception =>
          // hard crash ⇒ summary never ran; record it like the reference
          // logs-and-continues (utils.py:78-82) so status shows Failed
          store.append("validation_results", Seq(ValidationRow(
            datasetId, versionId, "pipeline", metadataUrl, Result.Failed,
            Map("message" -> s"${e.getClass.getSimpleName}: ${e.getMessage}")))
            .toDS().toDF())
          (Some(false), "Pending", "Pending")
        }

      // validation-summary outcome line ≙ SUCCESS_KEY/MESSAGE_KEY
      // (tests/test_validation_summary_logging.py)
      Log.infoOutcome("validation_summary",
        validationSuccess.getOrElse(false),
        if (validationSuccess.contains(true)) ""
        else "validation failed — see validation_results")
      // completion is an O(1) status-delta append — readers resolve
      // last-wins on state_seq (the full-collect-and-rewrite alternative
      // costs O(all executions ever) per run and collects to the driver)
      store.append("import_executions", Seq(exec.copy(
        state_seq = 1L,
        sfn_status = "Succeeded",
        validation_success = validationSuccess,
        metadata_upload_status = metaStatus,
        asset_upload_status = assetStatus)).toDS().toDF())
      executionId
    }

  private def runStages(dataset: DatasetRow, versionId: String,
                        metadataUrl: String): (Option[Boolean], String, String) = {
    // [1] STAC crawl (O-14/O-16/O-18/O-19/O-28)
    val crawl = new StacCrawler(reader).run(dataset.id, versionId, metadataUrl)
    if (crawl.validations.nonEmpty)
      store.append("validation_results", crawl.validations.toDS().toDF())
    if (!crawl.aborted) {
      val rows = crawl.metadata ++ crawl.assets
      if (rows.nonEmpty) store.append("processing_assets", rows.toDS().toDF())
    }

    // [2]/[3] checksum fan-out over DATA rows (O-21/O-17/O-10), read BACK
    // from the processing_assets table — like the reference's
    // content_iterator querying DynamoDB (O-5/O-6) — so the stage scales
    // with the manifest table, not with driver memory. Partition count
    // mirrors the reference's 10,000-item iteration window (O-27).
    if (!crawl.aborted && crawl.assets.nonEmpty) {
      val manifest = store.read("processing_assets").get
        .filter($"dataset_id" === dataset.id && $"version_id" === versionId &&
                $"asset_type" === "DATA") // column predicates → parquet pushdown
        .as[ProcessingAssetRow]
      val nData = crawl.assets.size // known from the crawl (≙ O-5 count)
      val assets = manifest.repartition(math.max(1, math.ceil(nData / 10000.0).toInt))
      val checksumRows = ChecksumValidator.validate(spark, assets, reader)
      store.append("validation_results", checksumRows.toDF())

      // O-24 consistency rule (USAGE.md:76-79): same URL must carry one
      // multihash across all references — engine extension
      val inconsistent = manifest
        .groupBy($"url")
        .agg(countDistinct($"multihash").as("n"))
        .filter($"n" > 1)
        .select($"url")
        .as[String].collect()
      if (inconsistent.nonEmpty)
        store.append("validation_results", inconsistent.toSeq.map(u =>
          ValidationRow(dataset.id, versionId, Check.InconsistentMultihash, u,
            Result.Failed,
            Map("message" -> s"URL referenced with differing multihashes: $u")))
          .toDS().toDF())
    }

    // [5] validation summary (O-25/O-8): early-exit existence of failures
    val anyFailure = store.read("validation_results").exists { df =>
      !df.filter(df("dataset_id") === dataset.id &&
                 df("version_id") === versionId &&
                 df("result") === Result.Failed).limit(1).isEmpty
    }
    val success = !anyFailure

    // [6] Choice: import on success (O-6/O-12/O-34)
    if (success && !crawl.aborted) {
      val importer = new Importer(spark, storageRoot)
      val titlePrefix = s"${dataset.title}-${dataset.id}"
      // copy manifest from the table (O-6), not driver memory
      val manifest = store.read("processing_assets").get
        .filter($"dataset_id" === dataset.id && $"version_id" === versionId)
        .as[ProcessingAssetRow]
      def statusOf(assetType: String): String = {
        // persist so the copy side-effects run exactly once: the report
        // append and the status check both read the cached results
        val results = importer.importAssets(manifest, reader, titlePrefix, assetType)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // per-file report ≙ the S3 Batch report CSVs
          // (import_dataset/task.py:133-139)
          store.append("import_reports", results.toDF())
          val allOk = results.filter(r => r.result_code != "Succeeded").isEmpty
          if (allOk) "Complete" else "Failed"
        } finally { results.unpersist(); () }
      }
      (Some(true), statusOf("METADATA"), statusOf("DATA"))
    } else (Some(success), "Pending", "Pending")
  }
}
