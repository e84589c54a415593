package graft.gdl

import java.sql.Timestamp

/** Engine table schemas ≙ the reference's DynamoDB item shapes
  * (FIXTURES.md §3). Normalized columns replace composite pk/sk strings;
  * the compose/decompose functions live in [[Keys]].
  */

/** `datasets` ≙ /root/reference/backend/datasets_model.py:43-66. */
final case class DatasetRow(
    id: String,        // human-readable ULID (pk = "DATASET#" + id)
    title: String,     // unique, charset ^[A-Za-z0-9_-]+$
    created_at: Timestamp,
    updated_at: Timestamp)

/** `processing_assets` ≙ backend/processing_assets_model.py:12-21;
  * key construction backend/check_stac_metadata/utils.py:84-97. */
final case class ProcessingAssetRow(
    dataset_id: String,
    version_id: String,
    asset_type: String, // "DATA" | "METADATA"
    item_index: Long,   // discovery order (DFS pre-order, assets per doc)
    url: String,
    multihash: Option[String]) // None for METADATA rows

/** `validation_results` ≙ backend/validation_results_model.py:34-39.
  * Check vocabulary ≙ backend/check.py:4-10. */
final case class ValidationRow(
    dataset_id: String,
    version_id: String,
    check: String,  // Check.*
    url: String,
    result: String, // "Passed" | "Failed"
    details: Map[String, String])

/** `import_executions` ≙ the Step Function execution record consumed by
  * backend/import_status/get.py:57-94.
  *
  * Status changes are DELTA APPENDS, not rewrites: each update appends a
  * new row with a higher `state_seq` and readers resolve last-wins per
  * `execution_id` (ImportStatus filters + `ORDER BY state_seq DESC LIMIT
  * 1`; bulk reads use [[TableStore.readLatestBy]]). Completing a run is
  * therefore O(1) regardless of how many executions exist — the
  * full-collect-and-overwrite alternative is O(history) per run. */
final case class ImportExecutionRow(
    execution_id: String,
    dataset_id: String,
    version_id: String,
    metadata_url: String,
    started_at: Timestamp,
    sfn_status: String,                  // Running | Succeeded | Failed
    validation_success: Option[Boolean], // None until summary ran
    metadata_upload_status: String,      // Pending | Complete | Failed | Skipped
    asset_upload_status: String,
    state_seq: Long = 0L)                // delta sequence; highest wins

/** Check-name vocabulary ≙ backend/check.py:4-10. Note the reference
  * maps DUPLICATE_OBJECT_KEY to the literal "duplicate asset name". */
object Check {
  val Checksum = "checksum"
  val DuplicateObjectKey = "duplicate asset name"
  val JsonParse = "JSON parse"
  val JsonSchema = "JSON schema"
  val StagingAccess = "staging bucket access"
  val NonS3Url = "not an s3 url"
  /** Engine extension (USAGE.md:76-79 contract, SURVEY O-24). */
  val InconsistentMultihash = "inconsistent multihash"
  /** Engine extension: the crawler's visited-set cap tripped — the
    * graph needs the distributed path (StacSource + GraphBfs). */
  val TraversalCap = "metadata graph too large"
}

/** Result values ≙ backend/validation_results_model.py ValidationResult. */
object Result {
  val Passed = "Passed"
  val Failed = "Failed"
}

/** pk/sk compose + decompose ≙ backend/datasets_model.py:49,63-66 and
  * backend/validation_results_model.py:92 (O-29/O-30). */
object Keys {
  def datasetPk(id: String): String = s"DATASET#$id"
  def datasetIdFromPk(pk: String): String = pk.split("#")(1)
  def versionPk(datasetId: String, versionId: String): String =
    s"DATASET#$datasetId#VERSION#$versionId"
  def assetSk(assetType: String, index: Long): String =
    s"${assetType}_ITEM_INDEX#$index"
  def checkSk(check: String, url: String): String = s"CHECK#$check#URL#$url"
}
