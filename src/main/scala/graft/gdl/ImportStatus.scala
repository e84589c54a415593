package graft.gdl

import org.apache.spark.sql.SparkSession

/** Import-status report ≙ GET /import-status
  * (/root/reference/backend/import_status/get.py:39-107).
  *
  * The Outcome matrix ports verbatim (get.py:25-36, 97-107):
  *  - validation: success true/false/None → Passed/Failed/Pending;
  *    Pending + recorded errors ⇒ Failed;
  *    Pending + terminal step-function status ⇒ Skipped.
  *  - uploads: both still Pending while validation Failed/Skipped ⇒
  *    Skipped ("failed validation implies uploads will never happen",
  *    get.py:79-85).
  */
final case class ValidationError(
    check: String, result: String, url: String, details: Map[String, String])
final case class StatusSection(status: String, errors: Seq[ValidationError])
final case class Report(
    stepFunction: String,
    validation: StatusSection,
    metadataUpload: StatusSection,
    assetUpload: StatusSection)

class ImportStatus(spark: SparkSession, store: TableStore) {
  import spark.implicits._

  def get(executionId: String): Either[String, Report] = {
    val exec = store.read("import_executions")
      .map(_.as[ImportExecutionRow].filter(_.execution_id == executionId).collect())
      .getOrElse(Array.empty)
      .headOption
      .toRight(s"execution '$executionId' does not exist")

    exec.map { e =>
      // O-7 + O-26: failed rows of this version, key-parsed error list
      val errors = store.read("validation_results").map { df =>
        df.filter(df("dataset_id") === e.dataset_id &&
                  df("version_id") === e.version_id &&
                  df("result") === Result.Failed)
          .as[ValidationRow].collect().toSeq
          .map(v => ValidationError(v.check, v.result, v.url, v.details))
      }.getOrElse(Seq.empty)

      val validationOutcome = (e.validation_success match {
        case Some(true) => "Passed"
        case Some(false) => "Failed"
        case None => "Pending"
      }) match {
        case "Pending" if errors.nonEmpty => "Failed"
        case "Pending" if !Seq("Running", "Succeeded").contains(e.sfn_status) => "Skipped"
        case other => other
      }

      var metaStatus = e.metadata_upload_status
      var assetStatus = e.asset_upload_status
      if (metaStatus == "Pending" && assetStatus == "Pending" &&
          Seq("Failed", "Skipped").contains(validationOutcome)) {
        metaStatus = "Skipped"
        assetStatus = "Skipped"
      }

      Report(
        stepFunction = e.sfn_status,
        validation = StatusSection(validationOutcome, errors),
        metadataUpload = StatusSection(metaStatus, Seq.empty),
        assetUpload = StatusSection(assetStatus, Seq.empty))
    }
  }
}
