package graft.gdl

import java.sql.Timestamp
import java.time.Instant
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Table-driven port of the reference's outcome matrix
  * (/root/reference/backend/import_status/get.py:25-36, 79-107 and its
  * unit tests tests/test_import_status_endpoint.py:27-228) — every
  * validation_success × errors × sfn_status × upload combination the
  * status API can see, exercised directly against the store (SURVEY
  * §7.4 risk #6 calls for exactly this exhaustiveness).
  */
class OutcomeMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = Timestamp.from(Instant.parse("2024-01-01T00:00:00Z"))

  private def caseStatus(
      validationSuccess: Option[Boolean], sfnStatus: String,
      withErrors: Boolean, metaUpload: String = "Pending",
      assetUpload: String = "Pending"): Report = {
    import spark.implicits._
    val tables = java.nio.file.Files.createTempDirectory("matrix").toString
    val store = new TableStore(spark, tables)
    store.append("import_executions", Seq(ImportExecutionRow(
      "exec-1", "d1", "v1", "s3://x/cat.json", t0, sfnStatus,
      validationSuccess, metaUpload, assetUpload)).toDS().toDF())
    if (withErrors)
      store.append("validation_results", Seq(ValidationRow(
        "d1", "v1", Check.Checksum, "s3://x/a.bin", Result.Failed,
        Map("message" -> "boom"))).toDS().toDF())
    new ImportStatus(spark, store).get("exec-1").toOption.get
  }

  test("success=true → Passed") {
    assert(caseStatus(Some(true), "Succeeded", withErrors = false)
      .validation.status == "Passed")
  }

  test("success=false → Failed; pending uploads forced to Skipped") {
    val r = caseStatus(Some(false), "Succeeded", withErrors = true)
    assert(r.validation.status == "Failed")
    assert(r.validation.errors.head.details("message") == "boom")
    assert(r.metadataUpload.status == "Skipped")
    assert(r.assetUpload.status == "Skipped")
  }

  test("success=None running, no errors → Pending; uploads stay Pending") {
    val r = caseStatus(None, "Running", withErrors = false)
    assert(r.validation.status == "Pending")
    assert(r.metadataUpload.status == "Pending")
    assert(r.assetUpload.status == "Pending")
  }

  test("success=None + recorded errors → Failed (Pending override)") {
    assert(caseStatus(None, "Running", withErrors = true)
      .validation.status == "Failed")
  }

  test("success=None + terminal sfn status → Skipped") {
    val r = caseStatus(None, "Failed", withErrors = false)
    assert(r.validation.status == "Skipped")
    assert(r.assetUpload.status == "Skipped") // Skipped validation skips uploads
  }

  test("uploads NOT overridden when one already progressed") {
    val r = caseStatus(Some(false), "Succeeded", withErrors = true,
      metaUpload = "Complete")
    assert(r.metadataUpload.status == "Complete") // only both-Pending skips
    assert(r.assetUpload.status == "Pending")
  }

  test("unknown execution id → error") {
    val tables = java.nio.file.Files.createTempDirectory("matrix-e").toString
    assert(new ImportStatus(spark, new TableStore(spark, tables))
      .get("nope").isLeft)
  }
}
