package graft.gdl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** The structured-logging contract the reference pins per component
  * (tests/test_import_dataset_logging.py et al.): payloads as EXACT
  * JSON `{"event": {...}}` at debug, failures as `{"error": "..."}` at
  * warning, outcomes as `{"success": ..., "message": "..."}` at info.
  * Messages are compared as strings — Jackson-built, not interpolated.
  */
class LogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def captured[A](f: => A): Seq[(String, String, String)] = {
    val buf = ArrayBuffer.empty[(String, String, String)]
    Log.withSink((c, l, m) => buf.synchronized { buf += ((c, l, m)): Unit })(f)
    buf.toSeq
  }

  private def freshPipeline() = {
    val tables = java.nio.file.Files.createTempDirectory("log-tables").toString
    val storage = java.nio.file.Files.createTempDirectory("log-storage").toString
    new ImportPipeline(spark, new TableStore(spark, tables),
      new InMemoryUrlReader(Map.empty), storage,
      new scala.util.Random(7))
  }

  test("import_dataset logs its payload as exact JSON at debug") {
    val p = freshPipeline()
    val lines = captured {
      p.run("no-such-dataset", "s3://staging/cat.json",
        java.time.Instant.parse("2021-01-01T00:00:00Z")): Unit
    }
    assert(lines.contains(("import_dataset", "debug",
      """{"event":{"dataset_id":"no-such-dataset","metadata_url":"s3://staging/cat.json"}}""")))
  }

  test("a missing dataset logs the error shape at warning") {
    val p = freshPipeline()
    val lines = captured {
      p.run("no-such-dataset", "s3://staging/cat.json",
        java.time.Instant.parse("2021-01-01T00:00:00Z")): Unit
    }
    val warnings = lines.filter(l => l._1 == "import_dataset" && l._2 == "warning")
    assert(warnings.nonEmpty)
    assert(warnings.head._3.startsWith("""{"error":"""))
  }

  test("validation_summary logs the outcome shape at info") {
    val p = freshPipeline()
    val ds = p.datasets.create("Log_Test",
      java.time.Instant.parse("2021-01-01T00:00:00Z")).toOption.get
    val lines = captured {
      // empty reader: the crawl fails, summary is success=false
      p.run(ds.id, "s3://staging/cat.json",
        java.time.Instant.parse("2021-01-01T00:01:00Z")): Unit
    }
    val infos = lines.filter(l => l._1 == "validation_summary" && l._2 == "info")
    assert(infos.nonEmpty)
    assert(infos.head._3 ==
      """{"success":false,"message":"validation failed — see validation_results"}""")
  }

  test("API endpoints log payload at debug and 4xx at warning") {
    val tables = java.nio.file.Files.createTempDirectory("log-api").toString
    val theApi = new graft.gdl.api.Api(spark, new TableStore(spark, tables),
      new InMemoryUrlReader(Map.empty),
      java.nio.file.Files.createTempDirectory("log-api-st").toString)
    val lines = captured {
      theApi.importStatusEndpoint("GET", """{"execution_arn": "nope"}"""): Unit
    }
    assert(lines.exists(l => l._1 == "import_status" && l._2 == "debug" &&
      l._3.startsWith("""{"event":{"httpMethod":"GET"""")))
    assert(lines.exists(l => l._1 == "import_status" && l._2 == "warning" &&
      l._3 == """{"error":"execution 'nope' does not exist"}"""))
  }
}
