package graft.gdl.api

import java.time.Instant
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import graft.gdl._
import graft.gdl.expr.StrictJson
import org.apache.spark.sql.SparkSession

/** Thin JSON façade mirroring the reference's Lambda endpoint contract
  * `{httpMethod, body} → {statusCode, body}`
  * (/root/reference/backend/api_responses.py:10-40, dispatch at 18-40;
  * request schemas backend/datasets/create.py:11-29,
  * backend/dataset_versions/create.py:27-43) — SURVEY O-20.
  *
  * Request validation is plain Scala over the parsed body (the reference
  * uses inline JSON Schema); errors use the same message/status shapes.
  */
final case class Response(statusCode: Int, body: String)

class Api(spark: SparkSession, store: TableStore, reader: UrlReader,
          storageRoot: String, now: () => Instant = () => Instant.now()) {

  private val nodes = JsonNodeFactory.instance
  private val pipeline = new ImportPipeline(spark, store, reader, storageRoot)
  private val status = new ImportStatus(spark, store)
  private def datasets = pipeline.datasets

  // Jackson-built bodies: user-echoed text (titles, parse errors) may
  // contain backslashes/newlines/quotes — string interpolation would
  // produce malformed JSON for those
  private def err(code: Int, message: String): Response = {
    val o = nodes.objectNode()
    o.put("message", message)
    Response(code, o.toString)
  }

  private def datasetJson(d: DatasetRow): String = {
    val o = nodes.objectNode()
    o.put("id", d.id)
    o.put("title", d.title)
    o.put("created_at", d.created_at.toInstant.toString)
    o.put("updated_at", d.updated_at.toInstant.toString)
    o.toString
  }

  /** Datasets endpoint ≙ backend/datasets/entrypoint.py. */
  def datasetsEndpoint(httpMethod: String, bodyJson: String): Response = {
    Log.debugEvent("datasets", "httpMethod" -> httpMethod, "body" -> bodyJson)
    def errW(code: Int, message: String): Response = {
      Log.warningError("datasets", message); err(code, message)
    }
    val parsed = StrictJson.parse(bodyJson)
    if (parsed.parseError.isDefined) return errW(400, "body is not valid JSON")
    val body = parsed.node.get
    def str(f: String): Option[String] =
      Option(body.get(f)).filter(_.isTextual).map(_.asText)

    httpMethod match {
      case "POST" =>
        str("title") match {
          case None => errW(400, "'title' is a required property")
          case Some(title) =>
            datasets.create(title, now()) match {
              case Right(d) => Response(201, datasetJson(d))
              case Left(e) if e.contains("already exists") => errW(409, e)
              case Left(e) => errW(400, e)
            }
        }
      case "GET" =>
        (str("id"), str("title")) match {
          case (Some(id), _) =>
            datasets.get(id).fold(e => errW(404, e), d => Response(200, datasetJson(d)))
          case (None, Some(title)) =>
            datasets.getByTitle(title).fold(e => errW(404, e), d => Response(200, datasetJson(d)))
          case (None, None) =>
            Response(200, datasets.list().map(datasetJson).mkString("[", ", ", "]"))
        }
      case "PATCH" =>
        (str("id"), str("title")) match {
          case (Some(id), Some(title)) =>
            datasets.update(id, title, now()) match {
              case Right(d) => Response(200, datasetJson(d))
              case Left(e) if e.contains("does not exist") => errW(404, e)
              case Left(e) if e.contains("already exists") => errW(409, e)
              case Left(e) => errW(400, e)
            }
          case _ => errW(400, "'id' and 'title' are required properties")
        }
      case "DELETE" =>
        str("id") match {
          case None => errW(400, "'id' is a required property")
          case Some(id) =>
            datasets.delete(id) match {
              case Right(_) => Response(204, "")
              case Left(e) if e.contains("does not exist") => errW(404, e)
              case Left(e) => errW(409, e)
            }
        }
      case other => errW(400, s"'$other' is not a supported HTTP method")
    }
  }

  /** Dataset-versions endpoint ≙ backend/dataset_versions/create.py. */
  def datasetVersionsEndpoint(httpMethod: String, bodyJson: String): Response = {
    Log.debugEvent("dataset_versions",
      "httpMethod" -> httpMethod, "body" -> bodyJson)
    def errW(code: Int, message: String): Response = {
      Log.warningError("dataset_versions", message); err(code, message)
    }
    if (httpMethod != "POST") return errW(400, s"'$httpMethod' is not a supported HTTP method")
    val parsed = StrictJson.parse(bodyJson)
    if (parsed.parseError.isDefined) return errW(400, "body is not valid JSON")
    val body = parsed.node.get
    def str(f: String): Option[String] =
      Option(body.get(f)).filter(_.isTextual).map(_.asText)
    (str("id"), str("metadata-url")) match {
      case (Some(id), Some(url)) =>
        pipeline.run(id, url, now()) match {
          case Right(execId) =>
            Response(201, s"""{"dataset_version": "$execId", "execution_arn": "$execId"}""")
          case Left(e) => errW(404, e)
        }
      case _ => errW(400, "'id' and 'metadata-url' are required properties")
    }
  }

  /** Import-status endpoint ≙ backend/import_status/get.py. */
  def importStatusEndpoint(httpMethod: String, bodyJson: String): Response = {
    Log.debugEvent("import_status",
      "httpMethod" -> httpMethod, "body" -> bodyJson)
    def errW(code: Int, message: String): Response = {
      Log.warningError("import_status", message); err(code, message)
    }
    if (httpMethod != "GET") return errW(400, s"'$httpMethod' is not a supported HTTP method")
    val parsed = StrictJson.parse(bodyJson)
    if (parsed.parseError.isDefined) return errW(400, "body is not valid JSON")
    Option(parsed.node.get.get("execution_arn")).filter(_.isTextual).map(_.asText) match {
      case None => errW(400, "'execution_arn' is a required property")
      case Some(arn) =>
        status.get(arn) match {
          case Left(e) => errW(404, e)
          case Right(r) =>
            def section(s: StatusSection): JsonNode = {
              val o = nodes.objectNode()
              o.put("status", s.status)
              val errs = nodes.arrayNode()
              s.errors.foreach { e =>
                val eo = nodes.objectNode()
                eo.put("check", e.check); eo.put("result", e.result); eo.put("url", e.url)
                val d = nodes.objectNode()
                e.details.foreach { case (k, v) => d.put(k, v) }
                eo.set[JsonNode]("details", d)
                errs.add(eo)
              }
              o.set[JsonNode]("errors", errs)
              o
            }
            val root = nodes.objectNode()
            val sf = nodes.objectNode(); sf.put("status", r.stepFunction)
            root.set[JsonNode]("step function", sf)
            root.set[JsonNode]("validation", section(r.validation))
            root.set[JsonNode]("metadata upload", section(r.metadataUpload))
            root.set[JsonNode]("asset upload", section(r.assetUpload))
            Response(200, root.toString)
        }
    }
  }
}
