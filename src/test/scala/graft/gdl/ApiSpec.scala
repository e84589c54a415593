package graft.gdl

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.Instant
import graft.TestSpark
import graft.gdl.api.Api
import org.scalatest.funsuite.AnyFunSuite

/** Endpoint-contract specs ≙ the reference's deployed endpoint tests
  * (/root/reference/tests/test_datasets_endpoint.py:27-258): status codes
  * and body shapes of the {httpMethod, body} → {statusCode, body} façade.
  */
class ApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mh(b: Array[Byte]): String =
    "1220" + MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private def freshApi(): Api = {
    val tables = java.nio.file.Files.createTempDirectory("api-tables").toString
    val storage = java.nio.file.Files.createTempDirectory("api-storage").toString
    val asset = Array.tabulate[Byte](20)(_.toByte)
    val docs = Map(
      "s3://staging/cat.json" ->
        s"""{"type":"Catalog","stac_version":"1.0.0-rc.3","id":"c",
             "description":"d",
             "links":[{"href":"item.json","rel":"child"}]}""".getBytes(UTF_8),
      "s3://staging/item.json" ->
        s"""{"type":"Feature","stac_version":"1.0.0-rc.3","id":"i",
             "geometry":null,"properties":{"datetime":"2000-01-01T00:00:00Z"},
             "assets":{"a":{"href":"a.bin","file:checksum":"${mh(asset)}"}},
             "links":[]}""".getBytes(UTF_8),
      "s3://staging/a.bin" -> asset)
    var tick = 0L
    new Api(spark, new TableStore(spark, tables), new InMemoryUrlReader(docs),
      storage, () => { tick += 1; Instant.parse("2024-06-01T00:00:00Z").plusSeconds(tick) })
  }

  test("dataset CRUD status codes mirror the reference endpoints") {
    val api = freshApi()
    assert(api.datasetsEndpoint("POST", """{"title": "bad title"}""").statusCode == 400)
    assert(api.datasetsEndpoint("POST", """{}""").statusCode == 400)
    val created = api.datasetsEndpoint("POST", """{"title": "Auckland_2020"}""")
    assert(created.statusCode == 201 && created.body.contains("Auckland_2020"))
    assert(api.datasetsEndpoint("POST", """{"title": "Auckland_2020"}""").statusCode == 409)
    val id = "\"id\":\\s*\"([^\"]+)\"".r.findFirstMatchIn(created.body).get.group(1)
    assert(api.datasetsEndpoint("GET", s"""{"id": "$id"}""").statusCode == 200)
    assert(api.datasetsEndpoint("GET", """{"id": "nope"}""").statusCode == 404)
    assert(api.datasetsEndpoint("GET", """{"title": "Auckland_2020"}""").statusCode == 200)
    assert(api.datasetsEndpoint("GET", "{}").body.startsWith("["))
    assert(api.datasetsEndpoint("PATCH",
      s"""{"id": "$id", "title": "Auckland_2021"}""").statusCode == 200)
    assert(api.datasetsEndpoint("PUT", "{}").statusCode == 400)
    assert(api.datasetsEndpoint("DELETE", s"""{"id": "$id"}""").statusCode == 204)
    assert(api.datasetsEndpoint("GET", s"""{"id": "$id"}""").statusCode == 404)
  }

  test("version creation + import status round trip") {
    val api = freshApi()
    val created = api.datasetsEndpoint("POST", """{"title": "V_Test"}""")
    val id = "\"id\":\\s*\"([^\"]+)\"".r.findFirstMatchIn(created.body).get.group(1)

    assert(api.datasetVersionsEndpoint("POST", """{"id": "nope",
      "metadata-url": "s3://staging/cat.json"}""").statusCode == 404)
    val ver = api.datasetVersionsEndpoint("POST",
      s"""{"id": "$id", "metadata-url": "s3://staging/cat.json"}""")
    assert(ver.statusCode == 201)
    val arn = "\"execution_arn\":\\s*\"([^\"]+)\"".r.findFirstMatchIn(ver.body).get.group(1)

    val st = api.importStatusEndpoint("GET", s"""{"execution_arn": "$arn"}""")
    assert(st.statusCode == 200)
    assert(st.body.contains(""""step function":{"status":"Succeeded"}"""))
    assert(st.body.contains(""""validation":{"status":"Passed","errors":[]}"""))
    assert(st.body.contains(""""metadata upload":{"status":"Complete","errors":[]}"""))
    assert(st.body.contains(""""asset upload":{"status":"Complete","errors":[]}"""))
    // dataset with a stored version can no longer be deleted (O-11 guard)
    assert(api.datasetsEndpoint("DELETE", s"""{"id": "$id"}""").statusCode == 409)
  }
}
