package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import graft.TestSpark
import graft.gdl.{Check, InMemoryUrlReader, Result, StacCrawler}
import graft.operators.GraphBfs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bulk STAC table path must agree with the driver-side crawler on the
  * same graph: same document set, same assets+multihashes, same
  * validation vocabulary. */
class StacSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val catalog =
    """{"type":"Catalog","stac_version":"1.0.0-rc.3","id":"cat1",
       "description":"catalog",
       "links":[{"href":"collection.json","rel":"child"},
                {"href":"catalog.json","rel":"root"},
                {"href":"catalog.json","rel":"self"}]}"""
  private val collection =
    """{"type":"Collection","stac_version":"1.0.0-rc.3","id":"col1",
       "description":"collection","license":"MIT",
       "extent":{"spatial":{"bbox":[[0,0,1,1]]},
                 "temporal":{"interval":[["2020-01-01T00:00:00Z",null]]}},
       "links":[{"href":"item.json","rel":"child"},
                {"href":"catalog.json","rel":"root"},
                {"href":"collection.json","rel":"self"}]}"""
  private val item =
    """{"type":"Feature","stac_version":"1.0.0-rc.3","id":"item1",
       "geometry":null,"properties":{"datetime":"2020-01-01T00:00:00Z"},
       "assets":{"a1":{"href":"asset1.tif","file:checksum":"1220aa"},
                 "a2":{"href":"s3://elsewhere/asset2.tif","file:checksum":"1220bb"}},
       "links":[{"href":"catalog.json","rel":"root"},
                {"href":"item.json","rel":"self"}]}"""

  private def writeGraph(): Path = {
    val dir = Files.createTempDirectory("stac-bulk")
    Files.write(dir.resolve("catalog.json"), catalog.getBytes(UTF_8))
    Files.write(dir.resolve("collection.json"), collection.getBytes(UTF_8))
    Files.write(dir.resolve("item.json"), item.getBytes(UTF_8))
    dir
  }

  private def basename(url: String) = url.substring(url.lastIndexOf('/') + 1)

  test("stac_documents reads typed columns, one row per file") {
    val docs = StacSource.readDocs(spark, writeGraph().toString)
    val rows = docs.select("type", "id", "url").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(1)).toSet == Set("cat1", "col1", "item1"))
    val byId = rows.map(r => r.getString(1) -> r.getString(0)).toMap
    assert(byId("cat1") == "Catalog" && byId("item1") == "Feature")
  }

  test("links resolve relative hrefs against the document URL") {
    val docs = StacSource.readDocs(spark, writeGraph().toString)
    val ls = StacSource.links(docs).collect()
    assert(ls.length == 8) // 3 + 3 + 2
    // every resolved dst is absolute and, for relative hrefs, a sibling
    assert(ls.forall(_.getString(1).contains("://")))
    val childDst = ls.filter(_.getString(2) == "child").map(r => basename(r.getString(1))).toSet
    assert(childDst == Set("collection.json", "item.json"))
  }

  test("assets explode with resolved href and multihash") {
    val docs = StacSource.readDocs(spark, writeGraph().toString)
    val as = StacSource.assets(docs)
      .select("asset_name", "href", "multihash").collect()
      .map(r => (r.getString(0), basename(r.getString(1)), r.getString(2))).toSet
    assert(as == Set(("a1", "asset1.tif", "1220aa"), ("a2", "asset2.tif", "1220bb")))
    // the absolute href stayed on its own bucket
    val a2 = StacSource.assets(docs).filter(col("asset_name") === "a2")
      .select("href").head().getString(0)
    assert(a2 == "s3://elsewhere/asset2.tif")
  }

  test("GraphBfs over bulk edges reaches the whole graph from the catalog") {
    val dir = writeGraph()
    val docs = StacSource.readDocs(spark, dir.toString)
    val edges = StacSource.edges(docs)
    val root = docs.filter(col("id") === "cat1").select("url").head().getString(0)
    val reached = GraphBfs.reachableFrom(spark, edges, root, maxDepth = 10)
      .collect().map(r => basename(r.getString(0))).toSet
    assert(reached == Set("catalog.json", "collection.json", "item.json"))
  }

  test("bulk validation is all-Passed on the clean graph and agrees with the crawler") {
    val dir = writeGraph()
    val v = StacSource.validateDocs(spark, dir.toString).collect()
    assert(v.length == 3)
    assert(v.forall(r => r.getString(1) == Check.JsonSchema && r.getString(2) == Result.Passed))

    // crawler on the same graph (in-memory keyed by s3 urls) finds the
    // same document set and the same (asset, multihash) pairs as bulk
    val byUrl = Map(
      "s3://b/catalog.json" -> catalog.getBytes(UTF_8),
      "s3://b/collection.json" -> collection.getBytes(UTF_8),
      "s3://b/item.json" -> item.getBytes(UTF_8))
    val crawl = new StacCrawler(new InMemoryUrlReader(byUrl))
      .run("ds1", "v1", "s3://b/catalog.json")
    assert(!crawl.aborted)
    assert(crawl.metadata.map(m => basename(m.url)).toSet ==
      Set("catalog.json", "collection.json", "item.json"))
    val docs = StacSource.readDocs(spark, dir.toString)
    val bulkAssets = StacSource.assets(docs)
      .select("href", "multihash").collect()
      .map(r => (basename(r.getString(0)), r.getString(1))).toSet
    val crawlAssets = crawl.assets.map(a => (basename(a.url), a.multihash.get)).toSet
    assert(bulkAssets == crawlAssets)
  }

  test("bulk validation emits the crawler's failure vocabulary") {
    val dir = Files.createTempDirectory("stac-bad")
    // duplicate key (first value wins, still schema-valid), a schema
    // failure (missing description), and a parse failure
    Files.write(dir.resolve("dup.json"),
      """{"type":"Catalog","stac_version":"1.0.0-rc.3","id":"d1","id":"d2",
         "description":"x","links":[]}""".getBytes(UTF_8))
    Files.write(dir.resolve("bad_schema.json"),
      """{"type":"Catalog","stac_version":"1.0.0-rc.3","id":"c1","links":[]}""".getBytes(UTF_8))
    Files.write(dir.resolve("bad_parse.json"), "{not json".getBytes(UTF_8))

    val v = StacSource.validateDocs(spark, dir.toString)
      .collect().map(r => (basename(r.getString(0)), r.getString(1), r.getString(2))).toList
    assert(v.count { case (f, c, r) =>
      f == "dup.json" && c == Check.DuplicateObjectKey && r == Result.Failed } == 1)
    assert(v.contains(("dup.json", Check.JsonSchema, Result.Passed)))
    assert(v.contains(("bad_schema.json", Check.JsonSchema, Result.Failed)))
    assert(v.contains(("bad_parse.json", Check.JsonParse, Result.Failed)))
  }
}
