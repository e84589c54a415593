package graft.sources

import graft.gdl.expr.{StacValidator, StrictJson}
import graft.gdl.{Check, Result}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bulk STAC ingestion — the lake-scale form of the metadata path.
  *
  * The driver-side [[graft.gdl.StacCrawler]] mirrors the reference's
  * recursive traversal (/root/reference/backend/check_stac_metadata/
  * utils.py:99-130) and exists for discovery-order parity; it reads one
  * document at a time. When the metadata corpus itself is large (a lake
  * user querying ALL catalogs/collections/items), the right shape is a
  * table: `spark.read.schema(stacSchema).json(dir)` → `stac_documents`,
  * with links/assets exploded into derived views and validation run
  * distributed per-file (SURVEY §1.1 "STAC metadata graph", §1.3 table
  * list, O-9's bulk form).
  *
  * Scale notes:
  *  - the schema is explicit, so the JSON reader never runs its
  *    schema-inference pre-pass over the corpus;
  *  - one file = one document (`multiLine`), so parallelism is
  *    per-file — the natural unit for STAC;
  *  - [[validateDocs]] is a `mapPartitions` over whole-file text: strict
  *    duplicate-key parse (O-18) and structural schema validation (O-19)
  *    happen on executors, emitting the crawler's exact check
  *    vocabulary, so the two paths are interchangeable downstream;
  *  - [[edges]] feeds [[graft.operators.GraphBfs]] for distributed
  *    reachability (which documents does this catalog transitively
  *    reference?) — the bulk replacement for the crawler's cycle-guarded
  *    recursion.
  */
object StacSource {

  /** Typed projection of the three STAC types' shared surface
    * (Catalog / Collection / Item ≙ reference utils.py:23-38). Fields
    * absent from a given type (e.g. `assets` on a Catalog) read as null. */
  val schema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("stac_version", StringType),
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("license", StringType),
    StructField("links", ArrayType(StructType(Seq(
      StructField("href", StringType),
      StructField("rel", StringType),
      StructField("title", StringType),
      StructField("type", StringType))))),
    StructField("assets", MapType(StringType, StructType(Seq(
      StructField("href", StringType),
      StructField("file:checksum", StringType),
      StructField("title", StringType),
      StructField("type", StringType)))))))

  /** `stac_documents`: one row per document, keyed by its file URL. */
  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("multiLine", "true") // one pretty-printed document per file
      .json(path)
      .withColumn("url", input_file_name())

  /** Relative→absolute href against the document's own URL — the column
    * form of the crawler's `resolve` (reference utils.py:43-48). The
    * crawler gates on `s3://` specifically; here any scheme-qualified
    * href is absolute, because bulk reads see `file:`/`s3a:` URLs too. */
  private def resolved(href: org.apache.spark.sql.Column,
                       parent: org.apache.spark.sql.Column) =
    when(href.contains("://"), href)
      .otherwise(concat(regexp_replace(parent, "/[^/]*$", ""), lit("/"), href))

  /** Link edges `(src, dst, rel)` with dst resolved absolute. */
  def links(docs: DataFrame): DataFrame =
    docs.select(col("url").as("src"), explode(col("links")).as("link"))
      .select(col("src"),
        resolved(col("link.href"), col("src")).as("dst"),
        col("link.rel").as("rel"))

  /** Asset rows `(url, asset_name, href, multihash)` — the bulk form of
    * the crawler's per-document asset walk (utils.py:119-124). */
  def assets(docs: DataFrame): DataFrame =
    docs.select(col("url"), explode(col("assets")).as(Seq("asset_name", "asset")))
      .select(col("url"), col("asset_name"),
        resolved(col("asset.href"), col("url")).as("href"),
        col("asset.`file:checksum`").as("multihash"))

  /** Graph edges for [[graft.operators.GraphBfs]]: every link, like the
    * crawler, which follows all rels and relies on the cycle guard. */
  def edges(docs: DataFrame): DataFrame = links(docs).select("src", "dst")

  /** Distributed O-18 + O-19 over whole files: per document, strict
    * duplicate-key JSON parse then structural STAC validation, emitting
    * `(url, check, result, message)` in the crawler's vocabulary —
    * duplicate keys recorded (first value wins, parse continues), parse
    * failure and schema failure each one row, one `JSON schema` Passed
    * row per valid doc (utils.py:103-116, 143-171). */
  def validateDocs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("url"), col("value"))
      .as[(String, String)]
    files.mapPartitions { it =>
      it.flatMap { case (url, text) =>
        val out = StrictJson.parse(text)
        val dupRows = out.duplicateKeys.map(k =>
          (url, Check.DuplicateObjectKey, Result.Failed,
            s"Found duplicate object name “$k” in “$url”"))
        val mainRows = out.parseError match {
          case Some(msg) => Seq((url, Check.JsonParse, Result.Failed, msg))
          case None =>
            val doc = out.node.get
            val stacType = StacValidator.typeOf(doc).getOrElse("")
            StacValidator.validate(doc, stacType) match {
              case Some(error) => Seq((url, Check.JsonSchema, Result.Failed, error))
              case None => Seq((url, Check.JsonSchema, Result.Passed, ""))
            }
        }
        dupRows ++ mainRows
      }
    }.toDF("url", "check", "result", "message")
  }
}
