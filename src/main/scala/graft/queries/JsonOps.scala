package graft.queries

import graft.Tables
import graft.gdl.expr.JsonDuplicateKeys
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSON-document and multimodal-column operators: strict parse with
  * duplicate-key detection (the custom Catalyst expression), JSON field
  * extraction, and the binary decode-stub pipeline.
  */
object JsonOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O-9-shaped JSON field extraction from the events props column.
    "q32_json_extract" -> ((s, d) => {
      Tables.load(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
    }),

    // O-18: duplicate-key detection via the JsonDuplicateKeys Catalyst
    // expression, over synthesized documents with known duplicates —
    // from_json would silently drop them.
    "q33_json_dup_keys" -> ((s, d) => {
      JsonDuplicateKeys.register(s)
      Tables.load(s, d, "events")
        .select(col("event_id"),
          concat(lit("""{"k":"""), col("user_id").cast("string"),
                 lit(""","k":"""), col("event_id").cast("string"),
                 lit(""","v":1}""")).as("doc"))
        .withColumn("dup_keys", expr("json_duplicate_keys(doc)"))
        .select(col("event_id"),
                size(col("dup_keys")).cast("long").as("n_dups"),
                concat_ws(",", col("dup_keys")).as("dup_list"))
    }),

    // Multimodal decode-stub pipeline: text → binary media column →
    // partition-wise decode → typed metadata (real plumbing, stub codec).
    "q34_multimodal_decode" -> ((s, d) => {
      val media = Multimodal.withFakeMedia(
        Tables.load(s, d, "documents"), "doc_id", "text")
      Multimodal.decode(s, media, "id", "media")
        .toDF()
        .select(col("id"), col("format"), col("width").cast("long").as("width"),
                col("height").cast("long").as("height"), col("n_bytes"),
                col("content_sha256"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q32_json_extract" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
         FROM events""",

    // every synthesized doc has exactly one duplicated key "k"
    "q33_json_dup_keys" ->
      """SELECT event_id, CAST(1 AS BIGINT) AS n_dups, 'k' AS dup_list
         FROM events""",

    // the stub decoder's fields re-derived from the utf-8 text: width =
    // byte-length mod 640, height = first byte & 0x7f, sha256 of bytes
    "q34_multimodal_decode" ->
      """SELECT doc_id AS id, 'fake' AS format,
                CAST(strlen(text) % 640 AS BIGINT) AS width,
                CAST(ascii(substr(text, 1, 1)) & 127 AS BIGINT) AS height,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                sha256(text) AS content_sha256
         FROM documents"""
  )
}
