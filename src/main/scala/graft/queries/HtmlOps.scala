package graft.queries

import graft.Tables
import graft.operators.HtmlExtract
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML main-text extraction queries (q148/q149) — the crawled-page
  * ingest stage (VERDICT r7 missing #1). The corpus has no HTML, so
  * both engines wrap `documents.text` in the IDENTICAL deterministic
  * page ([[HtmlExtract.syntheticHtml]]'s shared constants) and the
  * extraction pipeline — script/style drop, block segmentation, link
  * density, length rule, good-block reassembly — is hash-pinned
  * end-to-end over the edge-augmented corpus (empty and whitespace
  * docs become boilerplate-only pages).
  */
object HtmlOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-block classification rows: the jusText-style segment table a
    // curation pass filters on. Map-only: synthesize page → split →
    // per-fragment columns; the only shuffle is Verify's output sort.
    "q148_html_blocks" -> ((s, d) =>
      HtmlExtract.blocks(
        HtmlExtract.syntheticHtml(Tables.documentsWithEdges(s, d),
          "doc_id", "text"),
        "doc_id", "html")),

    // Page-level extraction: good blocks reassembled in document
    // order, with the naive tag-strip length alongside so the
    // boilerplate ratio is pinned too.
    "q149_html_extract" -> ((s, d) =>
      HtmlExtract.extractMain(
        HtmlExtract.syntheticHtml(Tables.documentsWithEdges(s, d),
          "doc_id", "text"),
        "doc_id", "html"))
  )

  // ---- oracle SQL ----------------------------------------------------

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** replace() chain mirroring [[HtmlExtract.decodeEntities]] — same
    * pairs, same order (`&amp;` last: one-level, non-recursive). */
  private def decodeSql(x: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(x) { case (acc, (f, t)) =>
        s"replace($acc, ${sqlLit(f)}, ${sqlLit(t)})" }

  /** trim + entity-decode + tag-strip + whitespace-normalize of a
    * fragment expression — [[HtmlExtract]]'s block_text recipe. */
  private def blockTextSql(x: String): String =
    s"""trim(regexp_replace(${decodeSql(
         s"regexp_replace($x, ${sqlLit(HtmlExtract.TagRe)}, ' ', 'g')")},
         '\\s+', ' ', 'g'))"""

  /** The shared CTE chain: edge corpus → synthetic page → non-content
    * drop → fragments (ordinal-indexed, mirroring posexplode over a
    * split that KEEPS empty strings) → classified blocks. */
  private lazy val blocksPrefixSql: String = {
    val htmlExpr =
      s"""${sqlLit(HtmlExtract.HtmlPre)}
           || substr(text, 1, length(text) // 2)
           || ${sqlLit(HtmlExtract.HtmlMid)}
           || substr(text, (length(text) // 2) + 1,
                     length(text) - length(text) // 2)
           || ${sqlLit(HtmlExtract.HtmlPost)}"""
    val nonContent =
      s"""regexp_replace(regexp_replace(html,
            ${sqlLit(HtmlExtract.ScriptStyleRe)}, ' ', 'g'),
            ${sqlLit(HtmlExtract.CommentRe)}, ' ', 'g')"""
    // DuckDB's array_to_string([]) is NULL, not '' — coalesce to match
    // Spark's concat_ws over an empty extract
    val linkJoined =
      s"""coalesce(array_to_string(regexp_extract_all(frag,
            ${sqlLit(HtmlExtract.AnchorRe)}, 1), ' '), '')"""
    s"""docs_e AS (${Tables.documentsWithEdgesSql}),
        h AS (SELECT doc_id, $htmlExpr AS html FROM docs_e),
        nc AS (SELECT doc_id, $nonContent AS h2 FROM h),
        fr AS (SELECT doc_id,
                      string_split_regex(h2,
                        ${sqlLit(HtmlExtract.BlockSplitRe)}) AS frags
               FROM nc),
        fx AS (SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS block_idx,
                      frags[CAST(t.i AS INTEGER)] AS frag
               FROM fr, unnest(range(1, len(frags) + 1)) AS t(i)),
        bt AS (SELECT doc_id, block_idx,
                      ${blockTextSql("frag")} AS block_text,
                      ${blockTextSql(linkJoined)} AS link_text
               FROM fx),
        b AS (SELECT doc_id, block_idx, block_text,
                     CAST(length(block_text) AS BIGINT) AS n_chars,
                     CAST(len(list_filter(
                       string_split_regex(block_text, '\\s+'),
                       x -> x <> '')) AS BIGINT) AS n_words,
                     CAST(length(link_text) AS BIGINT) AS link_chars
              FROM bt WHERE length(block_text) > 0),
        blk AS (SELECT *,
                       CAST(link_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
                         AS link_density,
                       (CAST(link_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
                          <= CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE)
                        AND n_words >= 5) AS is_good
                FROM b)"""
  }

  def oracles: Map[String, String] = Map(

    "q148_html_blocks" ->
      s"""WITH $blocksPrefixSql
          SELECT doc_id, block_idx, block_text, n_chars, n_words,
                 link_chars, link_density, is_good
          FROM blk""",

    "q149_html_extract" -> {
      val stripExpr = blockTextSql("h2")
      s"""WITH $blocksPrefixSql,
          agg AS (SELECT doc_id,
                         CAST(count(*) AS BIGINT) AS n_blocks,
                         CAST(sum(CASE WHEN is_good THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_good,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          st AS (SELECT doc_id, $stripExpr AS stext FROM nc)
          SELECT st.doc_id,
                 coalesce(a.n_blocks, 0) AS n_blocks,
                 coalesce(a.n_good, 0) AS n_good,
                 coalesce(a.main_text, '') AS main_text,
                 CAST(length(coalesce(a.main_text, '')) AS BIGINT)
                   AS main_chars,
                 CAST(length(st.stext) AS BIGINT) AS strip_chars
          FROM st LEFT JOIN agg a USING (doc_id)"""
    }
  )
}
