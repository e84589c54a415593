package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-text extraction — the first stage of every real
  * pretraining pipeline (crawled pages → clean text), in the
  * jusText/readability family (Pomikálek 2011, public method): drop
  * script/style/comment subtrees, segment the page into block-level
  * fragments, classify each block by link density and length, and
  * reassemble the page's main text from the good blocks.
  *
  * Everything is composed from codegen'd builtins (regexp_replace /
  * split / transform / aggregate — no UDFs), for two reasons:
  *  - the classifier stays inside whole-stage codegen, so extraction
  *    is a map-only pass over the corpus — no shuffle anywhere until
  *    a caller aggregates;
  *  - every step is reproducible in the DuckDB oracle (same RE2-safe
  *    regexes, same arithmetic), so extraction is hash-pinned
  *    end-to-end, not spot-checked.
  *
  * Regex discipline: patterns are RE2-compatible (no backreferences,
  * no lookaround) so Spark (java.util.regex) and DuckDB (RE2) agree;
  * `(?is)` flags work in both. Tags are handled textually — a real
  * crawler's tag-soup tolerance, not an XML parser's strictness —
  * which is exactly what jusText/trafilatura do.
  *
  * Scale (100 TB): per-document column expressions only; the block
  * explode multiplies rows by the page's block count but every block
  * row carries only its fragment, never the page, and re-aggregation
  * is keyed on doc_id (one shuffle, map-side combinable counts).
  */
object HtmlExtract {

  /** Block-level boundary tags: splitting on these yields jusText's
    * block segmentation. Inline tags (a, b, i, span, em, strong) stay
    * INSIDE fragments so link density can be measured per block. */
  val BlockSplitRe =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th|nav|footer|header|article|section|aside|main|blockquote|pre|form|br|hr)(?:\\s[^>]*)?/?>"

  val ScriptStyleRe =
    "(?is)<(?:script|style|noscript|template)(?:\\s[^>]*)?>.*?</(?:script|style|noscript|template)\\s*>"

  val CommentRe = "(?s)<!--.*?-->"

  val AnchorRe = "(?is)<a(?:\\s[^>]*)?>(.*?)</a\\s*>"

  val TagRe = "(?s)<[^>]*>"

  /** Drop script/style/template subtrees and comments — content that
    * is markup-executable, never prose. First pass of any extractor. */
  def dropNonContent(html: Column): Column =
    regexp_replace(regexp_replace(html, ScriptStyleRe, " "), CommentRe, " ")

  /** Decode the six entities that dominate real HTML (the full table
    * is thousands of names; these cover ~99% of occurrences in web
    * text and both engines decode them identically). `&amp;` LAST so
    * `&amp;lt;` decodes to the literal `&lt;` (one level, the
    * standard non-recursive rule). */
  def decodeEntities(text: Column): Column = {
    val pairs = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    // entity names contain no regex metacharacters and no replacement
    // metacharacters — plain patterns keep the regex RE2-portable
    pairs.foldLeft(text) { case (c, (from, to)) =>
      regexp_replace(c, from, to) }
  }

  /** Tag-strip + entity-decode + whitespace-normalize: the "just give
    * me the text" baseline (what a naive pipeline uses; the block
    * classifier below is what a good one uses). */
  def stripMarkup(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(dropNonContent(html), TagRe, " ")),
      "\\s+", " "))

  /** Per-block rows: (doc_id, block_idx, block_text, n_chars, n_words,
    * link_chars, link_density, is_good). jusText-style classification:
    *  - empty blocks are dropped outright;
    *  - link_density = anchor-text chars / text chars; > 1/3 → bad
    *    (nav/footer link farms);
    *  - fewer than `minWords` words → bad (captions, buttons, dates);
    *  - else good.
    * The context-propagation refinement (short-good promotion between
    * good neighbours) is deliberately omitted: it buys ~1% F1 on the
    * jusText benchmarks at the cost of a per-doc sequential pass. */
  def blocks(docs: DataFrame, idCol: String, htmlCol: String,
             minWords: Int = 5, maxLinkDensity: Double = 1.0 / 3.0)
      : DataFrame = {
    val frag = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(dropNonContent(col(htmlCol)), BlockSplitRe))
          .as(Seq("block_idx", "_frag")))
    frag
      .withColumn("_link_txt",
        concat_ws(" ",
          regexp_extract_all(col("_frag"), lit(AnchorRe), lit(1))))
      .withColumn("block_text",
        trim(regexp_replace(
          decodeEntities(regexp_replace(col("_frag"), TagRe, " ")),
          "\\s+", " ")))
      .withColumn("_link_text",
        trim(regexp_replace(
          decodeEntities(regexp_replace(col("_link_txt"), TagRe, " ")),
          "\\s+", " ")))
      .filter(length(col("block_text")) > 0)
      .select(col("doc_id"), col("block_idx").cast("long").as("block_idx"),
        col("block_text"),
        length(col("block_text")).cast("long").as("n_chars"),
        size(graft.functions.TextFunctions.tokens(col("block_text")))
          .cast("long").as("n_words"),
        length(col("_link_text")).cast("long").as("link_chars"))
      .withColumn("link_density",
        col("link_chars").cast("double") / col("n_chars").cast("double"))
      .withColumn("is_good",
        col("link_density") <= maxLinkDensity && col("n_words") >= minWords)
  }

  /** Page-level extraction: good blocks re-joined in document order.
    * Output: (doc_id, n_blocks, n_good, main_text, main_chars,
    * strip_chars) — strip_chars is the naive tag-strip length, so the
    * boilerplate ratio (1 - main/strip) is one division away. */
  def extractMain(docs: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 5, maxLinkDensity: Double = 1.0 / 3.0)
      : DataFrame = {
    val b = blocks(docs, idCol, htmlCol, minWords, maxLinkDensity)
    val agg = b.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("is_good"), 1L).otherwise(0L)).as("n_good"),
        array_join(transform(array_sort(collect_list(
            when(col("is_good"),
              struct(col("block_idx"), col("block_text"))))),
          x => x.getField("block_text")), " ").as("main_text"))
    docs.select(col(idCol).as("doc_id"),
        length(stripMarkup(col(htmlCol))).cast("long").as("strip_chars"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_good"), lit(0L)).as("n_good"),
        coalesce(col("main_text"), lit("")).as("main_text"),
        col("strip_chars"))
      .withColumn("main_chars", length(col("main_text")).cast("long"))
      .select(col("doc_id"), col("n_blocks"), col("n_good"),
        col("main_text"), col("main_chars"), col("strip_chars"))
  }

  /** Deterministic synthetic page builder — the corpus has no HTML
    * column, so queries wrap `documents.text` in a realistic page
    * (nav link farm, headline, two paragraph blocks, a link-heavy
    * footer, script/style junk, entities) with builtins both engines
    * mirror. Splitting the text at its midpoint exercises multi-block
    * reassembly; the edge corpus's empty/whitespace docs become
    * pages whose only content is boilerplate. The three fragments are
    * public constants so the oracle SQL embeds the IDENTICAL bytes. */
  val HtmlPre: String =
    "<html><head><title>Page &amp; Title</title>" +
      "<style>.x{color:red}</style>" +
      "<script>var x = \"<p>not text</p>\";</script></head>" +
      "<body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
      "<a href=\"/contact\">Contact &gt; here</a></nav>" +
      "<h1>Title of the page</h1><p>"
  val HtmlMid: String = "</p><div>"
  val HtmlPost: String =
    "</div><footer><a href=\"/terms\">Terms of Service</a> " +
      "<a href=\"/privacy\">Privacy Policy</a> &copy; 2026</footer>" +
      "</body></html>"

  def syntheticHtml(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val half = (length(t) / 2).cast("int")
    docs.select(col(idCol).as("doc_id"),
      concat(
        lit(HtmlPre),
        substr(t, lit(1), half),
        lit(HtmlMid),
        substr(t, half + 1, length(t) - half),
        lit(HtmlPost)).as("html"))
  }
}
