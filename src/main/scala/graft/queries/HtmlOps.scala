package graft.queries

import graft.Tables
import graft.operators.HtmlExtract
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
        "doc_id", "html")),

    // The round-8 ingest capstone: the FULL crawl-to-report pipeline —
    // dirty bytes (q152's prefix) wrapped in a page (q148's builder) →
    // block-classified extraction (q149) → encoding repair/NFC (q152)
    // → per-source data-card row: docs, blocks, good blocks, clean
    // tokens, and the boilerplate ratio in exact ppm. One map-only
    // pipeline to the per-doc grain, one doc_id join back for source,
    // one combinable per-source aggregate — the report a 100 TB
    // ingest run emits per crawl snapshot.
    "q154_ingest_report" -> ((s, d) => {
      val docs = Tables.documentsWithEdges(s, d)
      val dirty = docs.select(col("doc_id"),
        concat(lit(NormalizeOps.DirtyPrefix), col("text")).as("text"))
      val main = HtmlExtract.extractMain(
        HtmlExtract.syntheticHtml(dirty, "doc_id", "text"), "doc_id", "html")
      val perDoc = main.select(col("doc_id"), col("n_blocks"), col("n_good"),
        col("main_chars"), col("strip_chars"),
        graft.functions.TextFunctions
          .tokenCount(graft.operators.TextNormalize.cleanText(col("main_text")))
          .as("n_tokens_clean"))
      perDoc.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_blocks")).as("n_blocks"),
          sum(col("n_good")).as("n_good"),
          sum(col("n_tokens_clean")).as("n_tokens_clean"),
          sum(col("main_chars")).as("main_chars"),
          sum(col("strip_chars")).as("strip_chars"))
        .select(col("source"), col("n_docs"), col("n_blocks"), col("n_good"),
          col("n_tokens_clean"), col("main_chars"), col("strip_chars"),
          expr("(strip_chars - main_chars) * 1000000L div strip_chars")
            .as("boilerplate_ppm"))
    }),

    // The crawl ADMISSION gate, per-doc grain (q154's sibling — that
    // one reports, this one decides): dirty URL → canonicalize → host
    // verdict (longest-suffix rules, the stream-safe projection form)
    // → page extraction → encoding repair → clean-token floor →
    // URL-level keeper → one admitted/rejected row per doc with full
    // provenance. Everything is a map-side projection except the two
    // keyed steps a 100 TB run needs anyway: the canonical_url keeper
    // window (≙ the crawl store's dedup partitioning) and the doc_id
    // join of the extraction branch.
    // Runs over the edge corpus so every REJECTION reason is pinned:
    // URL-dup losers, blocked hosts, and keepers whose page extracts
    // below the token floor (empty/whitespace/short edge docs).
    "q164_crawl_admission" -> ((s, d) => {
      import graft.operators.{HostRules, TextNormalize, UrlCanon}
      val docs = Tables.documentsWithEdges(s, d)
      val q = expr("doc_id DIV 100")
      val t = col("doc_id") % 10
      val url = concat(
        when(q % 2 === 1, "HTTPS://").otherwise("https://"),
        when(q % 5 === 1, "www.").otherwise(""),
        when(col("doc_id") % 3 === 0, "cdn.")
          .when(col("doc_id") % 3 === 1, "ads.").otherwise(""),
        when(q % 5 === 3, upper(col("source"))).otherwise(col("source")),
        lit(".example.org"),
        when(q % 5 === 2, ":443").otherwise(""),
        lit("/p/"), t.cast("string"),
        when(q % 5 === 4, "/").otherwise(""),
        when(t % 4 === 1, "?utm_source=feed")
          .when(t % 4 === 2, "?b=2&a=1&utm_campaign=x")
          .when(t % 4 === 3, "?a=1&b=2").otherwise(""),
        when(q % 5 === 1, "#top").otherwise(""))
      val canon = docs.select(col("doc_id"), url.as("url"))
        .withColumn("canonical_url", UrlCanon.canonicalize(col("url")))
      val host = regexp_extract(col("canonical_url"), "^https?://([^/]*)", 1)
      val verdict = canon.select(
        Seq(col("doc_id"), col("canonical_url")) ++
          HostRules.longestSuffixMatchCols(host, NormalizeOps.crawlRules,
            default = "allow"): _*)
      val main = HtmlExtract.extractMain(
        HtmlExtract.syntheticHtml(docs, "doc_id", "text"), "doc_id", "html")
        .select(col("doc_id"),
          graft.functions.TextFunctions
            .tokenCount(TextNormalize.cleanText(col("main_text")))
            .as("n_tokens_clean"))
      val w = Window.partitionBy(col("canonical_url"))
      verdict.join(main, Seq("doc_id"))
        .withColumn("keeper_doc_id", min(col("doc_id")).over(w))
        .select(col("doc_id"), col("canonical_url"), col("matched_rule"),
          col("action"), col("n_tokens_clean"),
          (col("doc_id") === col("keeper_doc_id")).as("is_url_keeper"),
          (col("action") === "allow" &&
            col("doc_id") === col("keeper_doc_id") &&
            col("n_tokens_clean") >= 5L).as("admitted"))
    }),

    // The Common-Crawl-shaped INGEST capstone: record-framed archives
    // (q204's CrawlArchive fixture, %13 quarantine class included) →
    // partition-wise demux → per-record page extraction (q148/q149
    // chain) → clean-token floor (q152) → per-archive ingest report.
    // Quarantined records are COUNTED, never admitted and never
    // dropped — the report a 100 TB archive-fed run emits per crawl
    // dump. The oracle recomputes everything from `documents` without
    // touching bytes, so the archive round-trip must be invisible all
    // the way through the extraction stack, not just at q204's field
    // grain.
    "q206_archive_ingest_report" -> ((s, d) => {
      import graft.operators.TextNormalize
      import graft.sources.CrawlArchive
      val recs0 = Tables.load(s, d, "documents")
        .select(col("source"), col("doc_id"),
          when(col("doc_id") % 13 =!= 0,
            concat(lit("https://"), col("source"), lit(".example.org/d"),
              col("doc_id").cast("string"))).as("url"),
          concat(lit("2026-08-"),
            lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
            lit("T00:00:00Z")).as("fetch_ts"),
          when(col("doc_id") % 2 === 0, "text/html").otherwise("text/plain")
            .as("mime"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      val archives = CrawlArchive.encode(s, recs0, "source", "doc_id",
        "url", "fetch_ts", "mime", "payload")
      val recs = CrawlArchive.extract(s, archives, "archive", "bytes")
        .toDF()
        .select(
          concat(col("archive"), lit("#"), col("rec_idx").cast("string"))
            .as("rid"),
          col("archive"), col("status"),
          decode(col("body"), "UTF-8").as("text"))
        .localCheckpoint(true) // r15: fans out to extraction + final join
      val toks = HtmlExtract.extractMain(
          HtmlExtract.syntheticHtml(recs, "rid", "text"), "doc_id", "html")
        .select(col("doc_id").as("rid"),
          graft.functions.TextFunctions
            .tokenCount(TextNormalize.cleanText(col("main_text")))
            .as("n_tokens_clean"))
      recs.join(toks, Seq("rid"))
        .groupBy(col("archive"))
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("status") =!= "ok", 1L).otherwise(0L))
            .as("n_quarantined"),
          sum(when(col("status") === "ok" && col("n_tokens_clean") >= 5L,
            1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("status") === "ok" && col("n_tokens_clean") >= 5L,
            col("n_tokens_clean")).otherwise(0L)).as("tokens_admitted"))
    }),

    // HTTP response envelopes (VERDICT r11 #2): q206's fixture stores
    // mime in the ARCHIVE header; real WARC `response` records embed
    // the full HTTP status line + headers before the body, so here
    // every payload is a complete HTTP response and mime/charset/
    // admission truth comes from the ENVELOPE (HttpEnvelope.extract),
    // with the archive's own Content-Type a constant application/http.
    // Five classes pin the parse: %13 bare document (env `none`), %17
    // junk status line (env `malformed`, whole payload kept), %7 a
    // NON-2xx (404 — extraction runs, admission refuses) carrying a
    // duplicate Content-Type header (first-wins pinned), %5 a
    // charset-DECLARED class whose body is UTF-16BE — decoding it as
    // UTF-8 would mangle every token, so the token counts prove the
    // declared charset flowed through extraction — and the rest plain
    // 200s with mime split by %2. Admission = envelope ok ∧ 2xx ∧
    // text/* ∧ clean-token floor.
    "q210_http_envelope_ingest" -> ((s, d) => {
      import graft.operators.TextNormalize
      import graft.sources.{CrawlArchive, HttpEnvelope}
      val txt = coalesce(col("text"), lit(""))
      def env(statusLine: String, ct: org.apache.spark.sql.Column,
              extraHdr: String = "") =
        encode(concat(lit(statusLine + "\r\nContent-Type: "), ct,
          lit("\r\n" + extraHdr + "\r\n")), "UTF-8")
      val recs0 = Tables.load(s, d, "documents")
        .select(col("source"), col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.org/d"),
            col("doc_id").cast("string")).as("url"),
          lit("2026-08-01T00:00:00Z").as("fetch_ts"),
          lit("application/http").as("mime"),
          when(col("doc_id") % 13 === 0, encode(txt, "UTF-8"))
            .when(col("doc_id") % 17 === 0,
              encode(concat(lit("HTTP/x "), txt), "UTF-8"))
            .when(col("doc_id") % 7 === 0,
              concat(env("HTTP/1.1 404 Not Found", lit("text/html"),
                  extraHdr = "Content-Type: text/plain\r\n"),
                encode(txt, "UTF-8")))
            .when(col("doc_id") % 5 === 0,
              concat(env("HTTP/1.1 200 OK",
                  lit("text/html; charset=utf-16be")),
                encode(txt, "UTF-16BE")))
            .otherwise(
              concat(env("HTTP/1.1 200 OK",
                  when(col("doc_id") % 2 === 0, "text/html")
                    .otherwise("text/plain")),
                encode(txt, "UTF-8"))).as("payload"))
      val archives = CrawlArchive.encode(s, recs0, "source", "doc_id",
        "url", "fetch_ts", "mime", "payload")
      val recs = CrawlArchive.extract(s, archives, "archive", "bytes")
        .toDF()
        .select(
          concat(col("archive"), lit("#"), col("rec_idx").cast("string"))
            .as("rid"),
          col("archive"), col("rec_idx"), col("body"))
        .localCheckpoint(true) // r15: fans out to envelope + final join
      val envd = HttpEnvelope.extract(s, recs, "rid", "body").toDF()
        .select(col("id").as("rid"), col("env_status"), col("http_status"),
          col("content_type"), col("charset"), col("body_text"))
        .localCheckpoint(true) // r15: fans out to extraction + final join
      val toks = HtmlExtract.extractMain(
          HtmlExtract.syntheticHtml(envd, "rid", "body_text"),
          "doc_id", "html")
        .select(col("doc_id").as("rid"),
          graft.functions.TextFunctions
            .tokenCount(TextNormalize.cleanText(col("main_text")))
            .as("n_tokens_clean"))
      recs.select(col("rid"), col("archive"), col("rec_idx"))
        .join(envd, Seq("rid")).join(toks, Seq("rid"))
        .select(col("archive"), col("rec_idx"), col("env_status"),
          col("http_status"), col("content_type"), col("charset"),
          col("n_tokens_clean"),
          (col("env_status") === "ok" &&
            col("http_status").between(200, 299) &&
            col("content_type").startsWith("text/") &&
            col("n_tokens_clean") >= 5L).as("admitted"))
    }),

    // Body codings (q210's sibling — that one pins envelope FRAMING,
    // this one pins what's INSIDE the body): Transfer-Encoding chunked
    // removal, Content-Encoding gzip/deflate inflate, and the
    // quarantine classes for each. Eight classes by doc_id arithmetic
    // (first match wins, oracle CASE mirrors the order): %11 broken
    // chunk framing (`chunked_error`, content decode SKIPPED), %13
    // chunked-over-gzip (both layers removed in wire order), %3
    // chunked, %5 gzip, %7 truncated gzip stream (`gzip_error`), %17
    // Content-Encoding `br` (`br_unsupported` — raw kept, never
    // guessed; br/zstd priced apart from the generic bucket, r13 #4),
    // %19 zlib deflate, else plain. Decoding must be INVISIBLE: clean
    // classes' token counts hash against the original text; coding-
    // error rows emit NULL tokens (you don't extract from garbage) and
    // never admit. Fixture payloads are built row-wise in a typed map
    // — chunk framing and gzip members can't be authored in SQL — but
    // the operator under test is the partition-wise envelope decode.
    "q211_body_codings" -> ((s, d) => {
      import graft.operators.TextNormalize
      import graft.sources.HttpEnvelope
      import s.implicits._
      val payloads = Tables.load(s, d, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val u8 = text.getBytes("UTF-8")
          val ct = if (id % 2 == 0) "text/html" else "text/plain"
          val ctH = s"Content-Type: $ct\r\n"
          val body: (String, Array[Byte]) =
            if (id % 11 == 0)
              (ctH + "Transfer-Encoding: chunked\r\n",
                "zz\r\n".getBytes("ISO-8859-1") ++ u8)
            else if (id % 13 == 0)
              (ctH + "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
                chunkB(gzB(u8), 64))
            else if (id % 3 == 0)
              (ctH + "Transfer-Encoding: chunked\r\n", chunkB(u8, 64))
            else if (id % 5 == 0) (ctH + "Content-Encoding: gzip\r\n", gzB(u8))
            else if (id % 7 == 0) {
              val g = gzB(u8)
              (ctH + "Content-Encoding: gzip\r\n", g.take(g.length / 2))
            } else if (id % 17 == 0)
              (ctH + "Content-Encoding: br\r\n", u8)
            else if (id % 19 == 0)
              (ctH + "Content-Encoding: deflate\r\n", deflB(u8))
            else (ctH, u8)
          (id, httpB(body._1, body._2))
        }.toDF("doc_id", "payload")
      val envd = HttpEnvelope.extract(s, payloads, "doc_id", "payload").toDF()
        .localCheckpoint(true) // r15: fans out to extraction + final join
      val clean = col("transfer_coding").isin("none", "chunked") &&
        col("content_coding").isin("none", "gzip", "deflate")
      val toks = HtmlExtract.extractMain(
          HtmlExtract.syntheticHtml(envd, "id", "body_text"), "doc_id", "html")
        .select(col("doc_id").as("id"),
          graft.functions.TextFunctions
            .tokenCount(TextNormalize.cleanText(col("main_text")))
            .as("toks"))
      envd.join(toks, Seq("id"))
        .select(col("id").cast("long").as("doc_id"), col("env_status"),
          col("http_status"), col("content_type"),
          col("transfer_coding"), col("content_coding"),
          when(clean, col("toks")).as("n_tokens_clean"),
          coalesce(col("env_status") === "ok" &&
            col("http_status").between(200, 299) &&
            col("content_type").startsWith("text/") &&
            when(clean, col("toks")) >= 5L, lit(false)).as("admitted"))
    }),

    // Charset RESOLUTION precedence (header > BOM > meta prescan >
    // default — the HTML5 rule), pinned by decoy-shred classes: every
    // decoy declares a charset that would shred token counts if the
    // resolution order were wrong. %13 BOM-beats-meta (UTF-8 BOM +
    // a utf-16be decoy meta tag), %11 meta past the 1024-byte prescan
    // window (1100 spaces then the decoy), %7 header-beats-meta (real
    // UTF-16BE body + a utf-8 decoy meta), %5 honest meta (source
    // `meta`), %3 meta tag in a text/PLAIN body (prescan must not run
    // — it only exists for HTML), %2 UTF-16LE BOM (stripped from
    // body_text), else default. All classes decode round-trip, so the
    // whole extraction chain hashes against text recomputed by class
    // arithmetic.
    "q212_charset_resolution" -> ((s, d) => {
      import graft.operators.TextNormalize
      import graft.sources.HttpEnvelope
      import s.implicits._
      val m16 = "<meta charset=utf-16be>"
      val m8 = "<meta charset=utf-8>"
      val payloads = Tables.load(s, d, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val html = "Content-Type: text/html\r\n"
          val p: Array[Byte] =
            if (id % 13 == 0) httpB(html,
              Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
                (m16 + text).getBytes("UTF-8"))
            else if (id % 11 == 0) httpB(html,
              (" " * 1100 + m16 + text).getBytes("UTF-8"))
            else if (id % 7 == 0) httpB(
              "Content-Type: text/html; charset=utf-16be\r\n",
              (m8 + text).getBytes("UTF-16BE"))
            else if (id % 5 == 0) httpB(html, (m8 + text).getBytes("UTF-8"))
            else if (id % 3 == 0) httpB("Content-Type: text/plain\r\n",
              (m16 + text).getBytes("UTF-8"))
            else if (id % 2 == 0) httpB(html,
              Array(0xff.toByte, 0xfe.toByte) ++ text.getBytes("UTF-16LE"))
            else httpB(html, text.getBytes("UTF-8"))
          (id, p)
        }.toDF("doc_id", "payload")
      val envd = HttpEnvelope.extract(s, payloads, "doc_id", "payload").toDF()
        .localCheckpoint(true) // r15: fans out to extraction + final join
      val toks = HtmlExtract.extractMain(
          HtmlExtract.syntheticHtml(envd, "id", "body_text"), "doc_id", "html")
        .select(col("doc_id").as("id"),
          graft.functions.TextFunctions
            .tokenCount(TextNormalize.cleanText(col("main_text")))
            .as("n_tokens_clean"))
      envd.join(toks, Seq("id"))
        .select(col("id").cast("long").as("doc_id"), col("env_status"),
          col("charset"), col("charset_used"), col("charset_source"),
          col("content_type"), col("n_tokens_clean"),
          (col("env_status") === "ok" &&
            col("http_status").between(200, 299) &&
            col("content_type").startsWith("text/") &&
            col("n_tokens_clean") >= 5L).as("admitted"))
    }),

    // Content-Length framing (q210/q211/q212's fourth sibling): the
    // header frames the wire body for non-chunked messages. Six
    // classes: %13 exact, %7 declared < available (stored captures
    // carry connection junk past the entity — the junk would ADD a
    // token if not trimmed, so token counts pin the cut), %5 declared
    // > available (`short_body`: capture lost bytes; kept whole,
    // admission refuses), %3 non-numeric (`invalid`), %2 chunked WITH
    // a declared length (`superseded` — RFC 9112 §6.3 rule 3; the
    // declared value is smaller than the chunk-framed wire body, so
    // an implementation that applied it anyway would cut the terminal
    // chunk and break the hash), else none. All-column fixture — no
    // typed map needed.
    "q218_content_length" -> ((s, d) => {
      import graft.operators.TextNormalize
      import graft.sources.HttpEnvelope
      val txt = coalesce(col("text"), lit(""))
      val bodyB = encode(txt, "UTF-8")
      val blen = length(bodyB)
      val junk = encode(lit(" ###trailing-capture-junk###"), "UTF-8")
      val base = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
      def hdr(extra: org.apache.spark.sql.Column) =
        encode(concat(lit(base), extra, lit("\r\n")), "UTF-8")
      def clH(v: org.apache.spark.sql.Column) =
        concat(lit("Content-Length: "), v.cast("string"), lit("\r\n"))
      val payload =
        when(col("doc_id") % 13 === 0, concat(hdr(clH(blen)), bodyB))
          .when(col("doc_id") % 7 === 0,
            concat(hdr(clH(blen)), bodyB, junk))
          .when(col("doc_id") % 5 === 0,
            concat(hdr(clH(blen + 1000)), bodyB))
          .when(col("doc_id") % 3 === 0,
            concat(hdr(lit("Content-Length: xyz\r\n")), bodyB))
          .when(col("doc_id") % 2 === 0,
            concat(hdr(concat(lit("Transfer-Encoding: chunked\r\n"),
                clH(blen))),
              encode(concat(hex(blen), lit("\r\n")), "UTF-8"), bodyB,
              encode(lit("\r\n0\r\n\r\n"), "UTF-8")))
          .otherwise(concat(hdr(lit("")), bodyB))
      val recs = Tables.load(s, d, "documents")
        .select(col("doc_id"), payload.as("payload"))
      val envd = HttpEnvelope.extract(s, recs, "doc_id", "payload").toDF()
        .localCheckpoint(true) // r15: fans out to extraction + final join
      val toks = HtmlExtract.extractMain(
          HtmlExtract.syntheticHtml(envd, "id", "body_text"), "doc_id", "html")
        .select(col("doc_id").as("id"),
          graft.functions.TextFunctions
            .tokenCount(TextNormalize.cleanText(col("main_text")))
            .as("n_tokens_clean"))
      envd.join(toks, Seq("id"))
        .select(col("id").cast("long").as("doc_id"), col("env_status"),
          col("length_status"), col("transfer_coding"),
          col("n_tokens_clean"),
          (col("env_status") === "ok" &&
            col("http_status").between(200, 299) &&
            col("content_type").startsWith("text/") &&
            col("n_tokens_clean") >= 5L &&
            !col("length_status").isin("invalid", "short_body"))
            .as("admitted"))
    }),

    // Coding CHAINS (q211's extension — RFC 9110 §8.4 multi-valued
    // lists): Content-Encoding chains decode right-to-left (the
    // last-listed coding was applied last, so it comes off first),
    // Transfer-Encoding gzip-over-chunked de-frames then inflates,
    // and any list that can't be FULLY decoded quarantines
    // (`unsupported`) instead of passing compressed bytes off as
    // text. Classes by doc_id arithmetic (first match wins, oracle
    // CASE mirrors the order): %13 TE `gzip, chunked` (both layers
    // removed → `gzip+chunked`), %11 chunked-not-last (`unsupported`
    // — RFC 9112 §6.1 requires chunked last), %7 TE `br, chunked`
    // (`br_unsupported` — undecodable member, priced as brotli loss;
    // the CE header must NOT be applied past the defect), %5 CE `gzip, gzip` (double inflate →
    // `gzip+gzip`), %3 CE `deflate, gzip` (gzip off first →
    // `deflate+gzip`), %2 TE `gzip, chunked` with a broken inner
    // gzip (valid de-chunk, then a stream defect → `transfer_error`,
    // framed bytes kept), else plain. Quarantined rows emit NULL
    // tokens and never admit.
    "q222_coding_chains" -> ((s, d) => {
      import graft.operators.TextNormalize
      import graft.sources.HttpEnvelope
      import s.implicits._
      val payloads = Tables.load(s, d, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val u8 = text.getBytes("UTF-8")
          val ctH = "Content-Type: text/html\r\n"
          val body: (String, Array[Byte]) =
            if (id % 13 == 0)
              (ctH + "Transfer-Encoding: gzip, chunked\r\n",
                chunkB(gzB(u8), 64))
            else if (id % 11 == 0)
              (ctH + "Transfer-Encoding: chunked, gzip\r\n" +
                "Content-Encoding: gzip\r\n", u8)
            else if (id % 7 == 0)
              (ctH + "Transfer-Encoding: br, chunked\r\n" +
                "Content-Encoding: gzip\r\n", u8)
            else if (id % 5 == 0)
              (ctH + "Content-Encoding: gzip, gzip\r\n", gzB(gzB(u8)))
            else if (id % 3 == 0)
              (ctH + "Content-Encoding: deflate, gzip\r\n",
                gzB(deflB(u8)))
            else if (id % 2 == 0) {
              val g = gzB(u8)
              (ctH + "Transfer-Encoding: gzip, chunked\r\n",
                chunkB(g.take(g.length / 2), 64))
            } else (ctH, u8)
          (id, httpB(body._1, body._2))
        }.toDF("doc_id", "payload")
      val envd = HttpEnvelope.extract(s, payloads, "doc_id", "payload").toDF()
        .localCheckpoint(true) // r15: fans out to extraction + final join
      val clean =
        col("transfer_coding").isin("none", "chunked", "gzip+chunked") &&
          col("content_coding")
            .isin("none", "gzip", "deflate", "gzip+gzip", "deflate+gzip")
      val toks = HtmlExtract.extractMain(
          HtmlExtract.syntheticHtml(envd, "id", "body_text"), "doc_id", "html")
        .select(col("doc_id").as("id"),
          graft.functions.TextFunctions
            .tokenCount(TextNormalize.cleanText(col("main_text")))
            .as("toks"))
      envd.join(toks, Seq("id"))
        .select(col("id").cast("long").as("doc_id"), col("env_status"),
          col("http_status"), col("content_type"),
          col("transfer_coding"), col("content_coding"),
          when(clean, col("toks")).as("n_tokens_clean"),
          coalesce(col("env_status") === "ok" &&
            col("http_status").between(200, 299) &&
            col("content_type").startsWith("text/") &&
            when(clean, col("toks")) >= 5L, lit(false)).as("admitted"))
    }),

    // CODING-LOSS REPORT (r13 #4's payoff): the modern-web loss share
    // priced per class — brotli and zstd quarantines are first-class
    // report rows, not folded into one `unsupported` cell. Classes by
    // doc_id arithmetic (first match wins, oracle CASE mirrors):
    // %13 CE `br` (`br_unsupported` by token), %11 CE `zstd` with a
    // REAL zstd frame (r14→r15: zstd now decodes via zstd-jni, so
    // these rows price `clean` — the report shrank exactly by the
    // declared-zstd share), %7 a MISLABELED token (`x-custom`) over
    // zstd-magic bytes (`zstd_unsupported` by sniff — the magic is
    // the signal but the token forbids a guess), %5 TE `br, chunked`
    // (transfer-level `br_unsupported`), %3 CE `compress` (generic
    // `unsupported`), %2 CE gzip (decodes — `clean`), else plain.
    // Report: per (source, loss_class) doc count + exact ppm share
    // of the source.
    "q226_coding_loss_report" -> ((s, d) => {
      import graft.sources.HttpEnvelope
      import s.implicits._
      val payloads = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"),
          coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String, String)]
        .map { case (id, src, text) =>
          val u8 = text.getBytes("UTF-8")
          val ctH = "Content-Type: text/html\r\n"
          val zs = Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte)
          val body: (String, Array[Byte]) =
            if (id % 13 == 0) (ctH + "Content-Encoding: br\r\n", u8)
            else if (id % 11 == 0)
              (ctH + "Content-Encoding: zstd\r\n", zstdB(u8))
            else if (id % 7 == 0)
              (ctH + "Content-Encoding: x-custom\r\n", zs ++ u8)
            else if (id % 5 == 0)
              (ctH + "Transfer-Encoding: br, chunked\r\n", chunkB(u8, 64))
            else if (id % 3 == 0)
              (ctH + "Content-Encoding: compress\r\n", u8)
            else if (id % 2 == 0)
              (ctH + "Content-Encoding: gzip\r\n", gzB(u8))
            else (ctH, u8)
          (id, src, httpB(body._1, body._2))
        }.toDF("doc_id", "source", "payload")
      val envd = HttpEnvelope.extract(s,
          payloads.select(col("doc_id"), col("payload")),
          "doc_id", "payload").toDF()
        .join(payloads.select(col("doc_id").cast("string").as("id"),
          col("source")), Seq("id"))
      val lossClass =
        when(col("transfer_coding") === "br_unsupported" ||
          col("content_coding") === "br_unsupported", "br")
        .when(col("transfer_coding") === "zstd_unsupported" ||
          col("content_coding") === "zstd_unsupported", "zstd")
        .when(col("transfer_coding") === "unsupported" ||
          col("content_coding") === "unsupported", "other")
        .otherwise("clean")
      val cls = envd.groupBy(col("source"), lossClass.as("loss_class"))
        .agg(count(lit(1)).as("n_docs"))
        .localCheckpoint(true) // r15: fans out to totals + final join
      val tot = cls.groupBy(col("source"))
        .agg(sum(col("n_docs")).as("_tot"))
      cls.join(broadcast(tot), Seq("source"))
        .select(col("source"), col("loss_class"), col("n_docs"),
          expr("n_docs * 1000000L div _tot").as("share_ppm"))
    }),

    // ZSTD CODING CHAINS DECODED FOR REAL (r14 VERDICT #2): every
    // decodable class's body is pinned by md5 against the ORIGINAL
    // text — a decoder that "succeeds" with wrong bytes can't hide
    // behind labels. Classes by doc_id arithmetic (first match wins,
    // oracle CASE mirrors): %13 CE `zstd` (real frame → decodes),
    // %11 TE `zstd, chunked` (de-chunk then zstd → `zstd+chunked`),
    // %7 CE `zstd, gzip` (right-to-left: gzip off first, then zstd →
    // `zstd+gzip`), %5 CE `zstd` over a TRUNCATED frame
    // (`zstd_error`, raw kept, NULL hash), %3 CE `br` (still
    // `br_unsupported` — no decoder), %2 CE gzip (`gzip`), else
    // plain. Fixtures encode with the same zstd-jni lib the decoder
    // uses; the ORACLE hashes the source text directly, so the md5
    // column proves byte-exact decode on every green row.
    "q237_zstd_chain" -> ((s, d) => {
      import graft.sources.HttpEnvelope
      import s.implicits._
      val payloads = Tables.load(s, d, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val u8 = text.getBytes("UTF-8")
          val ctH = "Content-Type: text/html\r\n"
          val body: (String, Array[Byte]) =
            if (id % 13 == 0) (ctH + "Content-Encoding: zstd\r\n", zstdB(u8))
            else if (id % 11 == 0)
              (ctH + "Transfer-Encoding: zstd, chunked\r\n",
                chunkB(zstdB(u8), 64))
            else if (id % 7 == 0)
              (ctH + "Content-Encoding: zstd, gzip\r\n", gzB(zstdB(u8)))
            else if (id % 5 == 0) {
              val z = zstdB(u8)
              (ctH + "Content-Encoding: zstd\r\n", z.take(z.length / 2))
            } else if (id % 3 == 0) (ctH + "Content-Encoding: br\r\n", u8)
            else if (id % 2 == 0) (ctH + "Content-Encoding: gzip\r\n", gzB(u8))
            else (ctH, u8)
          (id, httpB(body._1, body._2))
        }.toDF("doc_id", "payload")
      val envd = HttpEnvelope.extract(s, payloads, "doc_id", "payload").toDF()
      val clean =
        col("transfer_coding").isin("none", "zstd+chunked") &&
          col("content_coding").isin("none", "zstd", "zstd+gzip", "gzip")
      envd.select(col("id").cast("long").as("doc_id"),
        col("transfer_coding"), col("content_coding"),
        when(clean, md5(col("body"))).as("text_md5"),
        when(clean, length(col("body")).cast("long")).as("body_len"))
    }),

    // The Common-Crawl-shaped chain END TO END on the real format:
    // q219's WARC fixture → extractWarc (member demux + quarantine) →
    // HttpEnvelope on ok `response` payloads (status/mime truth) →
    // HtmlExtract main-text → clean-token admission → the q206-style
    // per-archive ingest report, UNCHANGED on top of the new read
    // mode. The oracle recomposes every count from class arithmetic +
    // the independent DuckDB extraction chain — so a drift anywhere
    // in demux, envelope, extraction or admission shifts a report
    // cell.
    "q223_warc_ingest_report" -> ((s, d) => {
      import graft.operators.TextNormalize
      import graft.sources.{CrawlArchive, HttpEnvelope}
      val w = CrawlArchive.extractWarc(s, NormalizeOps.warcArchives(s, d),
          "archive", "bytes").toDF()
        .withColumn("eid",
          concat(col("archive"), lit("#"), col("rec_idx").cast("string")))
        .localCheckpoint(true) // r15: fans out to envelope + final join
      val env = HttpEnvelope.extract(s,
          w.filter(col("status") === "ok" && col("rec_type") === "response")
            .select(col("eid"), col("body")), "eid", "body").toDF()
        .localCheckpoint(true) // r15: fans out to extraction + scored
      val toks = HtmlExtract.extractMain(
          HtmlExtract.syntheticHtml(env, "id", "body_text"),
          "doc_id", "html")
        .select(col("doc_id").as("id"),
          graft.functions.TextFunctions
            .tokenCount(TextNormalize.cleanText(col("main_text")))
            .as("toks"))
      val scored = env.select(col("id"), col("http_status"),
          col("content_type"))
        .join(toks, Seq("id"))
        .select(col("id").as("eid"),
          (col("http_status").between(200, 299) &&
            col("content_type").startsWith("text/") &&
            col("toks") >= 5L).as("admitted"),
          col("toks"))
      w.join(scored, Seq("eid"), "left")
        .groupBy(col("archive"))
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("status") =!= "ok", 1L).otherwise(0L))
            .as("n_quarantined"),
          sum(when(col("rec_type") === "response" &&
            col("status") === "ok", 1L).otherwise(0L)).as("n_responses"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("admitted"), col("toks")).otherwise(0L))
            .as("tokens_admitted"))
    })
  )

  // ---- q211/q212 fixture byte-builders (row-wise, fixture-only) ------

  /** `HTTP/1.1 200 OK` + the given header lines + blank line + body. */
  private def httpB(headers: String, body: Array[Byte]): Array[Byte] =
    ("HTTP/1.1 200 OK\r\n" + headers + "\r\n").getBytes("ISO-8859-1") ++ body

  /** RFC 9112 chunk framing at a fixed chunk size + terminal chunk. */
  private def chunkB(b: Array[Byte], n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < b.length) {
      val len = math.min(n, b.length - i)
      bos.write(s"${len.toHexString}\r\n".getBytes("ISO-8859-1"))
      bos.write(b, i, len)
      bos.write("\r\n".getBytes("ISO-8859-1"))
      i += len
    }
    bos.write("0\r\n\r\n".getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  /** Deterministic gzip member (Java writes MTIME=0 — stable bytes). */
  private def gzB(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  /** Deterministic zstd frame (level 3 — fixed lib, stable bytes). */
  private def zstdB(raw: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(raw, 3)

  /** zlib-wrapped deflate (the RFC's Content-Encoding: deflate). */
  private def deflB(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

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
  // trim(x, ' ') NOT bare trim: DuckDB's default trim strips unicode
  // spaces (NBSP included) where Spark's strips only ' ' — a block
  // whose text starts/ends with NBSP (q154's dirty corpus) diverged
  private def blockTextSql(x: String): String =
    s"""trim(regexp_replace(${decodeSql(
         s"regexp_replace($x, ${sqlLit(HtmlExtract.TagRe)}, ' ', 'g')")},
         '\\s+', ' ', 'g'), ' ')"""

  /** The shared CTE chain: source docs (CTE `srcdocs(doc_id, text)`,
    * defined by the caller) → synthetic page → non-content drop →
    * fragments (ordinal-indexed, mirroring posexplode over a split
    * that KEEPS empty strings) → classified blocks. */
  private def blocksChainSql: String = {
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
    s"""h AS (SELECT doc_id, $htmlExpr AS html FROM srcdocs),
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
      s"""WITH docs_e AS (${Tables.documentsWithEdgesSql}),
          srcdocs AS (SELECT doc_id, text FROM docs_e),
          $blocksChainSql
          SELECT doc_id, block_idx, block_text, n_chars, n_words,
                 link_chars, link_density, is_good
          FROM blk""",

    "q149_html_extract" -> {
      val stripExpr = blockTextSql("h2")
      s"""WITH docs_e AS (${Tables.documentsWithEdgesSql}),
          srcdocs AS (SELECT doc_id, text FROM docs_e),
          $blocksChainSql,
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
    },

    "q154_ingest_report" -> {
      val stripExpr = blockTextSql("h2")
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH docs_e AS (${Tables.documentsWithEdgesSql}),
          srcdocs AS (SELECT doc_id,
                             ${sqlLit(NormalizeOps.DirtyPrefix)} || text AS text
                      FROM docs_e),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         CAST(count(*) AS BIGINT) AS n_blocks,
                         CAST(sum(CASE WHEN is_good THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_good,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          st AS (SELECT doc_id, $stripExpr AS stext FROM nc),
          perdoc AS (SELECT st.doc_id,
                            coalesce(a.n_blocks, 0) AS n_blocks,
                            coalesce(a.n_good, 0) AS n_good,
                            $cleanTok AS n_tokens_clean,
                            CAST(length(coalesce(a.main_text, '')) AS BIGINT)
                              AS main_chars,
                            CAST(length(st.stext) AS BIGINT) AS strip_chars
                     FROM st LEFT JOIN agg a USING (doc_id)),
          rep AS (SELECT d.source,
                         CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(p.n_blocks) AS BIGINT) AS n_blocks,
                         CAST(sum(p.n_good) AS BIGINT) AS n_good,
                         CAST(sum(p.n_tokens_clean) AS BIGINT)
                           AS n_tokens_clean,
                         CAST(sum(p.main_chars) AS BIGINT) AS main_chars,
                         CAST(sum(p.strip_chars) AS BIGINT) AS strip_chars
                  FROM perdoc p JOIN docs_e d USING (doc_id)
                  GROUP BY d.source)
          SELECT source, n_docs, n_blocks, n_good, n_tokens_clean,
                 main_chars, strip_chars,
                 (strip_chars - main_chars) * 1000000 // strip_chars
                   AS boilerplate_ppm
          FROM rep"""
    },

    // The admission capstone composes the FACTORED per-family chains
    // verbatim: urlCanonChainSql (q159), hostRulesChainSql (q160),
    // blocksChainSql + reassembly (q149), cleanSql (q152) — so a
    // regression in any stage breaks BOTH its own oracle and this one.
    "q164_crawl_admission" -> {
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH docs_e AS (${Tables.documentsWithEdgesSql}),
          ud AS (
            SELECT doc_id,
              (CASE WHEN (doc_id // 100) % 2 = 1
                    THEN 'HTTPS://' ELSE 'https://' END)
              || (CASE WHEN (doc_id // 100) % 5 = 1 THEN 'www.' ELSE '' END)
              || (CASE doc_id % 3 WHEN 0 THEN 'cdn.' WHEN 1 THEN 'ads.'
                       ELSE '' END)
              || (CASE WHEN (doc_id // 100) % 5 = 3 THEN upper(source)
                       ELSE source END)
              || '.example.org'
              || (CASE WHEN (doc_id // 100) % 5 = 2 THEN ':443' ELSE '' END)
              || '/p/' || CAST(doc_id % 10 AS VARCHAR)
              || (CASE WHEN (doc_id // 100) % 5 = 4 THEN '/' ELSE '' END)
              || (CASE (doc_id % 10) % 4
                    WHEN 1 THEN '?utm_source=feed'
                    WHEN 2 THEN '?b=2&a=1&utm_campaign=x'
                    WHEN 3 THEN '?a=1&b=2' ELSE '' END)
              || (CASE WHEN (doc_id // 100) % 5 = 1 THEN '#top' ELSE '' END)
                AS url
            FROM docs_e),
          ${NormalizeOps.urlCanonChainSql},
          hd AS (SELECT doc_id,
                   regexp_extract(canonical_url, '^https?://([^/]*)', 1)
                     AS host
                 FROM c),
          ${NormalizeOps.hostRulesChainSql(NormalizeOps.crawlRules)},
          srcdocs AS (SELECT doc_id, text FROM docs_e),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          tok AS (SELECT sd.doc_id, $cleanTok AS n_tokens_clean
                  FROM srcdocs sd LEFT JOIN agg a USING (doc_id)),
          kw AS (SELECT c.doc_id, c.canonical_url,
                        min(c.doc_id) OVER (PARTITION BY c.canonical_url)
                          AS keeper_doc_id
                 FROM c)
          SELECT kw.doc_id, kw.canonical_url, hb.matched_rule,
                 coalesce(hb.action, 'allow') AS action,
                 tok.n_tokens_clean,
                 kw.doc_id = kw.keeper_doc_id AS is_url_keeper,
                 (coalesce(hb.action, 'allow') = 'allow'
                  AND kw.doc_id = kw.keeper_doc_id
                  AND tok.n_tokens_clean >= 5) AS admitted
          FROM kw
          LEFT JOIN hb USING (doc_id)
          JOIN tok USING (doc_id)"""
    },

    // The archive-fed report recomputed WITHOUT the container: the
    // q149 extraction chain + q152 clean tokens straight over
    // `documents`, with the %13 quarantine class as a CASE — any
    // demux defect that survives q204's field grain (payload mangled
    // in a way that changes extraction, a record misattributed to the
    // wrong archive) breaks this hash.
    "q206_archive_ingest_report" -> {
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH srcdocs AS (SELECT doc_id, coalesce(text, '') AS text
                           FROM documents),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          tok AS (SELECT sd.doc_id, $cleanTok AS n_tokens_clean
                  FROM srcdocs sd LEFT JOIN agg a USING (doc_id)),
          j AS (SELECT d.source AS archive,
                       CASE WHEN d.doc_id % 13 = 0 THEN 'corrupt'
                            ELSE 'ok' END AS status,
                       t.n_tokens_clean
                FROM documents d JOIN tok t USING (doc_id))
          SELECT archive,
                 CAST(count(*) AS BIGINT) AS n_records,
                 CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_ok,
                 CAST(sum(CASE WHEN status <> 'ok' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_quarantined,
                 CAST(sum(CASE WHEN status = 'ok'
                               AND n_tokens_clean >= 5 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_admitted,
                 CAST(sum(CASE WHEN status = 'ok' AND n_tokens_clean >= 5
                               THEN n_tokens_clean ELSE 0 END)
                      AS BIGINT) AS tokens_admitted
          FROM j GROUP BY archive"""
    },

    // Envelope-aware ingest recomputed WITHOUT the container or the
    // envelope bytes: every field derives from the class arithmetic
    // and the extraction chain over the ORIGINAL text — so envelope
    // framing, the duplicate-header first-wins rule, and the UTF-16BE
    // declared-charset decode must all be invisible; a body decoded
    // with the wrong charset would shred every token count.
    "q210_http_envelope_ingest" -> {
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH src AS (SELECT doc_id, source,
               CASE WHEN doc_id % 13 = 0 THEN 'none'
                    WHEN doc_id % 17 = 0 THEN 'malformed'
                    ELSE 'ok' END AS env_status,
               CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                    WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS http_status,
               CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                    WHEN doc_id % 7 = 0 THEN 'text/html'
                    WHEN doc_id % 5 = 0 THEN 'text/html'
                    WHEN doc_id % 2 = 0 THEN 'text/html'
                    ELSE 'text/plain' END AS content_type,
               CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0
                      OR doc_id % 7 = 0 THEN NULL
                    WHEN doc_id % 5 = 0 THEN 'utf-16be'
                    ELSE NULL END AS charset,
               CASE WHEN doc_id % 13 = 0 THEN coalesce(text, '')
                    WHEN doc_id % 17 = 0 THEN 'HTTP/x ' || coalesce(text, '')
                    ELSE coalesce(text, '') END AS text
             FROM documents),
          srcdocs AS (SELECT doc_id, text FROM src),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          tok AS (SELECT sd.doc_id, $cleanTok AS n_tokens_clean
                  FROM srcdocs sd LEFT JOIN agg a USING (doc_id))
          SELECT s.source AS archive,
                 CAST(row_number() OVER (PARTITION BY s.source
                                         ORDER BY s.doc_id) - 1 AS BIGINT)
                   AS rec_idx,
                 s.env_status,
                 CAST(s.http_status AS BIGINT) AS http_status,
                 s.content_type, s.charset, t.n_tokens_clean,
                 (s.env_status = 'ok'
                  AND s.http_status BETWEEN 200 AND 299
                  AND s.content_type LIKE 'text/%'
                  AND t.n_tokens_clean >= 5) AS admitted
          FROM src s JOIN tok t USING (doc_id)"""
    },

    // Body codings recomputed WITHOUT any bytes: coding labels from
    // the class arithmetic (CASE order mirrors the Spark when-chain
    // exactly), token counts from the ORIGINAL text for clean classes
    // — so chunk-framing removal and gzip/deflate inflation must be
    // invisible — and NULL for coding-error classes on both engines.
    "q211_body_codings" -> {
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH src AS (SELECT doc_id, coalesce(text, '') AS text,
               CASE WHEN doc_id % 11 = 0 THEN 'chunked_error'
                    WHEN doc_id % 13 = 0 THEN 'chunked'
                    WHEN doc_id % 3 = 0 THEN 'chunked'
                    ELSE 'none' END AS transfer_coding,
               CASE WHEN doc_id % 11 = 0 THEN 'skipped'
                    WHEN doc_id % 13 = 0 THEN 'gzip'
                    WHEN doc_id % 3 = 0 THEN 'none'
                    WHEN doc_id % 5 = 0 THEN 'gzip'
                    WHEN doc_id % 7 = 0 THEN 'gzip_error'
                    WHEN doc_id % 17 = 0 THEN 'br_unsupported'
                    WHEN doc_id % 19 = 0 THEN 'deflate'
                    ELSE 'none' END AS content_coding,
               CASE WHEN doc_id % 2 = 0 THEN 'text/html'
                    ELSE 'text/plain' END AS content_type
             FROM documents),
          srcdocs AS (SELECT doc_id, text FROM src),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          tok AS (SELECT sd.doc_id, $cleanTok AS n_tokens_clean
                  FROM srcdocs sd LEFT JOIN agg a USING (doc_id))
          SELECT s.doc_id, 'ok' AS env_status,
                 CAST(200 AS BIGINT) AS http_status, s.content_type,
                 s.transfer_coding, s.content_coding,
                 CASE WHEN s.transfer_coding IN ('none', 'chunked')
                       AND s.content_coding IN ('none', 'gzip', 'deflate')
                      THEN t.n_tokens_clean END AS n_tokens_clean,
                 coalesce(s.content_type LIKE 'text/%'
                   AND CASE WHEN s.transfer_coding IN ('none', 'chunked')
                             AND s.content_coding
                                 IN ('none', 'gzip', 'deflate')
                            THEN t.n_tokens_clean END >= 5,
                   false) AS admitted
          FROM src s JOIN tok t USING (doc_id)"""
    },

    // Charset resolution recomputed from class arithmetic: body_text
    // per class (decoy meta tags included — they flow INTO extraction
    // and get tag-stripped there), charset_used/charset_source by the
    // precedence rule. A wrong resolution order on the Spark side
    // decodes a decoy charset and shreds every token count.
    "q212_charset_resolution" -> {
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH src AS (SELECT doc_id,
               CASE WHEN doc_id % 13 = 0
                      THEN '<meta charset=utf-16be>' || coalesce(text, '')
                    WHEN doc_id % 11 = 0
                      THEN repeat(' ', 1100) || '<meta charset=utf-16be>'
                           || coalesce(text, '')
                    WHEN doc_id % 7 = 0
                      THEN '<meta charset=utf-8>' || coalesce(text, '')
                    WHEN doc_id % 5 = 0
                      THEN '<meta charset=utf-8>' || coalesce(text, '')
                    WHEN doc_id % 3 = 0
                      THEN '<meta charset=utf-16be>' || coalesce(text, '')
                    ELSE coalesce(text, '') END AS text,
               CASE WHEN doc_id % 13 = 0 OR doc_id % 11 = 0 THEN NULL
                    WHEN doc_id % 7 = 0 THEN 'utf-16be'
                    ELSE NULL END AS charset,
               CASE WHEN doc_id % 13 = 0 THEN 'utf-8'
                    WHEN doc_id % 11 = 0 THEN 'utf-8'
                    WHEN doc_id % 7 = 0 THEN 'utf-16be'
                    WHEN doc_id % 5 = 0 THEN 'utf-8'
                    WHEN doc_id % 3 = 0 THEN 'utf-8'
                    WHEN doc_id % 2 = 0 THEN 'utf-16le'
                    ELSE 'utf-8' END AS charset_used,
               CASE WHEN doc_id % 13 = 0 THEN 'bom'
                    WHEN doc_id % 11 = 0 THEN 'default'
                    WHEN doc_id % 7 = 0 THEN 'header'
                    WHEN doc_id % 5 = 0 THEN 'meta'
                    WHEN doc_id % 3 = 0 THEN 'default'
                    WHEN doc_id % 2 = 0 THEN 'bom'
                    ELSE 'default' END AS charset_source,
               CASE WHEN doc_id % 13 = 0 OR doc_id % 11 = 0 THEN 'text/html'
                    WHEN doc_id % 7 = 0 OR doc_id % 5 = 0 THEN 'text/html'
                    WHEN doc_id % 3 = 0 THEN 'text/plain'
                    ELSE 'text/html' END AS content_type
             FROM documents),
          srcdocs AS (SELECT doc_id, text FROM src),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          tok AS (SELECT sd.doc_id, $cleanTok AS n_tokens_clean
                  FROM srcdocs sd LEFT JOIN agg a USING (doc_id))
          SELECT s.doc_id, 'ok' AS env_status, s.charset, s.charset_used,
                 s.charset_source, s.content_type, t.n_tokens_clean,
                 (s.content_type LIKE 'text/%'
                  AND t.n_tokens_clean >= 5) AS admitted
          FROM src s JOIN tok t USING (doc_id)"""
    },

    // Content-Length recomputed from class arithmetic: every class's
    // body_text is exactly the original text — the trimmed class
    // because the junk is cut, the chunked class because the framing
    // is removed and the declared length superseded — so one token
    // chain covers all six; length_status and the admission rule are
    // the pinned surface.
    "q218_content_length" -> {
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH src AS (SELECT doc_id, coalesce(text, '') AS text,
               CASE WHEN doc_id % 13 = 0 THEN 'exact'
                    WHEN doc_id % 7 = 0 THEN 'trimmed'
                    WHEN doc_id % 5 = 0 THEN 'short_body'
                    WHEN doc_id % 3 = 0 THEN 'invalid'
                    WHEN doc_id % 2 = 0 THEN 'superseded'
                    ELSE 'none' END AS length_status,
               CASE WHEN doc_id % 13 = 0 OR doc_id % 7 = 0
                      OR doc_id % 5 = 0 OR doc_id % 3 = 0 THEN 'none'
                    WHEN doc_id % 2 = 0 THEN 'chunked'
                    ELSE 'none' END AS transfer_coding
             FROM documents),
          srcdocs AS (SELECT doc_id, text FROM src),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          tok AS (SELECT sd.doc_id, $cleanTok AS n_tokens_clean
                  FROM srcdocs sd LEFT JOIN agg a USING (doc_id))
          SELECT s.doc_id, 'ok' AS env_status, s.length_status,
                 s.transfer_coding, t.n_tokens_clean,
                 (t.n_tokens_clean >= 5
                  AND s.length_status NOT IN ('invalid', 'short_body'))
                   AS admitted
          FROM src s JOIN tok t USING (doc_id)"""
    },

    // Coding chains recomputed without any bytes: chain labels from
    // class arithmetic (CASE order mirrors the Spark when-chain),
    // token counts from the ORIGINAL text for fully-decoded classes —
    // so right-to-left chain decoding must be invisible — and NULL
    // for quarantined classes on both engines.
    "q222_coding_chains" -> {
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH src AS (SELECT doc_id, coalesce(text, '') AS text,
               CASE WHEN doc_id % 13 = 0 THEN 'gzip+chunked'
                    WHEN doc_id % 11 = 0 THEN 'unsupported'
                    WHEN doc_id % 7 = 0 THEN 'br_unsupported'
                    WHEN doc_id % 5 = 0 THEN 'none'
                    WHEN doc_id % 3 = 0 THEN 'none'
                    WHEN doc_id % 2 = 0 THEN 'transfer_error'
                    ELSE 'none' END AS transfer_coding,
               CASE WHEN doc_id % 13 = 0 THEN 'none'
                    WHEN doc_id % 11 = 0 THEN 'skipped'
                    WHEN doc_id % 7 = 0 THEN 'skipped'
                    WHEN doc_id % 5 = 0 THEN 'gzip+gzip'
                    WHEN doc_id % 3 = 0 THEN 'deflate+gzip'
                    WHEN doc_id % 2 = 0 THEN 'skipped'
                    ELSE 'none' END AS content_coding
             FROM documents),
          srcdocs AS (SELECT doc_id, text FROM src),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          tok AS (SELECT sd.doc_id, $cleanTok AS n_tokens_clean
                  FROM srcdocs sd LEFT JOIN agg a USING (doc_id))
          SELECT s.doc_id, 'ok' AS env_status,
                 CAST(200 AS BIGINT) AS http_status,
                 'text/html' AS content_type,
                 s.transfer_coding, s.content_coding,
                 CASE WHEN s.transfer_coding
                          IN ('none', 'chunked', 'gzip+chunked')
                       AND s.content_coding IN ('none', 'gzip', 'deflate',
                                                'gzip+gzip', 'deflate+gzip')
                      THEN t.n_tokens_clean END AS n_tokens_clean,
                 coalesce(CASE WHEN s.transfer_coding
                                   IN ('none', 'chunked', 'gzip+chunked')
                                AND s.content_coding
                                    IN ('none', 'gzip', 'deflate',
                                        'gzip+gzip', 'deflate+gzip')
                               THEN t.n_tokens_clean END >= 5,
                   false) AS admitted
          FROM src s JOIN tok t USING (doc_id)"""
    },

    // Loss shares recomputed from class arithmetic alone — the engine
    // must classify every synthesized payload (token-named br,
    // DECODABLE real-frame zstd (r15: prices clean now),
    // magic-sniffed mislabeled zstd, TE-level br, generic compress,
    // decodable gzip) into exactly the priced class.
    "q226_coding_loss_report" ->
      s"""WITH cls AS (SELECT source,
               CASE WHEN doc_id % 13 = 0 THEN 'br'
                    WHEN doc_id % 11 = 0 THEN 'clean'
                    WHEN doc_id % 7 = 0 THEN 'zstd'
                    WHEN doc_id % 5 = 0 THEN 'br'
                    WHEN doc_id % 3 = 0 THEN 'other'
                    ELSE 'clean' END AS loss_class
             FROM documents),
          g AS (SELECT source, loss_class,
                       CAST(count(*) AS BIGINT) AS n_docs
                FROM cls GROUP BY source, loss_class),
          t AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS tot
                FROM g GROUP BY source)
          SELECT g.source, g.loss_class, g.n_docs,
                 CAST(g.n_docs * 1000000 // t.tot AS BIGINT) AS share_ppm
          FROM g JOIN t USING (source)""",

    // zstd chains recomputed without any bytes: labels from class
    // arithmetic (CASE order mirrors the Spark when-chain) and the
    // md5/length of the ORIGINAL text for fully-decoded classes —
    // so the engine's decode must return byte-exact content, not
    // merely succeed.
    "q237_zstd_chain" ->
      s"""SELECT doc_id,
            CASE WHEN doc_id % 13 = 0 THEN 'none'
                 WHEN doc_id % 11 = 0 THEN 'zstd+chunked'
                 ELSE 'none' END AS transfer_coding,
            CASE WHEN doc_id % 13 = 0 THEN 'zstd'
                 WHEN doc_id % 11 = 0 THEN 'none'
                 WHEN doc_id % 7 = 0 THEN 'zstd+gzip'
                 WHEN doc_id % 5 = 0 THEN 'zstd_error'
                 WHEN doc_id % 3 = 0 THEN 'br_unsupported'
                 WHEN doc_id % 2 = 0 THEN 'gzip'
                 ELSE 'none' END AS content_coding,
            CASE WHEN doc_id % 5 = 0 AND doc_id % 13 <> 0
                      AND doc_id % 11 <> 0 AND doc_id % 7 <> 0 THEN NULL
                 WHEN doc_id % 3 = 0 AND doc_id % 13 <> 0
                      AND doc_id % 11 <> 0 AND doc_id % 7 <> 0
                      AND doc_id % 5 <> 0 THEN NULL
                 ELSE md5(coalesce(text, '')) END AS text_md5,
            CASE WHEN doc_id % 5 = 0 AND doc_id % 13 <> 0
                      AND doc_id % 11 <> 0 AND doc_id % 7 <> 0 THEN NULL
                 WHEN doc_id % 3 = 0 AND doc_id % 13 <> 0
                      AND doc_id % 11 <> 0 AND doc_id % 7 <> 0
                      AND doc_id % 5 <> 0 THEN NULL
                 ELSE CAST(strlen(coalesce(text, '')) AS BIGINT)
            END AS body_len
          FROM documents""",

    // End-to-end report recomposed from class arithmetic: per doc a
    // response (poisoned %7 / corrupt %13 / ok, 404 when %2) plus
    // request %3 and metadata %5 rows; token counts from the
    // independent extraction chain over the ORIGINAL text (a clean
    // envelope decode is invisible); report cells are sums per
    // archive.
    "q223_warc_ingest_report" -> {
      val cleanTok =
        s"""CAST(len(list_filter(string_split_regex(
              ${NormalizeOps.cleanSql("coalesce(a.main_text, '')")},
              '\\s+'), x -> x <> '')) AS BIGINT)"""
      s"""WITH srcdocs AS (SELECT doc_id, coalesce(text, '') AS text
                           FROM documents),
          $blocksChainSql,
          agg AS (SELECT doc_id,
                         coalesce(string_agg(
                           CASE WHEN is_good THEN block_text END, ' '
                           ORDER BY block_idx), '') AS main_text
                  FROM blk GROUP BY doc_id),
          tok AS (SELECT sd.doc_id, $cleanTok AS toks
                  FROM srcdocs sd LEFT JOIN agg a USING (doc_id)),
          cls AS (SELECT d.doc_id, d.source,
                    CASE WHEN d.doc_id % 7 = 0 THEN 'corrupt_gzip'
                         WHEN d.doc_id % 13 = 0 THEN 'corrupt'
                         ELSE 'ok' END AS rstatus,
                    (d.doc_id % 2 <> 0) AS is200, t.toks
                  FROM documents d JOIN tok t USING (doc_id)),
          recs AS (
            SELECT source, rstatus AS status, TRUE AS is_resp,
                   (rstatus = 'ok' AND is200 AND toks >= 5) AS admitted,
                   CASE WHEN rstatus = 'ok' AND is200 AND toks >= 5
                        THEN toks ELSE 0 END AS atoks
            FROM cls
            UNION ALL
            SELECT source, 'ok', FALSE, FALSE, 0 FROM cls
            WHERE doc_id % 3 = 0
            UNION ALL
            SELECT source, 'ok', FALSE, FALSE, 0 FROM cls
            WHERE doc_id % 5 = 0
            UNION ALL
            SELECT source, 'ok', FALSE, FALSE, 0 FROM cls
            WHERE doc_id % 11 = 0)
          SELECT source AS archive,
                 CAST(count(*) AS BIGINT) AS n_records,
                 CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_ok,
                 CAST(sum(CASE WHEN status <> 'ok' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_quarantined,
                 CAST(sum(CASE WHEN is_resp AND status = 'ok'
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_responses,
                 CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_admitted,
                 CAST(sum(atoks) AS BIGINT) AS tokens_admitted
          FROM recs GROUP BY source"""
    }
  )
}
