package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** HTTP response-envelope parsing — the layer between archive demux
  * and content extraction: real WARC `response` records store the
  * FULL HTTP response (status line + headers + body), not the bare
  * document bytes, so mime/charset truth lives INSIDE the payload
  * and the extraction stack must take them from there, not from the
  * archive's own header fields.
  *
  * Reference scope note: the reference validates staged files whose
  * media type arrives out-of-band via the catalog manifest
  * (`backend/import_asset_file/task.py`); a payload-embedded envelope
  * never occurs there — this is beyond-reference pipeline capability
  * feeding [[CrawlArchive]]'s records.
  *
  * Parse contract (total on hostile bytes, pinned by spec + oracle):
  *  - payload opens with `HTTP/<digit>` and a 3-digit status code on
  *    the first line, with a blank line within the header bound →
  *    `env_status` `ok`: status code, lowercased first-wins header
  *    map, `content_type` (the media type before any `;`), `charset`
  *    (the `charset=` parameter, quotes stripped, lowercased), `body`
  *    = the raw bytes after the blank line, and `body_text` = body
  *    decoded with the DECLARED charset when the JVM supports it
  *    (UTF-8 fallback) — the envelope is how a crawler knows
  *    `utf-16be` bytes aren't mojibake;
  *  - opens with `HTTP/` but the status line doesn't parse or no
  *    blank line appears within the bound → `malformed`, the WHOLE
  *    payload kept as body (quarantine-not-drop, [[CrawlArchive]]'s
  *    discipline);
  *  - anything else → `none`: not an HTTP envelope at all — body is
  *    the payload verbatim (archives also carry bare documents).
  *
  * Determinism pins: duplicate headers keep the FIRST occurrence
  * (`content_type` never flaps on adversarial duplicates); obs-fold
  * continuation lines (deprecated, RFC 7230 §3.2.4) are read as
  * ordinary `key: value` lines, never joined.
  *
  * Content-Length framing (`ok` envelopes only; RFC 9110 §8.6 /
  * 9112 §6.3): when no `Transfer-Encoding` is declared and a valid
  * decimal `Content-Length` is declared (leading zeros stripped —
  * valid decimal syntax), the header frames the wire body — `exact`
  * when it equals the available bytes,
  * `trimmed` when smaller (stored captures carry connection junk
  * past the entity; the excess is dropped BEFORE content decoding,
  * which is what makes a gzip body with trailing garbage decodable
  * at all), `short_body` when larger (the capture lost bytes —
  * everything present is KEPT, quarantine-not-drop, and admission
  * refuses the row). A non-numeric value is `invalid` (kept whole);
  * any declared Transfer-Encoding marks a declared length
  * `superseded` (RFC 9112 §6.3 rule 3: TE wins), no header is `none`.
  *
  * Body codings (`ok` envelopes only; the wire order, outermost
  * first — RFC 9112 §6.1 / RFC 9110 §8.4):
  *  1. `Transfer-Encoding` must end with `chunked` (RFC 9112 §6.1)
  *     → the hex-size chunk framing is removed, then any codings
  *     listed before it decode right-to-left (TE gzip-over-chunked:
  *     `gzip, chunked` → de-chunk, then inflate — `transfer_coding`
  *     `gzip+chunked`). Framing defects — bad size line, short data,
  *     missing terminator — keep the RAW body (`chunked_error`,
  *     quarantine-not-drop); a post-de-chunk coding defect keeps the
  *     framed bytes (`transfer_error`); a list with `chunked` not
  *     last or an undecodable coding is `unsupported` (the body is
  *     NOT plain bytes — passing it through as text would admit
  *     garbage). All three skip content decoding (`content_coding`
  *     `skipped`: bytes past a broken framing aren't trustworthy
  *     input to a decompressor);
  *  2. `Content-Encoding` chains decode right-to-left (the
  *     last-listed coding was applied last): `gzip`/`x-gzip` →
  *     bounded inflate (the [[CrawlArchive]] zip-bomb guard, shared
  *     implementation); `deflate` → zlib inflate with the raw-deflate
  *     fallback real broken servers require; `gzip, gzip` →
  *     `gzip+gzip`. A stream defect keeps the raw wire bytes
  *     (`gzip_error`/`deflate_error` of the failing coding); a chain
  *     with any coding we can't decode quarantines with the raw
  *     bytes kept — `br_unsupported`/`zstd_unsupported` when the
  *     first-to-come-off undecodable coding is brotli/zstd (zstd
  *     also recognized by its frame magic on a mislabeled outermost
  *     token), generic `unsupported` otherwise — so ingest reports
  *     can price the modern-web (`br`-heavy) loss share per class.
  *     `identity`/absent → `none`.
  *
  * Charset resolution for `body_text` (the HTML5 prescan precedence,
  * pinned by q212's decoy-shred classes): header `charset=` param >
  * BOM (UTF-8 / UTF-16BE / UTF-16LE, stripped from `body_text` but
  * not from `body`) > `<meta ... charset=...>` prescan over the first
  * [[MetaScanBytes]] decoded-as-latin1 bytes, `text/html` only (the
  * prescan only exists for ASCII-compatible encodings) > UTF-8.
  * `charset` stays the DECLARED header param (nullable, as before);
  * `charset_used`/`charset_source` report the decision — a JVM-
  * unsupported name falls back to UTF-8 with the source kept honest.
  *
  * Scale shape (100 TB): a partition-wise `mapPartitions` projection
  * — zero shuffle, body bytes never leave their partition, one pass
  * per record; chunk/content decode and charset decode happen exactly
  * once here instead of per downstream consumer. Total: never throws
  * on any byte input (HttpEnvelopeFuzzSpec drives random + truncated
  * + mutated envelopes, including chunked/gzip mutations).
  */
object HttpEnvelope {

  /** One parsed payload (or quarantine marker — see object doc). */
  final case class EnvelopeRecord(
      id: String, env_status: String, http_status: Option[Long],
      headers: Map[String, String], content_type: String, charset: String,
      length_status: String, transfer_coding: String, content_coding: String,
      charset_used: String, charset_source: String,
      body: Array[Byte], body_text: String)

  /** Blank line must appear within this many bytes for an `ok`
    * envelope — same bound discipline as [[CrawlArchive]]. */
  private val MaxHeaderBytes = 8192

  /** Inflate bound for Content-Encoding bodies (1 GiB) — the same
    * zip-bomb guard as [[CrawlArchive.MaxInflatedBytes]]. */
  private val MaxBodyBytes = 1L << 30

  /** HTML5 §13.2.3.2 prescan window: a `<meta charset>` past this
    * many bytes is ignored (q212's %11 class pins the bound). */
  private val MetaScanBytes = 1024

  private val MetaCharsetRe =
    """(?i)<meta\s[^>]*charset\s*=\s*["']?([A-Za-z0-9._:-]+)""".r

  private val StatusRe =
    """HTTP/\d(?:\.\d)?[ \t]+(\d{3})(?:[ \t].*)?""".r

  /** Parse each `(idCol, binCol)` payload into an [[EnvelopeRecord]].
    * Partition-wise, no shuffle; total on any input. */
  def extract(spark: SparkSession, df: DataFrame, idCol: String,
              binCol: String): Dataset[EnvelopeRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("string"),
        coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => parse(id, b) })
  }

  /** Pure per-payload parse — also the fuzz harness entry point. */
  private[sources] def parse(id: String, bytes0: Array[Byte]): EnvelopeRecord = {
    val bytes = if (bytes0 == null) Array.empty[Byte] else bytes0
    val httpPrefix = bytes.length >= 5 && bytes(0) == 'H' &&
      bytes(1) == 'T' && bytes(2) == 'T' && bytes(3) == 'P' && bytes(4) == '/'
    if (!httpPrefix)
      return EnvelopeRecord(id, "none", None, Map.empty, null, null,
        "none", "none", "none", "utf-8", "default",
        bytes, new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    def malformed = EnvelopeRecord(id, "malformed", None, Map.empty,
      null, null, "none", "none", "none", "utf-8", "default", bytes,
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    val hEnd = blankLineAt(bytes)
    if (hEnd < 0) return malformed
    val head = new String(bytes, 0, hEnd, "UTF-8")
    val lines = head.linesIterator.toSeq
    val status = lines.headOption.map(_.trim) match {
      case Some(StatusRe(code)) => code.toLong
      case _ => return malformed
    }
    // first occurrence wins: scanLeft-style fold keeps the earliest
    // value per lowercased key (adversarial duplicate headers pinned)
    val headers = lines.drop(1).foldLeft(Map.empty[String, String]) {
      (acc, l) =>
        val i = l.indexOf(':')
        if (i <= 0) acc
        else {
          val k = l.substring(0, i).trim.toLowerCase
          if (acc.contains(k)) acc else acc + (k -> l.substring(i + 1).trim)
        }
    }
    val ctRaw = headers.get("content-type")
    val contentType = ctRaw.map(_.split(";")(0).trim.toLowerCase)
      .filter(_.nonEmpty).orNull
    val charset = ctRaw.flatMap { v =>
      "(?i)charset=\"?([^;\"\\s]+)\"?".r.findFirstMatchIn(v)
        .map(_.group(1).toLowerCase)
    }.orNull
    val bodyStart = hEnd + blankLen(bytes, hEnd)
    val raw = java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length)

    // 1a. Content-Length framing (RFC 9112 §6.3 rule 3: ANY declared
    // Transfer-Encoding supersedes a declared length)
    val teTokens = headers.get("transfer-encoding").toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase)
      .filter(t => t.nonEmpty && t != "identity") // identity is a no-op
    val cl = headers.get("content-length").map(_.trim)
    val (framed, lengthStatus) =
      if (teTokens.nonEmpty) (raw, if (cl.isDefined) "superseded" else "none")
      else cl match {
        case None => (raw, "none")
        case Some(v) if v.nonEmpty && v.forall(_.isDigit) =>
          // leading zeros are valid decimal syntax: strip before the
          // overflow guard so '000...0123' frames like '123'
          val t = v.dropWhile(_ == '0')
          if (t.length > 18) (raw, "invalid") // genuinely out of range
          else {
            val n = if (t.isEmpty) 0L else t.toLong
            if (n == raw.length) (raw, "exact")
            else if (n < raw.length)
              (java.util.Arrays.copyOfRange(raw, 0, n.toInt), "trimmed")
            else (raw, "short_body") // capture lost bytes; keep what's there
          }
        case Some(_) => (raw, "invalid")
      }

    // 1b. transfer codings (outermost on the wire): chunked must be
    // LAST (RFC 9112 §6.1); codings before it decode right-to-left
    // after de-framing (TE gzip-over-chunked). A list with chunked
    // not last, or any coding we can't decode, is quarantined as
    // `unsupported` — never passed through as if it were plain bytes.
    val (afterTransfer, transferCoding) =
      if (teTokens.isEmpty) (framed, "none")
      else if (teTokens.last != "chunked")
        (framed, "unsupported") // framing violation, not a coding gap
      else if (!teTokens.init.forall(SupportedCodings))
        // the bytes at hand are chunk-framed, so no payload sniff —
        // the declared token names the class (br/zstd priced apart)
        (framed, unsupportedLabel(teTokens.init, null))
      else dechunk(framed) match {
        case None => (framed, "chunked_error")
        case Some(b0) =>
          decodeChain(teTokens.init, b0) match {
            case Right(b) =>
              (b, teTokens.map(canonCoding).mkString("+"))
            case Left(_) => (framed, "transfer_error")
          }
      }

    // 2. content codings — skipped entirely after a transfer defect;
    // multi-valued chains decode right-to-left (RFC 9110 §8.4: the
    // last-listed coding was applied last, so it comes off first)
    val ceTokens = headers.get("content-encoding").toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase)
      .filter(t => t.nonEmpty && t != "identity")
    val (body, contentCoding) =
      if (transferCoding == "chunked_error" ||
          transferCoding == "transfer_error" ||
          transferCoding.endsWith("unsupported")) (afterTransfer, "skipped")
      else if (ceTokens.isEmpty) (afterTransfer, "none")
      else if (!ceTokens.forall(SupportedCodings))
        // raw kept, never guessed; br/zstd named so ingest reports
        // can price the modern-web loss share (r13 VERDICT #4)
        (afterTransfer, unsupportedLabel(ceTokens, afterTransfer))
      else decodeChain(ceTokens, afterTransfer) match {
        case Right(b) => (b, ceTokens.map(canonCoding).mkString("+"))
        case Left(t) => (afterTransfer, canonCoding(t) + "_error")
      }

    // 3. charset resolution: header > BOM > meta prescan (html) > utf-8
    val (csName, csSource, bomLen) =
      if (charset != null) (charset, "header", 0)
      else bomCharset(body) match {
        case Some((nm, n)) => (nm, "bom", n)
        case None =>
          val meta =
            if (contentType == "text/html") metaCharset(body) else None
          meta match {
            case Some(nm) => (nm, "meta", 0)
            case None => ("utf-8", "default", 0)
          }
      }
    val cs =
      try {
        if (java.nio.charset.Charset.isSupported(csName))
          java.nio.charset.Charset.forName(csName)
        else java.nio.charset.StandardCharsets.UTF_8
      } catch { // illegal charset NAMES also fall back, never throw
        case _: java.nio.charset.IllegalCharsetNameException =>
          java.nio.charset.StandardCharsets.UTF_8
      }
    val text = new String(body, bomLen, body.length - bomLen, cs)
    EnvelopeRecord(id, "ok", Some(status), headers, contentType, charset,
      lengthStatus, transferCoding, contentCoding,
      cs.name().toLowerCase, csSource, body, text)
  }

  /** Codings [[decodeChain]] can remove; anything else quarantines.
    * zstd decodes for real (RFC 8878 via the zstd-jni binding, same
    * bounded-stream discipline as gzip); `zstd_unsupported` survives
    * only for MISLABELED tokens whose bytes sniff as a zstd frame —
    * a declared-zstd body that fails to decode is `zstd_error`
    * (defective frame), not a coding gap. */
  private val SupportedCodings = Set("gzip", "x-gzip", "deflate", "zstd")

  /** Quarantine label for an undecodable coding list: the FIRST
    * coding that would come off (right-to-left — the last-listed one
    * was applied last on the wire) and can't names the class, with
    * `br`/`zstd` distinguished from the generic bucket so q223-style
    * ingest reports can price the modern-web loss share (a large
    * real-crawl fraction is `Content-Encoding: br`) instead of
    * folding it into one `unsupported` cell. `bytes` — when non-null
    * and the failing coding is the outermost one, i.e. the bytes at
    * hand are IN that coding — lets zstd's frame magic
    * (`28 B5 2F FD` little-endian, RFC 8878 §3.1.1) reclassify a
    * mislabeled token; brotli has no magic, so its class rests on
    * the declared token alone. */
  private def unsupportedLabel(tokens: Seq[String],
                               bytes: Array[Byte]): String = {
    val bad = tokens.reverse.find(t => !SupportedCodings(t)).getOrElse("")
    bad match {
      case "br" => "br_unsupported"
      case _ =>
        // declared-zstd bodies now DECODE (never reach here); the
        // sniff survives for mislabeled tokens over zstd-frame bytes
        if (bytes != null && tokens.nonEmpty && tokens.last == bad &&
            CrawlArchive.isZstdFrame(bytes)) "zstd_unsupported"
        else "unsupported"
    }
  }

  /** `x-gzip` is gzip's deprecated alias (RFC 9110 §8.4.1.3) — one
    * label so reports never split a class on the alias. */
  private def canonCoding(t: String): String =
    if (t == "x-gzip") "gzip" else t

  /** Decode a coding list right-to-left (the last-listed coding was
    * applied last on the wire, so it comes off first). Right(bytes)
    * on success; Left(failing token) on the first stream defect —
    * the caller keeps the ORIGINAL bytes, quarantine-not-guess. */
  private def decodeChain(tokens: Seq[String],
                          b0: Array[Byte]): Either[String, Array[Byte]] = {
    var cur = b0
    for (t <- tokens.reverse) {
      val out = t match {
        case "gzip" | "x-gzip" => CrawlArchive.inflate(cur, MaxBodyBytes)
        case "deflate" =>
          // zlib-wrapped per the RFC; raw-deflate fallback for the
          // widely-deployed servers that send it bare
          inflateZlib(cur, MaxBodyBytes, nowrap = false)
            .orElse(inflateZlib(cur, MaxBodyBytes, nowrap = true))
        case "zstd" => CrawlArchive.zstdInflate(cur, MaxBodyBytes)
        case _ => None // unreachable: callers pre-filter on SupportedCodings
      }
      out match {
        case Some(x) => cur = x
        case None => return Left(t)
      }
    }
    Right(cur)
  }

  /** Remove RFC 9112 §7.1 chunk framing: `hex-size[;ext]\r\n data
    * \r\n ... 0\r\n[trailers]\r\n`. Lone-LF line ends tolerated (the
    * header parser's discipline). None on ANY framing defect — the
    * caller keeps the raw bytes. Output is bounded by the input
    * length (chunks copy input bytes), so no bomb guard is needed. */
  private[sources] def dechunk(b: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (true) {
      var lineEnd = i
      while (lineEnd < b.length && b(lineEnd) != '\n') lineEnd += 1
      if (lineEnd >= b.length) return None // no size line terminator
      val line = new String(b, i, lineEnd - i, "ISO-8859-1").trim
      val hex = line.takeWhile(_ != ';').trim
      if (hex.isEmpty || hex.length > 8 ||
          !hex.forall(c => Character.digit(c, 16) >= 0)) return None
      val size = java.lang.Long.parseLong(hex, 16)
      i = lineEnd + 1
      if (size == 0L) return Some(out.toByteArray) // trailers ignored
      if (i + size > b.length) return None // short chunk data
      out.write(b, i, size.toInt)
      i += size.toInt
      // chunk data must be followed by CRLF (or bare LF)
      if (i < b.length && b(i) == '\r') i += 1
      if (i >= b.length || b(i) != '\n') return None
      i += 1
    }
    None // unreachable
  }

  /** Bounded zlib/raw-deflate inflate: None on any defect — bad or
    * truncated stream, dictionary demand, or size past `cap`. */
  private def inflateZlib(bytes: Array[Byte], cap: Long,
                          nowrap: Boolean): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.finished()) ()
          else return None // truncated input or preset-dictionary demand
        } else {
          total += n
          if (total > cap) return None
          out.write(buf, 0, n)
        }
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** BOM sniff: (charset name, BOM byte length). UTF-8 checked first
    * (its BOM is 3 bytes and shares no prefix with the UTF-16 pair). */
  private def bomCharset(b: Array[Byte]): Option[(String, Int)] =
    if (b.length >= 3 && b(0) == 0xef.toByte && b(1) == 0xbb.toByte &&
        b(2) == 0xbf.toByte) Some(("utf-8", 3))
    else if (b.length >= 2 && b(0) == 0xfe.toByte && b(1) == 0xff.toByte)
      Some(("utf-16be", 2))
    else if (b.length >= 2 && b(0) == 0xff.toByte && b(1) == 0xfe.toByte)
      Some(("utf-16le", 2))
    else None

  /** HTML5-style meta prescan: first `charset=` capture inside the
    * latin1 decode of the first [[MetaScanBytes]] bytes. Latin1 maps
    * every byte 1:1, so the scan is total on any input — and blind to
    * non-ASCII-compatible encodings, exactly like the real prescan. */
  private def metaCharset(b: Array[Byte]): Option[String] = {
    val n = math.min(b.length, MetaScanBytes)
    val head = new String(b, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
    MetaCharsetRe.findFirstMatchIn(head).map(_.group(1).toLowerCase)
  }

  /** Offset of the FIRST byte of the blank-line separator
    * (`\n\n` or `\r\n\r\n` or `\n\r\n`), i.e. the end of the header
    * text, or −1 when none within [[MaxHeaderBytes]]/the buffer. */
  private def blankLineAt(bytes: Array[Byte]): Int = {
    val limit = math.min(bytes.length, MaxHeaderBytes)
    var i = 0
    while (i < limit) {
      if (bytes(i) == '\n') {
        if (i + 1 < bytes.length && bytes(i + 1) == '\n') return i
        if (i + 2 < bytes.length && bytes(i + 1) == '\r' &&
            bytes(i + 2) == '\n') return i
      }
      i += 1
    }
    -1
  }

  /** Byte length of the separator starting at `at` (the `\n` that
    * [[blankLineAt]] found): `\n\n` → 2, `\n\r\n` → 3. */
  private def blankLen(bytes: Array[Byte], at: Int): Int =
    if (at + 1 < bytes.length && bytes(at + 1) == '\n') 2 else 3
}
