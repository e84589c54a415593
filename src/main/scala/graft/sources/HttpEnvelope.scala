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
  * Scale shape (100 TB): a partition-wise `mapPartitions` projection
  * — zero shuffle, body bytes never leave their partition, one pass
  * per record; charset decode happens exactly once here instead of
  * per downstream consumer. Total: never throws on any byte input
  * (HttpEnvelopeFuzzSpec drives random + truncated + mutated
  * envelopes).
  */
object HttpEnvelope {

  /** One parsed payload (or quarantine marker — see object doc). */
  final case class EnvelopeRecord(
      id: String, env_status: String, http_status: Option[Long],
      headers: Map[String, String], content_type: String, charset: String,
      body: Array[Byte], body_text: String)

  /** Blank line must appear within this many bytes for an `ok`
    * envelope — same bound discipline as [[CrawlArchive]]. */
  private val MaxHeaderBytes = 8192

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
        bytes, new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    def malformed = EnvelopeRecord(id, "malformed", None, Map.empty,
      null, null, bytes,
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
    val body = java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length)
    val cs =
      try {
        if (charset != null && java.nio.charset.Charset.isSupported(charset))
          java.nio.charset.Charset.forName(charset)
        else java.nio.charset.StandardCharsets.UTF_8
      } catch { // illegal charset NAMES also fall back, never throw
        case _: java.nio.charset.IllegalCharsetNameException =>
          java.nio.charset.StandardCharsets.UTF_8
      }
    EnvelopeRecord(id, "ok", Some(status), headers, contentType, charset,
      body, new String(body, cs))
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
