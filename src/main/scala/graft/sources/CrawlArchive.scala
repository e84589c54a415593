package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Record-framed crawl-archive ingest — the WARC-shaped container a
  * Common-Crawl-fed pipeline reads first: one archive blob carries
  * many fetched responses, each a textual header (`Key: value` lines,
  * blank-line terminated — the WARC/HTTP header shape) followed by a
  * length-prefixed binary payload, so a reader seeks record-to-record
  * without decoding payloads it skips.
  *
  * Reference scope note: the reference ingests staged files listed by
  * a manifest (`backend/import_asset_file/task.py`,
  * `backend/import_metadata_file/task.py`), never a record-framed
  * archive; this is beyond-reference pipeline capability. The demux discipline is [[graft.operators.Multimodal]]'s
  * frame container (Multimodal.scala GVID demux): magic + count header,
  * per-record length prefix, quarantine-don't-throw.
  *
  * Gzip members: real crawl dumps (Common Crawl's WARCs) compress
  * each record's payload as its OWN gzip member, so a reader inflates
  * record-by-record without decompressing the records it skips. The
  * demuxer sniffs the per-record gzip magic (`1f 8b`) and inflates
  * with a bounded buffer ([[MaxInflatedBytes]] — the zip-bomb guard);
  * compression is invisible to the caller: `body`/`n_bytes` are the
  * INFLATED payload. The length prefix frames the COMPRESSED bytes,
  * so a broken member never desynchronizes the walk — later records
  * still extract.
  *
  * Corruption contract (the open-web reality, fuzz-pinned):
  *  - bad magic / truncated container header → ONE quarantine row
  *    (`rec_idx` −1, status `corrupt_container`) — the blob is never
  *    silently dropped;
  *  - a record whose header parses but misses the required
  *    `Target-URI` → status `corrupt`, url NULL, everything the
  *    framing still proves (mime, timestamp, payload bytes) KEPT —
  *    quarantined means kept-for-forensics, not dropped;
  *  - a payload that declares gzip (leading `1f 8b`) but fails to
  *    inflate — truncated stream, mangled deflate data, or inflated
  *    size past the bound → status `corrupt_gzip`, the RAW compressed
  *    bytes kept (`n_bytes` = framed length) — quarantine, never
  *    throw, and the walk resyncs at the next record because framing
  *    is by compressed length;
  *  - a framing break (no blank line in bound, length prefix running
  *    past the buffer) → one status `truncated` row for the rest of
  *    the blob — after a broken length there is no trustworthy resync.
  *
  * Scale shape (100 TB of archives): reading is partition-wise
  * `mapPartitions` — one pass per blob, zero shuffle, payload bytes
  * never leave their partition; an archive row maps 1:1 to an archive
  * FILE at production scale, so parallelism = file count exactly like
  * any binary-file source. Total, never throws on hostile bytes
  * (CrawlArchiveFuzzSpec drives mutations + every-prefix truncation).
  */
object CrawlArchive {

  /** One extracted record (or quarantine marker — see class doc). */
  final case class ArchiveRecord(
      archive: String, rec_idx: Long, status: String,
      url: String, fetch_ts: String, mime: String,
      n_bytes: Long, body: Array[Byte])

  private val Magic = Array[Byte]('G', 'A', 'R', 'C')
  /** Header scan bound: a blank line must appear within this many
    * bytes of the record start or the framing is declared broken
    * (WARC caps header blocks the same way in practice). */
  private val MaxHeaderBytes = 8192
  /** Per-record inflate bound (1 GiB): a gzip member claiming to
    * inflate past this is quarantined as `corrupt_gzip` rather than
    * allowed to take the executor down — the zip-bomb guard every
    * hostile-input decompressor needs. */
  private val MaxInflatedBytes = 1L << 30

  /** Assemble archives: one blob per `groupCol` value, records in
    * ascending `idCol` order, each `(url, fetch_ts, mime, payload)`
    * written as header + BE32 length prefix + payload. Fixture/egress
    * helper — bounded per group, one encoder per group row.
    * `gzipIfCol` (optional boolean column) selects records whose
    * payload is written as its own gzip MEMBER — the per-record
    * compression real crawl dumps use; the length prefix then frames
    * the compressed bytes. */
  def encode(spark: SparkSession, recs: DataFrame, groupCol: String,
             idCol: String, urlCol: String, tsCol: String, mimeCol: String,
             payloadCol: String,
             gzipIfCol: Option[String] = None): DataFrame = {
    import spark.implicits._
    val gz = gzipIfCol.map(c => col(c).cast("boolean")).getOrElse(lit(false))
    recs
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col(idCol).cast("long").as("id"),
        col(urlCol).as("url"), col(tsCol).as("ts"),
        col(mimeCol).as("mime"), col(payloadCol).as("payload"),
        gz.as("gz"))))
        .as("recs"))
      .as[(String, Seq[(Long, String, String, String, Array[Byte], Boolean)])]
      .map { case (g, rs) =>
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(Magic)
        bos.write(be32(rs.size))
        rs.foreach { case (_, url, ts, mime, payload0, gzFlag) =>
          val payload = if (gzFlag) gzipBytes(payload0) else payload0
          val hdr = new StringBuilder()
          // a NULL url models a crawler that lost the request line —
          // the record is framed fine but misses the required field
          if (url != null) hdr.append(s"Target-URI: ${hdrSafe(url)}\n")
          hdr.append(s"Fetch-Ts: ${hdrSafe(ts)}\n")
          hdr.append(s"Content-Type: ${hdrSafe(mime)}\n")
          hdr.append("\n")
          bos.write(hdr.toString.getBytes("UTF-8"))
          bos.write(be32(payload.length))
          bos.write(payload)
        }
        (g, bos.toByteArray)
      }.toDF("archive", "bytes")
  }

  private def gzipBytes(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  /** Bounded gzip inflate: None on ANY defect — bad/truncated stream,
    * trailing-garbage IO error, or inflated size past `cap`. Total on
    * hostile bytes; never throws. Shared with [[HttpEnvelope]]'s
    * Content-Encoding path — one hostile-input decompressor, one
    * zip-bomb discipline. */
  private[sources] def inflate(bytes: Array[Byte], cap: Long): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var total = 0L
      var n = in.read(buf)
      var over = false
      while (n >= 0 && !over) {
        total += n
        if (total > cap) over = true
        else { out.write(buf, 0, n); n = in.read(buf) }
      }
      if (over) None else Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /** Demux an archive column into record rows (see corruption
    * contract above). Partition-wise, no shuffle; total on any input. */
  def extract(spark: SparkSession, archives: DataFrame, archiveCol: String,
              binCol: String): Dataset[ArchiveRecord] = {
    import spark.implicits._
    archives.select(col(archiveCol).cast("string"),
        coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (g, bytes) => demux(g, bytes) })
  }

  /** Header values travel on single `Key: value` lines — a CR/LF (or
    * a blank-line sequence) inside a value would silently break the
    * framing for every later record in the blob, degrading them all
    * to one `truncated` quarantine row. Fold any newline run to a
    * single space so the encode→extract round-trip invariant holds
    * for hostile metadata; a null stays null (the field is simply
    * absent and the record quarantines per the contract). */
  private def hdrSafe(v: String): String =
    if (v == null) null else v.replaceAll("[\\r\\n]+", " ")

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  /** Pure per-blob demux — also the fuzz harness entry point. */
  private[sources] def demux(g: String,
                             bytes: Array[Byte]): Seq[ArchiveRecord] = {
    def rd32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    if (bytes.length < 8 || !Magic.indices.forall(i => bytes(i) == Magic(i)))
      return Seq(ArchiveRecord(g, -1L, "corrupt_container",
        null, null, null, -1L, null))
    val nRecs = rd32(4)
    val out = Seq.newBuilder[ArchiveRecord]
    var off = 8L
    var idx = 0L
    var broken = false
    while (idx < nRecs && !broken) {
      // header: scan for the blank line within the bound
      val hEnd = blankLineAt(bytes, off)
      if (hEnd < 0) broken = true
      else {
        val hdr = new String(bytes, off.toInt, (hEnd - off).toInt, "UTF-8")
        val fields = hdr.linesIterator
          .flatMap { l =>
            val i = l.indexOf(':')
            if (i <= 0) None
            else Some(l.substring(0, i).trim.toLowerCase ->
              l.substring(i + 1).trim)
          }.toMap
        val bodyOff = hEnd + 1 // past the blank line's \n
        if (bodyOff + 4 > bytes.length) broken = true
        else {
          val len = rd32(bodyOff.toInt)
          val start = bodyOff + 4
          if (len < 0 || start + len > bytes.length) broken = true
          else {
            val raw = java.util.Arrays.copyOfRange(
              bytes, start.toInt, (start + len).toInt)
            val url = fields.get("target-uri").orNull
            val ts = fields.get("fetch-ts").orNull
            val mime = fields.get("content-type").orNull
            // per-record gzip member sniff: `1f 8b` opens the payload
            // → bounded inflate; a broken member quarantines with the
            // raw bytes KEPT, and never breaks the walk — the length
            // prefix frames the COMPRESSED bytes
            val isGzip = raw.length >= 2 && raw(0) == 0x1f.toByte &&
              (raw(1) & 0xff) == 0x8b
            out += (if (isGzip) inflate(raw, MaxInflatedBytes) match {
              case Some(body) => ArchiveRecord(g, idx,
                if (url == null) "corrupt" else "ok",
                url, ts, mime, body.length.toLong, body)
              case None => ArchiveRecord(g, idx, "corrupt_gzip",
                url, ts, mime, len, raw)
            } else ArchiveRecord(g, idx,
              if (url == null) "corrupt" else "ok",
              url, ts, mime, len, raw))
            off = start + len
            idx += 1
          }
        }
      }
    }
    if (broken)
      out += ArchiveRecord(g, idx, "truncated", null, null, null, -1L, null)
    out.result()
  }

  /** Offset of the `\n` that ends the header's blank line (i.e. the
    * second of "\n\n"), or −1 when none within [[MaxHeaderBytes]] /
    * the buffer. CRLF headers normalize: a "\r\n\r\n" also ends. */
  private def blankLineAt(bytes: Array[Byte], from: Long): Long = {
    val limit = math.min(bytes.length.toLong, from + MaxHeaderBytes)
    var i = from
    while (i < limit) {
      if (bytes(i.toInt) == '\n') {
        if (i + 1 < limit && bytes((i + 1).toInt) == '\n') return i + 1
        if (i + 2 < limit && bytes((i + 1).toInt) == '\r' &&
            bytes((i + 2).toInt) == '\n') return i + 2
      }
      i += 1
    }
    -1L
  }
}
