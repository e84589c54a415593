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

  /** Bounded zstd inflate (RFC 8878 frames via zstd-jni): None on ANY
    * defect — bad magic, truncated/corrupt frame, or decompressed size
    * past `cap`. Same totality + bomb discipline as [[inflate]]; the
    * JNI layer surfaces frame defects as IOExceptions, but a native
    * binding gets the belt-and-braces catch-all — one hostile row must
    * never cost the scan. */
  private[sources] def zstdInflate(bytes: Array[Byte],
                                   cap: Long): Option[Array[Byte]] =
    try {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
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
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** zstd frame magic `0xFD2FB528`, stored little-endian on the wire. */
  private[sources] def isZstdFrame(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 0x28.toByte && b(1) == 0xb5.toByte &&
      b(2) == 0x2f.toByte && b(3) == 0xfd.toByte

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
            // per-record coding sniff: `1f 8b` (gzip) or `28 b5 2f fd`
            // (zstd) opening the payload → bounded inflate; a broken
            // member quarantines with the raw bytes KEPT, and never
            // breaks the walk — the length prefix frames the
            // COMPRESSED bytes
            val isGzip = raw.length >= 2 && raw(0) == 0x1f.toByte &&
              (raw(1) & 0xff) == 0x8b
            out += (if (isGzip) inflate(raw, MaxInflatedBytes) match {
              case Some(body) => ArchiveRecord(g, idx,
                if (url == null) "corrupt" else "ok",
                url, ts, mime, body.length.toLong, body)
              case None => ArchiveRecord(g, idx, "corrupt_gzip",
                url, ts, mime, len, raw)
            } else if (isZstdFrame(raw))
              zstdInflate(raw, MaxInflatedBytes) match {
                case Some(body) => ArchiveRecord(g, idx,
                  if (url == null) "corrupt" else "ok",
                  url, ts, mime, body.length.toLong, body)
                case None => ArchiveRecord(g, idx, "corrupt_zstd",
                  url, ts, mime, len, raw)
              }
            else ArchiveRecord(g, idx,
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

  // ---- WARC/1.0 read mode (ISO 28500 / the Common Crawl layout) ----

  /** One extracted WARC record (or quarantine marker). Field names
    * mirror the WARC header keys: `rec_type` = `WARC-Type`, `url` =
    * `WARC-Target-URI`, `warc_date` = `WARC-Date`,
    * `warc_content_type` = the record-level `Content-Type` (for a
    * `response` record that is `application/http; msgtype=response` —
    * the HTTP envelope INSIDE the body is [[HttpEnvelope]]'s job). */
  final case class WarcRecord(
      archive: String, rec_idx: Long, status: String,
      rec_type: String, url: String, warc_date: String,
      warc_content_type: String, warc_refers_to: String,
      n_bytes: Long, body: Array[Byte])

  /** Demux real WARC archives — the format dispatch next to
    * [[extract]]'s GARC container: `WARC/` leading bytes → plain
    * concatenated records; gzip leading bytes → one gzip MEMBER per
    * record (the real Common-Crawl layout: header + payload wrapped
    * together, member boundaries located exactly via the deflate
    * stream end + CRC/ISIZE trailer check); anything else → one
    * `corrupt_container` row.
    *
    * Quarantine taxonomy (the [[extract]] contract, same labels):
    *  - a POISONED member (gzip magic, undecodable stream, or a bad
    *    CRC/length trailer) → `corrupt_gzip`, the raw compressed span
    *    KEPT, and the walk RESYNCS at the next member magic — member
    *    framing means one bad record never costs the archive; a span
    *    that doesn't even open with gzip magic (junk spliced BETWEEN
    *    members) → `foreign`, same keep-and-resync, distinct label —
    *    the two defect classes price differently in ingest reports;
    *  - a record missing its required `WARC-Target-URI` (all types
    *    but `warcinfo`) or its `WARC-Type` → `corrupt`, everything
    *    the header still proves kept;
    *  - a missing/invalid `Content-Length`, or one running past the
    *    available bytes → `truncated` (kept-what's-there); in plain
    *    mode this ends the walk (no trustworthy resync — exactly the
    *    GARC rule), in member mode the walk continues to the next
    *    member.
    *
    * Scale shape: identical to [[extract]] — partition-wise
    * `mapPartitions`, zero shuffle, one pass; an archive row maps to
    * an archive file. Total on hostile bytes (fuzz battery). */
  def extractWarc(spark: SparkSession, archives: DataFrame,
                  archiveCol: String, binCol: String): Dataset[WarcRecord] = {
    import spark.implicits._
    archives.select(col(archiveCol).cast("string"),
        coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (g, bytes) => demuxWarc(g, bytes) })
  }

  /** Assemble a real-format WARC fixture: one archive per `groupCol`,
    * records in ascending `idCol` order, each
    * `WARC/1.0` version line + headers + Content-Length-framed
    * payload + CRLF CRLF separator — wrapped as its OWN gzip member
    * when `gzipMembers` (the Common-Crawl layout) or concatenated
    * plain. A null `urlCol` omits `WARC-Target-URI` (the required-
    * field quarantine class); `poisonIfCol` replaces the whole member
    * with gzip-magic-then-zeros — undecodable, resyncable, byte-
    * deterministic (fixtures pin its hex). */
  def encodeWarc(spark: SparkSession, recs: DataFrame, groupCol: String,
                 idCol: String, typeCol: String, urlCol: String,
                 tsCol: String, ctCol: String, payloadCol: String,
                 poisonIfCol: Option[String] = None,
                 gzipMembers: Boolean = true,
                 refersToCol: Option[String] = None): DataFrame = {
    import spark.implicits._
    val poison =
      poisonIfCol.map(c => col(c).cast("boolean")).getOrElse(lit(false))
    val refersTo =
      refersToCol.map(col).getOrElse(lit(null).cast("string"))
    recs
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col(idCol).cast("long").as("id"),
        col(typeCol).as("rtype"), col(urlCol).as("url"), col(tsCol).as("ts"),
        col(ctCol).as("ct"), col(payloadCol).as("payload"),
        poison.as("poison"), refersTo.as("refers")))).as("recs"))
      .as[(String,
        Seq[(Long, String, String, String, String, Array[Byte], Boolean,
          String)])]
      .map { case (g, rs) =>
        val bos = new java.io.ByteArrayOutputStream()
        rs.foreach { case (id, rtype, url, ts, ct, payload, poisoned,
                           refers) =>
          if (poisoned) bos.write(PoisonMember)
          else {
            val hdr = new StringBuilder()
            hdr.append("WARC/1.0\r\n")
            hdr.append(s"WARC-Type: ${hdrSafe(rtype)}\r\n")
            if (url != null) hdr.append(s"WARC-Target-URI: ${hdrSafe(url)}\r\n")
            if (refers != null)
              hdr.append(s"WARC-Refers-To-Target-URI: ${hdrSafe(refers)}\r\n")
            hdr.append(s"WARC-Date: ${hdrSafe(ts)}\r\n")
            hdr.append(s"WARC-Record-ID: <urn:id:$id>\r\n")
            hdr.append(s"Content-Type: ${hdrSafe(ct)}\r\n")
            hdr.append(s"Content-Length: ${payload.length}\r\n\r\n")
            val rec = hdr.toString.getBytes("UTF-8") ++ payload ++
              "\r\n\r\n".getBytes("UTF-8")
            bos.write(if (gzipMembers) gzipBytes(rec) else rec)
          }
        }
        (g, bos.toByteArray)
      }.toDF("archive", "bytes")
  }

  /** A poisoned member: gzip magic + deflate method byte, then zeros
    * — fails to inflate, contains no false resync magic, and is
    * byte-deterministic so fixtures can pin its hex. */
  private[sources] val PoisonMember: Array[Byte] =
    Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08.toByte) ++
      Array.fill[Byte](37)(0)

  /** Pure per-blob WARC demux — also the fuzz harness entry point. */
  private[sources] def demuxWarc(g: String,
                                 bytes: Array[Byte]): Seq[WarcRecord] = {
    val isWarc = bytes.length >= 5 && bytes(0) == 'W' && bytes(1) == 'A' &&
      bytes(2) == 'R' && bytes(3) == 'C' && bytes(4) == '/'
    val isGz = bytes.length >= 2 && bytes(0) == 0x1f.toByte &&
      (bytes(1) & 0xff) == 0x8b
    if (isWarc) warcPlainWalk(g, bytes)
    else if (isGz) warcMemberWalk(g, bytes)
    else Seq(WarcRecord(g, -1L, "corrupt_container",
      null, null, null, null, null, -1L, null))
  }

  /** Member-per-record walk: exact member boundaries from the deflate
    * stream end + trailer; a broken member quarantines its span and
    * resyncs at the next member magic. */
  private def warcMemberWalk(g: String,
                             bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var off = 0
    var idx = 0L
    while (off < bytes.length) {
      val member =
        if (off + 2 <= bytes.length && bytes(off) == 0x1f.toByte &&
            (bytes(off + 1) & 0xff) == 0x8b)
          gzipMemberEnd(bytes, off, MaxInflatedBytes)
        else None
      member match {
        case Some((body, next)) =>
          out += parseWarcAt(g, idx, body, 0)._1
          off = next
        case None =>
          // resync: scan past this offset for the next member magic
          // (1f 8b 08); the skipped span is kept, never dropped. A
          // span that doesn't even open with gzip magic is FOREIGN
          // bytes (junk spliced between members) — labeled apart from
          // a genuinely undecodable gzip member so ingest reports
          // don't conflate the two defect classes.
          val gzHere = off + 2 <= bytes.length && bytes(off) == 0x1f.toByte &&
            (bytes(off + 1) & 0xff) == 0x8b
          var j = off + 1
          while (j + 3 <= bytes.length &&
            !(bytes(j) == 0x1f.toByte && (bytes(j + 1) & 0xff) == 0x8b &&
              bytes(j + 2) == 0x08.toByte)) j += 1
          val end = if (j + 3 <= bytes.length) j else bytes.length
          out += WarcRecord(g, idx, if (gzHere) "corrupt_gzip" else "foreign",
            null, null, null, null, null, (end - off).toLong,
            java.util.Arrays.copyOfRange(bytes, off, end))
          off = end
      }
      idx += 1
    }
    out.result()
  }

  /** Concatenated plain records: Content-Length is the ONLY resync,
    * so a framing defect ends the walk with a terminal `truncated`
    * row — the GARC rule. */
  private def warcPlainWalk(g: String,
                            bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var off = 0L
    var idx = 0L
    var broken = false
    while (off < bytes.length && !broken) {
      val (rec, next) = parseWarcAt(g, idx, bytes, off.toInt)
      out += rec
      if (next < 0) broken = true
      else {
        // consume the record separator (two CRLFs; tolerant of bare
        // LFs) — the next record starts with 'W', never a newline
        var p = next
        while (p < bytes.length && (bytes(p) == '\r' || bytes(p) == '\n'))
          p += 1
        off = p
      }
      idx += 1
    }
    out.result()
  }

  /** Parse one WARC record at `off`. Returns the record and the
    * offset just past its body, or −1 when the framing is
    * untrustworthy (bad version line, no blank line in bound,
    * missing/invalid Content-Length, body past the buffer). */
  private def parseWarcAt(g: String, idx: Long, bytes: Array[Byte],
                          off: Int): (WarcRecord, Int) = {
    def rest = java.util.Arrays.copyOfRange(bytes, off, bytes.length)
    val versionOk = off + 5 <= bytes.length && bytes(off) == 'W' &&
      bytes(off + 1) == 'A' && bytes(off + 2) == 'R' &&
      bytes(off + 3) == 'C' && bytes(off + 4) == '/'
    if (!versionOk)
      return (WarcRecord(g, idx, "corrupt", null, null, null, null, null,
        (bytes.length - off).toLong, rest), -1)
    val hEnd = blankLineAt(bytes, off.toLong)
    if (hEnd < 0)
      return (WarcRecord(g, idx, "truncated", null, null, null, null, null,
        (bytes.length - off).toLong, rest), -1)
    val head = new String(bytes, off, (hEnd - off).toInt, "UTF-8")
    // first-wins lowercased header fold — the HttpEnvelope discipline
    val fields = head.linesIterator.drop(1)
      .foldLeft(Map.empty[String, String]) { (acc, l) =>
        val i = l.indexOf(':')
        if (i <= 0) acc
        else {
          val k = l.substring(0, i).trim.toLowerCase
          if (acc.contains(k)) acc else acc + (k -> l.substring(i + 1).trim)
        }
      }
    val rtype = fields.get("warc-type").map(_.toLowerCase).orNull
    val url = fields.get("warc-target-uri").orNull
    val date = fields.get("warc-date").orNull
    val ct = fields.get("content-type").orNull
    // the revisit-record dedup pointer (Common Crawl's URL-level dups)
    val refersTo = fields.get("warc-refers-to-target-uri").orNull
    val bodyStart = (hEnd + 1).toInt
    val clen = fields.get("content-length").map(_.trim) match {
      case Some(v) if v.nonEmpty && v.forall(_.isDigit) &&
        v.dropWhile(_ == '0').length <= 18 =>
        Some(if (v.dropWhile(_ == '0').isEmpty) 0L
             else v.dropWhile(_ == '0').toLong)
      case _ => None
    }
    clen match {
      case None =>
        (WarcRecord(g, idx, "truncated", rtype, url, date, ct, refersTo,
          (bytes.length - bodyStart).toLong,
          java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length)), -1)
      case Some(n) if bodyStart + n > bytes.length =>
        (WarcRecord(g, idx, "truncated", rtype, url, date, ct, refersTo,
          (bytes.length - bodyStart).toLong,
          java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length)), -1)
      case Some(n) =>
        val body = java.util.Arrays.copyOfRange(
          bytes, bodyStart, bodyStart + n.toInt)
        val status =
          if (rtype == null) "corrupt"
          else if (url == null && rtype != "warcinfo") "corrupt"
          else "ok"
        (WarcRecord(g, idx, status, rtype, url, date, ct, refersTo,
          n, body), bodyStart + n.toInt)
    }
  }

  /** Inflate ONE gzip member starting at `off` and locate its exact
    * end: manual header parse (FEXTRA/FNAME/FCOMMENT/FHCRC), raw
    * Inflater bounded by `cap`, then the CRC32 + ISIZE trailer
    * VERIFIED — a lying trailer is a poisoned member, not a record.
    * None on any defect; never throws. */
  private[sources] def gzipMemberEnd(b: Array[Byte], off: Int,
      cap: Long): Option[(Array[Byte], Int)] = {
    if (off + 10 > b.length || b(off) != 0x1f.toByte ||
        (b(off + 1) & 0xff) != 0x8b || b(off + 2) != 0x08.toByte)
      return None
    val flg = b(off + 3) & 0xff
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      if (p + 2 > b.length) return None
      p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
      if (p > b.length) return None
    }
    if ((flg & 8) != 0) { // FNAME: NUL-terminated
      while (p < b.length && b(p) != 0) p += 1
      p += 1; if (p > b.length) return None
    }
    if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
      while (p < b.length && b(p) != 0) p += 1
      p += 1; if (p > b.length) return None
    }
    if ((flg & 2) != 0) { p += 2; if (p > b.length) return None } // FHCRC
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, p, b.length - p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n == 0) {
          if (!inf.finished()) return None // truncated / dictionary demand
        } else {
          total += n
          if (total > cap) return None
          out.write(buf, 0, n)
        }
      }
      val used = inf.getBytesRead.toInt
      val tEnd = p + used + 8
      if (tEnd > b.length) return None
      val body = out.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      def le32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      if (le32(p + used) != crc.getValue ||
          le32(p + used + 4) != (body.length & 0xffffffffL)) None
      else Some((body, tEnd))
    } finally inf.end()
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
