package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WARC/1.0 read-mode contract: version-line + header parse,
  * Content-Length framing, per-record gzip members with EXACT
  * boundary location (deflate end + verified CRC/ISIZE trailer),
  * poisoned-member resync, the quarantine taxonomy, and totality on
  * hostile bytes — the last gap between "Common-Crawl-shaped" and
  * "reads Common Crawl". */
class WarcSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("UTF-8")

  private def rec(rtype: String, url: String, payload: Array[Byte],
                  date: String = "2026-08-01T00:00:00Z",
                  ct: String = "application/http; msgtype=response",
                  extraHdr: String = ""): Array[Byte] = {
    val uri = if (url == null) "" else s"WARC-Target-URI: $url\r\n"
    bytes(s"WARC/1.0\r\nWARC-Type: $rtype\r\n$uri" +
      s"WARC-Date: $date\r\n$extraHdr" +
      s"Content-Type: $ct\r\nContent-Length: ${payload.length}\r\n\r\n") ++
      payload ++ bytes("\r\n\r\n")
  }

  private def gz(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(raw); g.close()
    bos.toByteArray
  }

  test("gzip-member archive round-trips: one member per record") {
    val p1 = bytes("HTTP/1.1 200 OK\r\n\r\nhello world")
    val p2 = bytes("GET /a HTTP/1.1\r\n\r\n")
    val arc = gz(rec("response", "http://a.example/x", p1)) ++
      gz(rec("request", "http://a.example/x", p2))
    val rs = CrawlArchive.demuxWarc("w", arc)
    assert(rs.map(_.status) == Seq("ok", "ok"))
    assert(rs.map(_.rec_type) == Seq("response", "request"))
    assert(rs.map(_.rec_idx) == Seq(0L, 1L))
    assert(rs(0).body.sameElements(p1) && rs(1).body.sameElements(p2))
    assert(rs(0).n_bytes == p1.length)
    assert(rs(0).url == "http://a.example/x")
    assert(rs(0).warc_date == "2026-08-01T00:00:00Z")
    assert(rs(0).warc_content_type == "application/http; msgtype=response")
  }

  test("plain (uncompressed) archive round-trips") {
    val p1 = bytes("payload one")
    val p2 = bytes("payload two, longer")
    val arc = rec("response", "http://a/1", p1) ++
      rec("metadata", "http://a/1", p2, ct = "application/warc-fields")
    val rs = CrawlArchive.demuxWarc("w", arc)
    assert(rs.map(_.status) == Seq("ok", "ok"))
    assert(rs(1).rec_type == "metadata" &&
      rs(1).body.sameElements(p2))
  }

  test("poisoned member quarantines its span and the walk resyncs") {
    val p1 = bytes("before the poison")
    val p3 = bytes("after the poison")
    val arc = gz(rec("response", "http://a/1", p1)) ++
      CrawlArchive.PoisonMember ++
      gz(rec("response", "http://a/3", p3))
    val rs = CrawlArchive.demuxWarc("w", arc)
    assert(rs.map(_.status) == Seq("ok", "corrupt_gzip", "ok"))
    assert(rs(1).body.sameElements(CrawlArchive.PoisonMember))
    assert(rs(1).n_bytes == CrawlArchive.PoisonMember.length)
    assert(rs(2).url == "http://a/3" && rs(2).body.sameElements(p3))
    assert(rs.map(_.rec_idx) == Seq(0L, 1L, 2L))
  }

  test("a lying gzip trailer (bad CRC) is a poisoned member") {
    val good = gz(rec("response", "http://a/1", bytes("body")))
    val bad = good.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0xff).toByte // CRC byte
    val rs = CrawlArchive.demuxWarc("w",
      bad ++ gz(rec("response", "http://a/2", bytes("next"))))
    assert(rs.head.status == "corrupt_gzip")
    assert(rs.last.status == "ok" && rs.last.url == "http://a/2")
  }

  test("missing Target-URI quarantines as corrupt except warcinfo") {
    val arc = gz(rec("response", null, bytes("lost the request line"))) ++
      gz(rec("warcinfo", null, bytes("software: graft\r\n"),
        ct = "application/warc-fields"))
    val rs = CrawlArchive.demuxWarc("w", arc)
    assert(rs(0).status == "corrupt" && rs(0).rec_type == "response" &&
      rs(0).body.sameElements(bytes("lost the request line")))
    assert(rs(1).status == "ok" && rs(1).rec_type == "warcinfo" &&
      rs(1).url == null)
  }

  test("bad Content-Length: terminal in plain mode, local in member mode") {
    val goodP = rec("response", "http://a/1", bytes("first"))
    val badHdr = bytes("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://a/2\r\nWARC-Date: d\r\n" +
      "Content-Type: t\r\nContent-Length: zz9\r\n\r\nrest here")
    // plain: the bad record ends the walk (no trustworthy resync)
    val plain = CrawlArchive.demuxWarc("w",
      goodP ++ badHdr ++ rec("response", "http://a/3", bytes("never")))
    assert(plain.map(_.status) == Seq("ok", "truncated"))
    assert(new String(plain(1).body, "UTF-8").startsWith("rest here"))
    // member mode: the member frames it — later members still extract
    val member = CrawlArchive.demuxWarc("w",
      gz(badHdr) ++ gz(rec("response", "http://a/3", bytes("extracted"))))
    assert(member.map(_.status) == Seq("truncated", "ok"))
    assert(member(1).url == "http://a/3")
  }

  test("foreign junk between members: distinct label, keep, resync") {
    val p1 = bytes("before the junk")
    val p3 = bytes("after the junk")
    val junk = bytes("<html>not gzip at all, plain text splice</html>")
    val arc = gz(rec("response", "http://a/1", p1)) ++ junk ++
      gz(rec("response", "http://a/3", p3))
    val rs = CrawlArchive.demuxWarc("w", arc)
    assert(rs.map(_.status) == Seq("ok", "foreign", "ok"))
    assert(rs(1).body.sameElements(junk)) // kept, never dropped
    assert(rs(2).url == "http://a/3" && rs(2).body.sameElements(p3))
    assert(rs(1).n_bytes == junk.length)
  }

  test("embedded member magic inside a poison span: walk total, ok stable") {
    // a hostile corrupt span CONTAINING the resync trigram 1f 8b 08 —
    // the scan false-starts there, yielding extra corrupt rows, but
    // the walk must stay total and the ok records byte-stable
    val p1 = bytes("good one")
    val p3 = bytes("good two")
    val embedded = Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08.toByte) ++
      bytes("garbage that CRC-fails")
    val poison = bytes("JUNKJUNK") ++ embedded ++ bytes("more junk")
    val arc = gz(rec("response", "http://a/1", p1)) ++ poison ++
      gz(rec("response", "http://a/3", p3))
    val rs = CrawlArchive.demuxWarc("w", arc)
    // ok records identical to the clean archive's
    val oks = rs.filter(_.status == "ok")
    assert(oks.map(_.url) == Seq("http://a/1", "http://a/3"))
    assert(oks(0).body.sameElements(p1) && oks(1).body.sameElements(p3))
    // every non-ok row keeps its span; spans tile the poison exactly
    val quarantined = rs.filter(_.status != "ok")
    assert(quarantined.nonEmpty && quarantined.forall(_.body != null))
    assert(quarantined.map(_.body.length).sum == poison.length)
    // first span opens with foreign bytes, the false-start with magic
    assert(quarantined.head.status == "foreign")
    assert(quarantined.tail.forall(_.status == "corrupt_gzip"))
  }

  test("poison span tiling under many embedded magics stays total") {
    // several magics inside one junk region: each false resync start
    // must consume at least one byte (no infinite loop) and the
    // concatenation of all quarantined spans equals the junk region
    val magic = Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08.toByte)
    val junk = bytes("x") ++ magic ++ bytes("ab") ++ magic ++
      bytes("c") ++ magic
    val tail = gz(rec("response", "http://a/9", bytes("survivor")))
    val rs = CrawlArchive.demuxWarc("w",
      gz(rec("response", "http://a/0", bytes("head"))) ++ junk ++ tail)
    val oks = rs.filter(_.status == "ok")
    assert(oks.map(_.url) == Seq("http://a/0", "http://a/9"))
    val quarantined = rs.filter(_.status != "ok")
    assert(quarantined.map(_.body.length).sum == junk.length)
    assert(quarantined.flatMap(_.body).toSeq == junk.toSeq) // exact tiling
  }

  test("declared length past the member body keeps what's there") {
    val hdr = bytes("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://a/1\r\nWARC-Date: d\r\n" +
      "Content-Type: t\r\nContent-Length: 5000\r\n\r\nonly this much")
    val rs = CrawlArchive.demuxWarc("w", gz(hdr))
    assert(rs.head.status == "truncated" &&
      new String(rs.head.body, "UTF-8") == "only this much")
  }

  test("revisit records surface the dedup pointer") {
    // Common Crawl's URL-level dedup: a revisit record names the
    // ORIGINAL capture via WARC-Refers-To-Target-URI and carries a
    // headers-only payload
    val arc = gz(rec("revisit", "http://a/dup", bytes("HTTP/1.1 200 OK\r\n\r\n"),
      extraHdr = "WARC-Refers-To-Target-URI: http://a/original\r\n")) ++
      gz(rec("response", "http://a/x", bytes("normal body")))
    val rs = CrawlArchive.demuxWarc("w", arc)
    assert(rs(0).status == "ok" && rs(0).rec_type == "revisit")
    assert(rs(0).url == "http://a/dup")
    assert(rs(0).warc_refers_to == "http://a/original")
    assert(rs(1).warc_refers_to == null)
  }

  test("non-WARC bytes are one corrupt_container row") {
    for (junk <- Seq("not an archive at all", "GARC junk", ""))
      assert(CrawlArchive.demuxWarc("w", bytes(junk)).map(_.status)
        == Seq("corrupt_container"))
  }

  test("gzip members with FNAME/FEXTRA header fields still locate ends") {
    // a member written with optional header fields set — the manual
    // header parse must skip them to find the deflate stream
    val inner = rec("response", "http://a/1", bytes("optional fields"))
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(inner); deflater.finish()
    val dbos = new java.io.ByteArrayOutputStream()
    val dbuf = new Array[Byte](8192)
    while (!deflater.finished()) dbos.write(dbuf, 0, deflater.deflate(dbuf))
    deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(inner)
    def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val name = "rec.warc".getBytes("UTF-8")
    val extra = Array[Byte](4, 0, 'a', 'b', 'c', 'd') // xlen=4 LE + data
    val member = Array[Byte](0x1f.toByte, 0x8b.toByte, 8,
      (8 | 4).toByte, // FNAME | FEXTRA
      0, 0, 0, 0, 0, 0) ++ extra ++ name ++ Array[Byte](0) ++
      dbos.toByteArray ++ le32(crc.getValue) ++ le32(inner.length.toLong)
    val tail = gz(rec("response", "http://a/2", bytes("after")))
    val rs = CrawlArchive.demuxWarc("w", member ++ tail)
    assert(rs.map(_.status) == Seq("ok", "ok"))
    assert(rs(0).body.sameElements(bytes("optional fields")) ||
      new String(rs(0).body, "UTF-8").contains("optional fields"))
    assert(rs(0).url == "http://a/1" && rs(1).url == "http://a/2")
  }

  test("encodeWarc → extractWarc round-trip via Spark, both layouts") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val recs = Seq(
      ("a", 0L, "response", "http://a/0", "2026-08-01T00:00:00Z",
        "application/http; msgtype=response",
        bytes("HTTP/1.1 200 OK\r\n\r\nbody zero"), false),
      ("a", 1L, "request", "http://a/0", "2026-08-01T00:00:00Z",
        "application/http; msgtype=request", bytes("GET /0"), false),
      ("a", 2L, "response", "http://a/2", "2026-08-02T00:00:00Z",
        "application/http; msgtype=response", bytes("poisoned away"), true),
      ("b", 0L, "response", "http://b/0", "2026-08-03T00:00:00Z",
        "application/http; msgtype=response", bytes("b archive"), false))
      .toDF("src", "rid", "rtype", "url", "ts", "ct", "payload", "poison")
    for (gzip <- Seq(true, false)) {
      val arcs = CrawlArchive.encodeWarc(spark, recs, "src", "rid", "rtype",
        "url", "ts", "ct", "payload",
        poisonIfCol = if (gzip) Some("poison") else None,
        gzipMembers = gzip)
      val out = CrawlArchive.extractWarc(spark, arcs, "archive", "bytes")
        .collect().sortBy(r => (r.archive, r.rec_idx))
      if (gzip) {
        assert(out.map(_.status).toSeq ==
          Seq("ok", "ok", "corrupt_gzip", "ok"))
        assert(new String(out(0).body, "UTF-8").endsWith("body zero"))
      } else {
        assert(out.forall(_.status == "ok"))
        assert(out.map(_.rec_type).toSeq ==
          Seq("response", "request", "response", "response"))
      }
    }
  }

  test("totality: random bytes and every-prefix truncation never throw") {
    val rnd = new scala.util.Random(1313)
    for (_ <- 1 to 200) {
      val b = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      CrawlArchive.demuxWarc("z", b) // must not throw
    }
    val full = gz(rec("response", "http://a/1", bytes("prefix battery"))) ++
      gz(rec("response", "http://a/2", bytes("second record")))
    for (n <- 0 to full.length) {
      val rs = CrawlArchive.demuxWarc("z", full.take(n))
      assert(rs.nonEmpty || n == 0, s"cut $n")
      if (n == full.length)
        assert(rs.map(_.status) == Seq("ok", "ok"))
    }
    // plain-mode prefixes too
    val plainFull = rec("response", "http://a/1", bytes("plain prefix"))
    for (n <- 5 to plainFull.length)
      CrawlArchive.demuxWarc("z", plainFull.take(n))
  }
}
