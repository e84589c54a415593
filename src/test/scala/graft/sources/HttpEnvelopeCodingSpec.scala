package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Body-coding + charset-resolution contract (the q211/q212 layers):
  * chunk-framing removal in wire order with Content-Encoding, the
  * bounded gzip/deflate inflate, every quarantine class keeping raw
  * bytes, and the header > BOM > meta > default charset precedence
  * with decoy declarations that would shred the text if the order
  * were wrong. */
class HttpEnvelopeCodingSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("ISO-8859-1")

  private def env(hdrs: String, body: Array[Byte]): Array[Byte] =
    bytes("HTTP/1.1 200 OK\r\n" + hdrs + "\r\n") ++ body

  private def chunk(b: Array[Byte], n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < b.length) {
      val len = math.min(n, b.length - i)
      bos.write(bytes(s"${len.toHexString}\r\n"))
      bos.write(b, i, len); bos.write(bytes("\r\n"))
      i += len
    }
    bos.write(bytes("0\r\n\r\n"))
    bos.toByteArray
  }

  private def gz(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(raw); g.close()
    bos.toByteArray
  }

  private def zstd(raw: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(raw, 3)

  test("chunked framing removed; extensions and lone-LF tolerated") {
    val body = "twelve bytes of chunked payload here".getBytes("UTF-8")
    val r = HttpEnvelope.parse("a",
      env("Transfer-Encoding: chunked\r\n", chunk(body, 7)))
    assert(r.transfer_coding == "chunked" && r.body_text ==
      "twelve bytes of chunked payload here")
    // chunk extension after ';' and bare-LF line ends both parse
    val ext = bytes("5;name=v\nhello\n0\n\n")
    val e = HttpEnvelope.parse("a", env("Transfer-Encoding: chunked\r\n", ext))
    assert(e.transfer_coding == "chunked" && e.body_text == "hello")
  }

  test("broken chunk framing: raw kept, content decode skipped") {
    for (broken <- Seq(
        "zz\r\nhello",            // non-hex size
        "ff\r\nshort",            // declared size past buffer
        "5\r\nhelloX0\r\n\r\n",   // missing CRLF after chunk data
        "5\r\nhello\r\n"))        // no terminal chunk
    {
      val r = HttpEnvelope.parse("a", env(
        "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
        bytes(broken)))
      assert(r.transfer_coding == "chunked_error", broken)
      assert(r.content_coding == "skipped", broken)
      assert(new String(r.body, "ISO-8859-1") == broken)
    }
  }

  test("gzip content-coding inflates; truncation quarantines with raw bytes") {
    val txt = "gzip round trip 世界 content"
    val g = gz(txt.getBytes("UTF-8"))
    val ok = HttpEnvelope.parse("a", env("Content-Encoding: gzip\r\n", g))
    assert(ok.content_coding == "gzip" && ok.body_text == txt)
    val half = g.take(g.length / 2)
    val bad = HttpEnvelope.parse("a", env("Content-Encoding: gzip\r\n", half))
    assert(bad.content_coding == "gzip_error" &&
      bad.body.sameElements(half) && bad.env_status == "ok")
  }

  test("deflate: zlib-wrapped and raw-deflate fallback both inflate") {
    val raw = "deflate payload body".getBytes("UTF-8")
    def defl(nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(raw); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    for (nowrap <- Seq(false, true)) {
      val r = HttpEnvelope.parse("a",
        env("Content-Encoding: deflate\r\n", defl(nowrap)))
      assert(r.content_coding == "deflate" &&
        r.body_text == "deflate payload body", s"nowrap=$nowrap")
    }
    val junk = HttpEnvelope.parse("a",
      env("Content-Encoding: deflate\r\n", bytes("not deflate at all ###")))
    assert(junk.content_coding == "deflate_error")
  }

  test("unknown and multi-valued content codings are unsupported, raw kept") {
    // the first-to-come-off (last-listed) undecodable coding names
    // the class: br/zstd priced apart from the generic bucket
    for ((ce, lbl) <- Seq("br" -> "br_unsupported",
        "gzip, br" -> "br_unsupported",
        "br, gzip2" -> "unsupported", "compress" -> "unsupported")) {
      val r = HttpEnvelope.parse("a",
        env(s"Content-Encoding: $ce\r\n", bytes("opaque")))
      assert(r.content_coding == lbl, ce)
      assert(r.body.sameElements(bytes("opaque")), ce)
    }
    // a mislabeled outermost token still prices as zstd when the
    // bytes carry zstd's frame magic (28 B5 2F FD)
    val zs = Array(0x28, 0xb5, 0x2f, 0xfd, 0x01, 0x02).map(_.toByte)
    assert(HttpEnvelope.parse("a",
      env("Content-Encoding: x-zstd\r\n", zs)).content_coding
      == "zstd_unsupported")
    // ...but NOT when the failing coding is an INNER one — the bytes
    // at hand are in the (supported) outermost coding, so the magic
    // says nothing about the undecodable inner token
    assert(HttpEnvelope.parse("a",
      env("Content-Encoding: x-zstd, gzip\r\n", zs)).content_coding
      == "unsupported")
  }

  test("zstd content-coding decodes for real; defective frames quarantine") {
    val txt = "zstd round trip 世界 content body"
    val z = zstd(txt.getBytes("UTF-8"))
    val ok = HttpEnvelope.parse("a", env("Content-Encoding: zstd\r\n", z))
    assert(ok.content_coding == "zstd" && ok.body_text == txt)
    // defective frame (magic + junk): zstd_error, raw kept — a
    // DECLARED-zstd body that fails to decode is a frame defect, not
    // a coding gap, so it no longer prices as zstd_unsupported
    val fake = Array(0x28, 0xb5, 0x2f, 0xfd, 0x01, 0x02).map(_.toByte)
    val bad = HttpEnvelope.parse("a",
      env("Content-Encoding: zstd\r\n", fake))
    assert(bad.content_coding == "zstd_error" &&
      bad.body.sameElements(fake) && bad.env_status == "ok")
    // truncated real frame also quarantines with raw bytes
    val half = z.take(z.length / 2)
    val tr = HttpEnvelope.parse("a", env("Content-Encoding: zstd\r\n", half))
    assert(tr.content_coding == "zstd_error" && tr.body.sameElements(half))
    // chains: 'zstd, gzip' = zstd applied first → gzip comes off first
    val chained = HttpEnvelope.parse("a",
      env("Content-Encoding: zstd, gzip\r\n", gz(z)))
    assert(chained.content_coding == "zstd+gzip" && chained.body_text == txt)
    // TE zstd-over-chunked: de-chunk then zstd-decode, one label
    val te = HttpEnvelope.parse("a", env(
      "Transfer-Encoding: zstd, chunked\r\n", chunk(z, 13)))
    assert(te.transfer_coding == "zstd+chunked" && te.body_text == txt)
    // zip-bomb discipline: the cap applies to zstd exactly as to gzip
    assert(CrawlArchive.zstdInflate(z, cap = 4L).isEmpty)
  }

  test("zstd inflate is total on hostile bytes") {
    val rnd = new scala.util.Random(777)
    for (i <- 1 to 200) {
      val n = rnd.nextInt(96)
      val b = Array.fill(n)(rnd.nextInt(256).toByte)
      // with and without a real frame magic prefix: never throws
      CrawlArchive.zstdInflate(b, 1L << 20)
      CrawlArchive.zstdInflate(
        Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte) ++ b, 1L << 20)
      // and every prefix of a valid frame decodes-or-quarantines
      if (i <= 20) {
        val z = zstd(("prefix " * i).getBytes("UTF-8"))
        val r = HttpEnvelope.parse("z",
          env("Content-Encoding: zstd\r\n", z.take(i * z.length / 20)))
        assert(Set("zstd", "zstd_error")(r.content_coding))
      }
    }
  }

  test("chunked-over-gzip removes both layers in wire order") {
    val txt = "both layers present in this body"
    val r = HttpEnvelope.parse("a", env(
      "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      chunk(gz(txt.getBytes("UTF-8")), 11)))
    assert(r.transfer_coding == "chunked" && r.content_coding == "gzip" &&
      r.body_text == txt)
  }

  test("charset precedence: header > BOM > meta > default, decoy-pinned") {
    val txt = "tokens survive only under the right charset"
    // header beats the meta decoy (body really is UTF-16BE)
    val h = HttpEnvelope.parse("a", env(
      "Content-Type: text/html; charset=utf-16be\r\n",
      ("<meta charset=utf-8>" + txt).getBytes("UTF-16BE")))
    assert(h.charset_source == "header" && h.charset_used == "utf-16be" &&
      h.body_text == "<meta charset=utf-8>" + txt)
    // BOM beats the meta decoy; BOM stripped from text, kept in body
    val withBom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      ("<meta charset=utf-16be>" + txt).getBytes("UTF-8")
    val b = HttpEnvelope.parse("a",
      env("Content-Type: text/html\r\n", withBom))
    assert(b.charset_source == "bom" && b.charset_used == "utf-8" &&
      b.body_text == "<meta charset=utf-16be>" + txt &&
      b.body.sameElements(withBom))
    // honest meta
    val m = HttpEnvelope.parse("a", env("Content-Type: text/html\r\n",
      ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
        "charset=utf-8\">" + txt).getBytes("UTF-8")))
    assert(m.charset_source == "meta" && m.charset_used == "utf-8")
    // meta past the 1024-byte prescan window is ignored
    val far = HttpEnvelope.parse("a", env("Content-Type: text/html\r\n",
      (" " * 1100 + "<meta charset=utf-16be>" + txt).getBytes("UTF-8")))
    assert(far.charset_source == "default" && far.charset_used == "utf-8")
    // prescan never runs outside text/html
    val plain = HttpEnvelope.parse("a", env("Content-Type: text/plain\r\n",
      ("<meta charset=utf-16be>" + txt).getBytes("UTF-8")))
    assert(plain.charset_source == "default" && plain.charset_used == "utf-8")
  }

  test("UTF-16 BOMs resolve and strip") {
    val txt = "wide chars é世"
    val le = HttpEnvelope.parse("a", env("Content-Type: text/html\r\n",
      Array(0xff.toByte, 0xfe.toByte) ++ txt.getBytes("UTF-16LE")))
    assert(le.charset_used == "utf-16le" && le.charset_source == "bom" &&
      le.body_text == txt)
    val be = HttpEnvelope.parse("a", env("Content-Type: text/html\r\n",
      Array(0xfe.toByte, 0xff.toByte) ++ txt.getBytes("UTF-16BE")))
    assert(be.charset_used == "utf-16be" && be.body_text == txt)
  }

  test("every-prefix truncation of a chunked+gzip envelope is total") {
    // the CrawlArchive battery applied to the coding layers: every
    // prefix of a fully-valid wire payload must parse without
    // throwing, and any prefix long enough to contain the complete
    // chunk framing must still decode it (truncation after the
    // terminal chunk only loses ignorable bytes)
    val txt = "prefix truncation survives every cut point"
    val full = env(
      "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      chunk(gz(txt.getBytes("UTF-8")), 9))
    for (n <- 0 to full.length) {
      val r = HttpEnvelope.parse("p", full.take(n))
      assert(Set("ok", "malformed", "none")(r.env_status), s"cut $n")
      if (n == full.length)
        assert(r.transfer_coding == "chunked" && r.content_coding == "gzip"
          && r.body_text == txt)
      else if (r.env_status == "ok")
        assert(Set("chunked", "chunked_error")(r.transfer_coding), s"cut $n")
    }
  }

  test("Content-Length frames the body; chunked supersedes it") {
    val txt = "entity body here"
    val junk = " ###connection junk###"
    def cl(n: Any, body: String) = HttpEnvelope.parse("a",
      env(s"Content-Length: $n\r\n", bytes(body)))
    val exact = cl(txt.length, txt)
    assert(exact.length_status == "exact" && exact.body_text == txt)
    val trimmed = cl(txt.length, txt + junk)
    assert(trimmed.length_status == "trimmed" && trimmed.body_text == txt)
    val short = cl(txt.length + 500, txt)
    assert(short.length_status == "short_body" && short.body_text == txt)
    val bad = cl("12abc", txt)
    assert(bad.length_status == "invalid" && bad.body_text == txt)
    assert(HttpEnvelope.parse("a", env("\r\n".drop(2), bytes(txt)))
      .length_status == "none")
    // trim happens BEFORE content decoding: gzip + trailing junk
    val g = gz(txt.getBytes("UTF-8"))
    val gj = HttpEnvelope.parse("a", env(
      s"Content-Encoding: gzip\r\nContent-Length: ${g.length}\r\n",
      g ++ bytes(junk)))
    assert(gj.length_status == "trimmed" && gj.content_coding == "gzip" &&
      gj.body_text == txt)
    // chunked wins (RFC 9112 §6.3 rule 3): the declared length would
    // cut the terminal chunk if applied
    val ch = HttpEnvelope.parse("a", env(
      s"Transfer-Encoding: chunked\r\nContent-Length: ${txt.length}\r\n",
      chunk(txt.getBytes("UTF-8"), 7)))
    assert(ch.length_status == "superseded" &&
      ch.transfer_coding == "chunked" && ch.body_text == txt)
  }

  test("TE gzip-over-chunked: de-chunk then inflate, one label") {
    val txt = "transfer-coded gzip under chunked framing"
    val r = HttpEnvelope.parse("a", env(
      "Transfer-Encoding: gzip, chunked\r\n",
      chunk(gz(txt.getBytes("UTF-8")), 13)))
    assert(r.transfer_coding == "gzip+chunked" && r.body_text == txt)
    // x-gzip is gzip's alias — canonical label, same decode
    val x = HttpEnvelope.parse("a", env(
      "Transfer-Encoding: x-gzip, chunked\r\n",
      chunk(gz(txt.getBytes("UTF-8")), 13)))
    assert(x.transfer_coding == "gzip+chunked" && x.body_text == txt)
    // and the declared length is superseded by ANY transfer coding
    assert(HttpEnvelope.parse("a", env(
      "Transfer-Encoding: gzip, chunked\r\nContent-Length: 3\r\n",
      chunk(gz(txt.getBytes("UTF-8")), 13))).length_status == "superseded")
  }

  test("TE lists we can't decode quarantine as unsupported, not plain") {
    val payload = bytes("opaque transfer-coded bytes")
    // unknown coding before chunked (br named; zstd now DECODES so it
    // left this battery); chunked not last and no-chunked-at-all are
    // framing violations → generic
    for ((te, lbl) <- Seq("br, chunked" -> "br_unsupported",
        "compress, chunked" -> "unsupported",
        "chunked, gzip" -> "unsupported", "gzip" -> "unsupported",
        "zstd" -> "unsupported")) { // zstd w/o chunked: framing violation
      val r = HttpEnvelope.parse("a",
        env(s"Transfer-Encoding: $te\r\nContent-Encoding: gzip\r\n", payload))
      assert(r.transfer_coding == lbl, te)
      assert(r.content_coding == "skipped", te) // never inflate past a defect
      assert(r.body.sameElements(payload), te)
    }
    // identity is a no-op member: 'identity, chunked' is just chunked
    val id = HttpEnvelope.parse("a", env(
      "Transfer-Encoding: identity, chunked\r\n",
      chunk(bytes("hello body"), 4)))
    assert(id.transfer_coding == "chunked" && id.body_text == "hello body")
  }

  test("TE coding defect after valid de-chunk: transfer_error, framed kept") {
    val g = gz("truncated under the framing".getBytes("UTF-8"))
    val framed = chunk(g.take(g.length / 2), 16) // valid chunks, broken gzip
    val r = HttpEnvelope.parse("a",
      env("Transfer-Encoding: gzip, chunked\r\n", framed))
    assert(r.transfer_coding == "transfer_error" &&
      r.content_coding == "skipped" && r.body.sameElements(framed))
  }

  test("Content-Encoding chains decode right-to-left") {
    val txt = "double compressed body survives the chain"
    val double = gz(gz(txt.getBytes("UTF-8")))
    val r = HttpEnvelope.parse("a",
      env("Content-Encoding: gzip, gzip\r\n", double))
    assert(r.content_coding == "gzip+gzip" && r.body_text == txt)
    // deflate applied first, then gzip: listed 'deflate, gzip', so the
    // gzip layer comes off first
    def defl(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    val mixed = gz(defl(txt.getBytes("UTF-8")))
    val m = HttpEnvelope.parse("a",
      env("Content-Encoding: deflate, gzip\r\n", mixed))
    assert(m.content_coding == "deflate+gzip" && m.body_text == txt)
    // a defect mid-chain keeps the RAW wire bytes, labels the failure
    val notDouble = gz(txt.getBytes("UTF-8")) // inner layer missing
    val bad = HttpEnvelope.parse("a",
      env("Content-Encoding: gzip, gzip\r\n", notDouble))
    assert(bad.content_coding == "gzip_error" &&
      bad.body.sameElements(notDouble))
  }

  test("Content-Length leading zeros are valid decimal syntax") {
    val txt = "entity body here"
    def cl(v: String, body: String) = HttpEnvelope.parse("a",
      env(s"Content-Length: $v\r\n", bytes(body)))
    assert(cl("0" * 18 + txt.length.toString, txt).length_status == "exact")
    assert(cl("0" * 25, "").length_status == "exact") // declared zero
    // 19 SIGNIFICANT digits is genuinely out of range
    assert(cl("1234567890123456789", txt).length_status == "invalid")
  }

  test("dechunk is total: zip of hostile inputs never throws") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(64)
      val b = Array.fill(n)(rnd.nextInt(256).toByte)
      HttpEnvelope.dechunk(b) // must not throw
      val r = HttpEnvelope.parse("z",
        env("Transfer-Encoding: chunked\r\nContent-Encoding: deflate\r\n", b))
      assert(Set("chunked", "chunked_error")(r.transfer_coding))
    }
  }
}
