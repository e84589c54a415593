package graft.sources

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Poison-byte totality for the archive demuxer: archives arrive from
  * crawlers and object stores, so the reader must be TOTAL — rows out
  * for ANY bytes in, crash-free, structurally bounded (≤ declared
  * record count + one quarantine row), and ok-rows only where framing
  * genuinely holds. Three attack classes, same bar as
  * MultimodalFuzzSpec: random bytes, structure-aware point mutations
  * of a VALID archive, and truncation at EVERY prefix length — the
  * class that finds off-by-one framing edges random bytes never hit. */
class CrawlArchiveFuzzSpec extends AnyFunSuite {

  private def valid(nRecs: Int, gzipEvery: Int = 0): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte]('G', 'A', 'R', 'C'))
    def be32(v: Int) = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    bos.write(be32(nRecs))
    (0 until nRecs).foreach { i =>
      val raw = ("payload-" * (i + 1)).getBytes("UTF-8")
      val payload =
        if (gzipEvery > 0 && i % gzipEvery == 0) {
          val b = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(b)
          gz.write(raw); gz.close()
          b.toByteArray
        } else raw
      bos.write((s"Target-URI: https://h/p$i\nFetch-Ts: 2026-08-0${i % 9 + 1}\n" +
        s"Content-Type: text/plain\n\n").getBytes("UTF-8"))
      bos.write(be32(payload.length))
      bos.write(payload)
    }
    bos.toByteArray
  }

  /** The totality + boundedness invariants every mutant must hold. */
  private def check(bytes: Array[Byte]): Unit = {
    val rows = CrawlArchive.demux("z", bytes)
    val validMagic = bytes.length >= 8 &&
      bytes.startsWith(Array[Byte]('G', 'A', 'R', 'C'))
    val declared =
      if (validMagic)
        ((bytes(4) & 0xffL) << 24) | ((bytes(5) & 0xffL) << 16) |
          ((bytes(6) & 0xffL) << 8) | (bytes(7) & 0xffL)
      else 0L
    // a well-formed archive declaring ZERO records is the only blob
    // that may demux to zero rows — anything else yields at least a
    // quarantine marker (never a silent drop)
    if (!(validMagic && declared == 0L))
      assert(rows.nonEmpty, "a blob must never silently demux to zero rows")
    // bounded: at most the declared count plus one quarantine marker
    assert(rows.size <= declared + 1)
    // rec_idx strictly ascending over record rows; quarantine typed
    val recIdx = rows.filter(_.rec_idx >= 0).map(_.rec_idx)
    assert(recIdx == recIdx.sorted && recIdx.distinct == recIdx)
    rows.foreach { r =>
      assert(Set("ok", "corrupt", "truncated", "corrupt_container",
        "corrupt_gzip")(r.status))
      if (r.status == "ok") {
        assert(r.url != null && r.n_bytes >= 0 &&
          r.body.length == r.n_bytes)
      }
      // a quarantined gzip member keeps its RAW compressed bytes
      if (r.status == "corrupt_gzip")
        assert(r.body != null && r.body.length == r.n_bytes &&
          r.body(0) == 0x1f.toByte && (r.body(1) & 0xff) == 0x8b)
    }
  }

  test("random byte blobs never crash the demuxer") {
    val gen = for {
      n <- Gen.choose(0, 400)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray
    (1 to 300).foreach { i =>
      check(gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).get)
    }
  }

  test("point mutations of a valid archive stay total and bounded") {
    val base = valid(4)
    val rnd = new scala.util.Random(42)
    (1 to 400).foreach { _ =>
      val m = base.clone()
      val k = 1 + rnd.nextInt(3)
      (0 until k).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      check(m)
    }
  }

  test("truncation at every prefix of a valid archive stays total") {
    val base = valid(3)
    (0 to base.length).foreach { n =>
      check(java.util.Arrays.copyOf(base, n))
    }
    // and the untouched archive parses fully ok
    val rows = CrawlArchive.demux("z", base)
    assert(rows.size == 3 && rows.forall(_.status == "ok"))
  }

  test("mutated gzip members quarantine as corrupt_gzip, never derail") {
    val base = valid(4, gzipEvery = 2) // records 0 and 2 compressed
    // untouched: compression must be invisible
    val clean = CrawlArchive.demux("z", base)
    assert(clean.size == 4 && clean.forall(_.status == "ok"))
    assert(new String(clean(2).body, "UTF-8") == "payload-" * 3)
    val rnd = new scala.util.Random(1234)
    var sawCorruptGzip = false
    (1 to 400).foreach { _ =>
      val m = base.clone()
      val k = 1 + rnd.nextInt(3)
      (0 until k).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      check(m)
      val rows = CrawlArchive.demux("z", m)
      if (rows.exists(_.status == "corrupt_gzip")) {
        sawCorruptGzip = true
        // a broken member must never take its SUCCESSORS down: with
        // the declared count intact (a mutation can also hit the
        // count field), a corrupt_gzip row before the last record
        // still leaves later record rows present — framing is by
        // compressed length, so the walk resyncs
        val declaredIntact =
          java.util.Arrays.equals(java.util.Arrays.copyOfRange(m, 4, 8),
            java.util.Arrays.copyOfRange(base, 4, 8))
        if (declaredIntact) {
          val idxs = rows.filter(_.rec_idx >= 0).map(_.rec_idx)
          rows.filter(r => r.status == "corrupt_gzip" && r.rec_idx < 3)
            .foreach(r => assert(idxs.exists(_ > r.rec_idx),
              s"member ${r.rec_idx} corrupt_gzip but no successor rows"))
        }
      }
    }
    assert(sawCorruptGzip, "the mutation battery never hit a gzip member")
    // and truncation across the gzip-member archive stays total
    (0 to base.length).foreach(n => check(java.util.Arrays.copyOf(base, n)))
  }
}
