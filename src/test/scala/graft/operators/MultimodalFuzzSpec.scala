package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Poison-blob totality: at 100 TB a decode task WILL see arbitrary
  * bytes (truncated uploads, bit rot, hostile input), and one thrown
  * exception or non-terminating parse kills a task and, with retries,
  * the job. Every media decoder must be TOTAL — a row out for any
  * bytes in, crash-free and loop-free. The crafted-RIFF regression
  * (ADVICE r7: a chunk size near 2^32 spun the walk forever) lives in
  * MultimodalSpec; this spec generalizes it with generated input:
  * pure-random blobs plus structure-aware mutations (valid magics with
  * garbage bodies, truncations of VALID containers at every prefix
  * length — the mutation class that finds parser bugs random bytes
  * never reach).
  */
class MultimodalFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def decodeAll(blobs: Seq[Array[Byte]]): Unit = {
    val df = blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
    // every decoder must return exactly one row per input (video may
    // emit frame rows OR one quarantine row — at least one, finite)
    assert(Multimodal.decodeImage(spark, df, "id", "media").count()
      == blobs.size)
    // the aHash decoder shares decodeImage's reader walk but adds the
    // geometry gate + band fold — same totality bar, and any non-128-px
    // or failed decode must land as a quarantine row (b0 = -1), never
    // a partial hash
    val ah = Multimodal.decodeImageAHash(spark, df, "id", "media").collect()
    assert(ah.length == blobs.size)
    assert(ah.forall(h => h.b0 == -1L ||
      (Seq(h.b0, h.b1, h.b2, h.b3).forall(b => b >= 0L && b <= 65535L))))
    // resize shares the reader walk and adds subsample + re-encode +
    // re-decode: one row per input, quarantine = -1 geometry with an
    // EMPTY output blob (never a partial/corrupt re-encode)
    val rz = Multimodal.resizeImage(spark, df, "id", "media", 2).collect()
    assert(rz.length == blobs.size)
    assert(rz.forall(r => (r.w_out == -1 && r.media_out.isEmpty) ||
      (r.w_out > 0 && r.h_out > 0 && r.media_out.nonEmpty &&
        r.mean_luma_out_x1000 >= 0L)))
    assert(Multimodal.decodeAudio(spark, df, "id", "media").count()
      == blobs.size)
    // frame features: ≥ 1 row per input (quarantine or frames), and
    // never more frames than bytes allow
    val af = Multimodal.audioFrameFeatures(spark, df, "id", "media", 32)
      .collect().groupBy(_.id)
    assert(af.size == blobs.size)
    blobs.zipWithIndex.foreach { case (b, i) =>
      assert(af(i.toLong).length <= math.max(1, b.length / 64)) }
    assert(Multimodal.sampleVideoFrames(spark, df, "id", "media", everyN = 2)
      .groupByKey(_.id).count().count() == blobs.size)
  }

  test("random bytes: decoders are total (no throw, no hang)") {
    val gen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    val blobs = Gen.listOfN(60, gen).sample.get.map(_.toArray)
    decodeAll(blobs)
  }

  test("valid magics with garbage bodies and hostile length fields") {
    def le(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def be(v: Long) = le(v).reverse
    val pngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val blobs = Seq(
      pngMagic ++ Array.fill[Byte](40)(0x41),
      pngMagic ++ be(0xFFFFFFFFL) ++ "IHDR".getBytes ++ Array.fill[Byte](8)(0),
      "RIFF".getBytes ++ le(0xFFFFFFFFL) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le(0xFFFFFFF0L) ++ Array.fill[Byte](24)(1),
      "RIFF".getBytes ++ le(36L) ++ "WAVE".getBytes ++
        "data".getBytes ++ le(0L) ++ Array.fill[Byte](8)(0), // no fmt
      "GVID".getBytes ++ be(1000000L) ++ le(0L),            // frame-count lie
      "GVID".getBytes ++ be(2L) ++ be(0xFFFFFFF0L),         // hostile frame len
      "GVID".getBytes ++ be(1L) ++ be(10L) ++ Array.fill[Byte](3)(9)) // short
    decodeAll(blobs)
  }

  test("every truncation of a VALID container quarantines or decodes") {
    val doc = Seq((1L, "the quick brown fox jumps over the lazy dog " * 4))
      .toDF("doc_id", "text")
    val png = Multimodal.encodeGrayPng(spark, doc, "doc_id", "text", 16, 8)
      .collect().head.getAs[Array[Byte]]("media")
    val wav = Multimodal.encodePcmWav(spark, doc, "doc_id", "text", 64, 8000)
      .collect().head.getAs[Array[Byte]]("media")
    val vid = Multimodal.encodeFrameVideo(spark, doc, "doc_id", "text", 16, 8)
      .collect().head.getAs[Array[Byte]]("media")
    // cut at a spread of prefix lengths including every boundary ±1
    def cuts(b: Array[Byte]): Seq[Array[Byte]] =
      (0 to b.length by math.max(1, b.length / 40)).flatMap(i =>
        Seq(i - 1, i, i + 1)).distinct
        .filter(i => i >= 0 && i <= b.length).map(b.take)
    decodeAll(cuts(png) ++ cuts(wav) ++ cuts(vid))
  }
}
