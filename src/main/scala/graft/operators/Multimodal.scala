package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column next to
  * typed metadata; decode / feature-extraction runs as a partition-wise
  * batch transform.
  *
  * The Spark-side machinery — schema handling, `mapPartitions` batch
  * shape, typed output — is real and tested. Codecs come in two tiers:
  *  - REAL, pure-JDK: [[decodeImage]] (PNG/JPEG/GIF/BMP via
  *    javax.imageio) and [[decodeAudio]] (WAV/AIFF/AU PCM via
  *    javax.sound.sampled) decode actual rasters and PCM frames — no
  *    native libraries involved;
  *  - STUB where only native code exists (video containers, mp3/opus):
  *    [[decodeStub]] is a deterministic function of the bytes standing
  *    in where ffmpeg would be, its field derivations chosen so a SQL
  *    oracle can verify the plumbing end-to-end.
  *
  * Scale notes: one decode task per input partition, no shuffle; media
  * blobs stream through the iterator (never collected); with a real
  * codec only the body of [[decodeStub]] changes — schema and plan shape
  * stay identical. Size partitions by bytes
  * (`spark.sql.files.maxPartitionBytes`) so a task's blobs fit memory.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates (and fsyncs) a temp file, and 32 executor threads contend
  // on the temp directory — measured 23× wall at 10× rows before this
  // (sf1 stress, NOTES round 5). Media blobs here are row-sized; the
  // memory cache is strictly better. JVM-wide, set once.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded-media metadata (what a real decoder would emit). */
  final case class DecodedMedia(
      id: Long, format: String, width: Int, height: Int,
      n_bytes: Long, content_sha256: String)

  /** STUB decoder ≙ image header parse. Deterministic in the bytes:
    * width = n_bytes mod 640, height = first byte & 0x7f (0 if empty). */
  def decodeStub(id: Long, bytes: Array[Byte]): DecodedMedia = {
    val sha = MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    DecodedMedia(id, "fake", bytes.length % 640,
      if (bytes.isEmpty) 0 else bytes(0) & 0x7f, bytes.length.toLong, sha)
  }

  /** Partition-wise decode: (id, media binary) → typed metadata rows.
    * The iterator-in/iterator-out batch shape is where a vectorized
    * decoder or model-inference call slots in. */
  def decode(spark: SparkSession, media: DataFrame,
             idCol: String, binCol: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    // a NULL blob (failed download) decodes like an empty one instead
    // of NPE-ing the task; a NULL id cannot enter the (Long, bytes)
    // encoder at all, so those rows are dropped up front — a real
    // pipeline would route both to a quarantine sink
    media.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull)
      .withColumn(binCol, coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** [[decode]] with the drops routed to a dead-letter table instead of
    * vanishing: rows the decoder cannot process (null id — unkeyable;
    * null blob — failed download) are appended to `quarantineTable` as
    * (source, reason, payload) and only fully-valid rows are decoded.
    * Unlike plain [[decode]] — which coalesces a null blob to empty
    * bytes to stay total — the quarantined form treats both as
    * unprocessable, because here "not processed" is visible instead of
    * silent. Same partition-wise plan for the clean rows. */
  def decodeQuarantined(spark: SparkSession, media: DataFrame,
                        idCol: String, binCol: String,
                        store: graft.gdl.TableStore,
                        quarantineTable: String,
                        source: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    val clean = graft.sinks.DeadLetter.quarantine(store, quarantineTable,
      source, media,
      Seq("null_id" -> col(idCol).isNull, "null_blob" -> col(binCol).isNull))
    clean.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Attach a media binary column derived from text (the testdata has no
    * real media; utf-8 bytes stand in for an encoded frame). */
  def withFakeMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
                encode(col(textCol), "UTF-8").as("media"))

  // ---- REAL codecs (pure-JDK; no native libraries) ------------------
  //
  // javax.imageio ships PNG/JPEG/GIF/BMP readers and writers inside
  // every JVM, and javax.sound.sampled parses WAV/AIFF/AU PCM — so for
  // these formats the decode path is NOT a stub: real rasters, real PCM
  // frames, decoded partition-wise with the blobs never leaving their
  // partition. ffmpeg-class containers (video, mp3, opus) remain the
  // genuinely-unavailable part; their plumbing shape is [[decodeStub]]/
  // [[frameSample]].

  /** Real decoded-image row. `mean_luma_x1000` is over raster band 0
    * (gray/luma) — integer arithmetic so results are engine-exact. */
  final case class DecodedImage(
      id: Long, format: String, width: Int, height: Int,
      mean_luma_x1000: Long)

  /** Real decoded-audio row (PCM container headers + frames). */
  final case class DecodedAudio(
      id: Long, sample_rate_hz: Int, channels: Int, n_frames: Long,
      mean_abs_x1000: Long)

  /** Deterministic pixel/sample derivation from a doc's UTF-8 bytes:
    * byte i (unsigned), space-padded past the end. ASCII text ⇒ a SQL
    * oracle reproduces it with ascii(substr(text, i, 1)) — which is the
    * point: the REAL encode→decode roundtrip becomes value-checkable. */
  private def textByte(bytes: Array[Byte], i: Int): Int =
    if (i < bytes.length) bytes(i) & 0xff else 32

  /** Encode each doc's leading bytes as a `w`×`h` 8-bit GRAY PNG via
    * the JDK's real PNG writer (row-major pixels, space-padded).
    * Output: (id, media binary). Map-only, one encoder per row. */
  def encodeGrayPng(spark: SparkSession, docs: DataFrame, idCol: String,
                    textCol: String, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var i = 0
        while (i < w * h) {
          img.getRaster.setSample(i % w, i / w, 0, textByte(bytes, i))
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }).toDF("id", "media")
  }

  /** Run `f(format, image)` under the sniffed ImageIO reader with the
    * input stream closed and the reader disposed on EVERY path — the
    * fd/tmp-file discipline every image decoder here shares (three
    * hand-rolled copies of this walk had already drifted once: the
    * plain-decode copy leaked its stream while the aHash copy closed
    * it — ADVICE r8's leak, now fixed at the single site). `noReader`
    * when no installed reader claims the bytes; `onError(fmt)` for a
    * corrupt/truncated body behind a valid magic. */
  private def withImage[A](bytes: Array[Byte])(noReader: => A)(
      onError: String => A)(
      f: (String, java.awt.image.BufferedImage) => A): A = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) noReader
      else {
        val reader = readers.next()
        val fmt = reader.getFormatName.toLowerCase
        try {
          reader.setInput(iis)
          f(fmt, reader.read(0))
        } catch { case _: Exception => onError(fmt) }
        finally reader.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** REAL image decode: sniff the container (png/jpeg/gif/bmp) from the
    * stream, decode the raster, and reduce band 0 to an exact integer
    * mean. Bytes no JDK reader claims → ("unknown", -1, -1, -1) — a
    * quarantine row, not a task failure. Partition-wise, no shuffle. */
  def decodeImage(spark: SparkSession, media: DataFrame,
                  idCol: String, binCol: String): Dataset[DecodedImage] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull)
      .withColumn(binCol, coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        withImage(bytes)(DecodedImage(id, "unknown", -1, -1, -1L))(
          fmt => DecodedImage(id, fmt, -1, -1, -1L)) { (fmt, img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var i = 0
          while (i < w * h) {
            sum += img.getRaster.getSample(i % w, i / w, 0)
            i += 1
          }
          DecodedImage(id, fmt, w, h, sum * 1000L / (w.toLong * h))
        }
      })
  }

  /** Resize output row: input + output geometry, the ROUNDTRIPPED
    * output raster's exact mean luma (computed from the re-decoded
    * resized PNG, so the stats prove the re-encode is a real lossless
    * image, not just the subsample arithmetic), and the re-encoded
    * bytes. Quarantine: (-1 geometry, luma -1, empty media). */
  final case class ResizedImage(
      id: Long, format: String, w_in: Int, h_in: Int, w_out: Int,
      h_out: Int, mean_luma_out_x1000: Long, media_out: Array[Byte])

  /** REAL image RESIZE — the multimodal transform tier between decode
    * and feature-extract: decode the container (any JDK-readable
    * format), nearest-neighbor downsample band 0 by an integer
    * `factor` (out(x,y) = in(x·f, y·f) — deterministic, no
    * interpolation arithmetic to diverge on), re-encode as a REAL PNG
    * with the JDK writer, then decode the re-encoded bytes AGAIN and
    * report the roundtripped raster's stats — a silently lossy
    * re-encode cannot hash-match. Undecodable input or geometry not
    * divisible by the factor → quarantine row.
    *
    * Scale shape: partition-wise map (one codec pass per row, blobs
    * never leave their partition, memory-cached ImageIO); the output
    * binary is factor²× smaller — the standard thumbnail/training-
    * resolution pass before feature extraction. */
  def resizeImage(spark: SparkSession, media: DataFrame, idCol: String,
                  binCol: String, factor: Int): Dataset[ResizedImage] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull)
      .withColumn(binCol, coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        def bad(fmt: String) =
          ResizedImage(id, fmt, -1, -1, -1, -1, -1L, Array.empty[Byte])
        withImage(bytes)(bad("unknown"))(bad) { (fmt, img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          if (w % factor != 0 || h % factor != 0) bad(fmt)
          else {
            val (ow, oh) = (w / factor, h / factor)
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var i = 0
            while (i < ow * oh) {
              out.getRaster.setSample(i % ow, i / ow, 0,
                img.getRaster.getSample((i % ow) * factor,
                  (i / ow) * factor, 0))
              i += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            val png = bos.toByteArray
            // roundtrip: stats come from the re-DECODED output
            val back = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            var sum = 0L
            var j = 0
            while (j < ow * oh) {
              sum += back.getRaster.getSample(j % ow, j / ow, 0)
              j += 1
            }
            ResizedImage(id, fmt, w, h, ow, oh,
              sum * 1000L / (ow.toLong * oh), png)
          }
        }
      })
  }

  /** Real decoded-image perceptual-hash row: the 64-bit average hash
    * (aHash) split into four 16-bit bands (band b = hash bits
    * 16b..16b+15). Undecodable/foreign-geometry bytes → all bands -1
    * (quarantine; a real band is 0..65535, so -1 never collides). */
  final case class DecodedImageAHash(
      id: Long, format: String, b0: Long, b1: Long, b2: Long, b3: Long)

  /** REAL image decode → average perceptual hash (aHash, the
    * LAION-class image-dedup fingerprint): the 16×8 gray raster is
    * block-averaged to 8×8 (horizontal pixel pairs), bit j = block j's
    * mean > whole-raster mean. Integer-exact: bit j is
    * 64·(p[2j]+p[2j+1]) > Σp — no division — so a SQL oracle
    * re-derives identical bits straight from the source text. The hash
    * ships as four 16-bit band longs: the near-dup join downstream
    * needs band equality (LSH) plus XOR popcount, never 64-bit sums,
    * which also keeps the oracle inside signed-BIGINT arithmetic.
    * Rasters that are not exactly 128 pixels (foreign/corrupt input)
    * quarantine rather than hash under a silently different geometry.
    * Partition-wise; blobs never leave their partition. */
  def decodeImageAHash(spark: SparkSession, media: DataFrame,
                       idCol: String, binCol: String): Dataset[DecodedImageAHash] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull)
      .withColumn(binCol, coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        withImage(bytes)(DecodedImageAHash(id, "unknown", -1L, -1L, -1L, -1L))(
          fmt => DecodedImageAHash(id, fmt, -1L, -1L, -1L, -1L)) { (fmt, img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          if (w.toLong * h != 128L) DecodedImageAHash(id, fmt, -1L, -1L, -1L, -1L)
          else {
            val p = new Array[Int](128)
            var sum = 0L
            var i = 0
            while (i < 128) {
              p(i) = img.getRaster.getSample(i % w, i / w, 0)
              sum += p(i)
              i += 1
            }
            val bands = new Array[Long](4)
            var j = 0
            while (j < 64) {
              if (64L * (p(2 * j) + p(2 * j + 1)) > sum)
                bands(j / 16) |= 1L << (j % 16)
              j += 1
            }
            DecodedImageAHash(id, fmt, bands(0), bands(1), bands(2), bands(3))
          }
        }
      })
  }

  /** Near-duplicate image pairs by banded aHash (perceptual image
    * dedup): candidates = pairs agreeing exactly on ≥ 1 of the 4
    * bands — banded LSH, so by pigeonhole every pair at hamming ≤ 3
    * is guaranteed a candidate and recall decays gracefully above
    * (band count is the recall knob, the same discipline as the
    * SimHash text family) — then verified by EXACT 64-bit hamming
    * Σ_b popcount(band_l XOR band_r) ≤ maxHamming. Quarantine rows
    * (negative bands) drop out before banding.
    *
    * Scale: the join key is (band_id, band_value) — collisions within
    * one 16-bit band value are the candidate set; no corpus-wide
    * window, no cartesian, and the pair distinct() is keyed by the
    * (doc_a, doc_b) output, already bounded by candidate count. */
  def aHashNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val bandCols = Seq("b0", "b1", "b2", "b3")
    // `hashes` sits on a REAL media decode: referencing its lineage on
    // BOTH sides of the self-join would decode the corpus twice.
    // Persist the tiny hash rows (id + 4 longs ≈ 40 B/doc) instead —
    // the Dedup.scala minhash discipline — then eagerly checkpoint the
    // candidate-bounded pair output and release the cache so a
    // long-lived session doesn't accumulate it.
    val h = hashes.filter(col("b0") >= 0L)
      .select(col("id") +: bandCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = h.select(col("id") +: bandCols.map(col) :+
      posexplode(array(bandCols.map(col): _*)).as(Seq("band_id", "band_val")): _*)
    val l = e.select(e.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
    val r = e.select(e.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
    val hamming = bandHamming("l_", "r_")
    val out = l.join(r, col("l_band_id") === col("r_band_id") &&
        col("l_band_val") === col("r_band_val") &&
        col("l_id") < col("r_id"))
      .select(col("l_id").as("doc_a"), col("r_id").as("doc_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .localCheckpoint(eager = true)
    h.unpersist(blocking = false)
    out
  }

  /** Exact 64-bit hamming distance between two prefixed aHash rows
    * (`<lp>b0..b3` vs `<rp>b0..b3`): Σ per-band XOR popcount. */
  def bandHamming(lp: String, rp: String): org.apache.spark.sql.Column =
    Seq("b0", "b1", "b2", "b3").map(c =>
      bit_count(col(lp + c).bitwiseXOR(col(rp + c))).cast("long"))
      .reduce(_ + _)

  /** Encode each doc's leading bytes as 16-bit mono PCM WAV (the JDK's
    * real RIFF writer): sample i = (byte_i − 96)·128, `n` frames.
    * Output: (id, media binary). */
  def encodePcmWav(spark: SparkSession, docs: DataFrame, idCol: String,
                   textCol: String, n: Int, sampleRate: Int): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val pcm = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val s = (textByte(bytes, i) - 96) * 128
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = (s >> 8).toByte
          i += 1
        }
        (id, wavPcm16Mono(pcm, sampleRate))
      }).toDF("id", "media")
  }

  /** The canonical 44-byte RIFF/WAVE header + PCM payload — the exact
    * layout the JDK's WAV writer emits for PCM16LE mono (MultimodalSpec
    * pins AudioSystem reading these bytes back), written directly:
    * AudioSystem.write's per-call provider lookup contends across 32
    * encode threads the same way the decode side did (sf1: 19 s → 9 s
    * from the decode fast path alone; the encode was the remainder). */
  private def wavPcm16Mono(pcm: Array[Byte], sampleRate: Int): Array[Byte] =
    wavPcm16(pcm, sampleRate, channels = 1)

  private def wavPcm16(pcm: Array[Byte], sampleRate: Int,
                       channels: Int): Array[Byte] = {
    val out = new Array[Byte](44 + pcm.length)
    def put32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.zipWithIndex.foreach { case (c, i) => out(o + i) = c.toByte }
    tag(0, "RIFF"); put32(4, 36L + pcm.length); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16L); put16(20, 1); put16(22, channels)
    put32(24, sampleRate.toLong); put32(28, sampleRate.toLong * 2 * channels)
    put16(32, 2 * channels); put16(34, 16)
    tag(36, "data"); put32(40, pcm.length.toLong)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }

  /** Stereo sibling of [[encodePcmWav]]: channel 0 sample i =
    * (byte_i − 96)·128 (the mono rule), channel 1 sample i =
    * (byte_i − 96)·64 — distinct per-channel amplitudes, so a channel
    * swap or a stride bug in the de-interleave breaks the oracle.
    * Frames are interleaved [L0 R0 L1 R1 …], `n` frames per channel. */
  def encodePcmWavStereo(spark: SparkSession, docs: DataFrame,
                         idCol: String, textCol: String, n: Int,
                         sampleRate: Int): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val pcm = new Array[Byte](4 * n)
        var i = 0
        while (i < n) {
          val l = (textByte(bytes, i) - 96) * 128
          val r = (textByte(bytes, i) - 96) * 64
          pcm(4 * i) = (l & 0xff).toByte
          pcm(4 * i + 1) = (l >> 8).toByte
          pcm(4 * i + 2) = (r & 0xff).toByte
          pcm(4 * i + 3) = (r >> 8).toByte
          i += 1
        }
        (id, wavPcm16(pcm, sampleRate, channels = 2))
      }).toDF("id", "media")
  }

  /** REAL audio decode: parse the container header (rate, channels,
    * frame count) and fold the PCM frames to an exact integer mean
    * absolute amplitude. Unparseable bytes → (-1, -1, -1, -1).
    * 16-bit little-endian PCM only (what the JDK's WAV writer emits);
    * a resampling decode belongs behind the same partition-wise shape. */
  def decodeAudio(spark: SparkSession, media: DataFrame,
                  idCol: String, binCol: String): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull)
      .withColumn(binCol, coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        // RIFF/WAVE PCM16LE fast path first: AudioSystem's SPI lookup
        // re-scans providers per call behind registry locks — 32
        // decode threads contend and the sf1 sweep measured 16× cost
        // at 10× rows. A WAV header is 3 chunk scans; the platform
        // codec stays as the fallback for anything else.
        parseWavPcm16(id, bytes).getOrElse {
          try {
            val ain = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ain.getFormat
            require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
            val pcm = ain.readAllBytes()
            DecodedAudio(id, fmt.getSampleRate.toInt, fmt.getChannels,
              ain.getFrameLength, meanAbsAmplitude(pcm, pcm.length))
          } catch {
            case _: Exception => DecodedAudio(id, -1, -1, -1L, -1L)
          }
        }
      })
  }

  private def meanAbsAmplitude(pcm: Array[Byte], len: Int): Long = {
    val nSamples = len / 2
    var sum = 0L
    var i = 0
    while (i < nSamples) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort
      sum += math.abs(s.toLong)
      i += 1
    }
    if (nSamples == 0) 0L else sum * 1000L / nSamples
  }

  /** Manual RIFF/WAVE parse for the 16-bit little-endian PCM layout:
    * walk the chunk list, read `fmt ` (format tag 1, 16-bit), measure
    * `data`. Returns None for anything that is not exactly this shape
    * so the caller's general decoder handles it. Values match the
    * AudioSystem path bit-for-bit: frame_length = dataLen/blockAlign,
    * amplitude over ALL interleaved samples. */
  private def parseWavPcm16(id: Long, bytes: Array[Byte]): Option[DecodedAudio] =
    wavPcm16Payload(bytes).map { case (rate, channels, blockAlign, pcm) =>
      DecodedAudio(id, rate, channels, pcm.length.toLong / blockAlign,
        meanAbsAmplitude(pcm, pcm.length))
    }

  /** The RIFF/WAVE PCM16LE header walk shared by [[parseWavPcm16]] and
    * [[audioFrameFeatures]] → (rate, channels, blockAlign, pcm bytes). */
  private def wavPcm16Payload(
      bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int) = (bytes(o) & 0xff).toLong | ((bytes(o + 1) & 0xff).toLong << 8) |
      ((bytes(o + 2) & 0xff).toLong << 16) | ((bytes(o + 3) & 0xff).toLong << 24)
    def tag(o: Int, s: String) = bytes.length >= o + 4 &&
      s.zipWithIndex.forall { case (c, i) => bytes(o + i) == c.toByte }
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var rate = -1; var channels = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1L
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val size = le32(off + 4) // untrusted 32-bit field — advance in Long
      if (tag(off, "fmt ")) {
        if (size < 16 || off + 8 + 16 > bytes.length) return None
        if (le16(off + 8) != 1 || le16(off + 8 + 14) != 16) return None // PCM16 only
        channels = le16(off + 8 + 2)
        rate = le32(off + 8 + 4).toInt
        blockAlign = le16(off + 8 + 12)
      } else if (tag(off, "data")) {
        dataOff = off + 8
        dataLen = math.min(size, (bytes.length - dataOff).toLong)
      }
      // chunks are word-aligned; a crafted size near 2^32 would make an
      // Int step wrap to ≤ 0 and spin this loop forever — step in Long
      // and bail to the general decoder unless strictly advancing
      // (skip the bail once both chunks are in hand: the clamped data
      // read is already valid and the loop is about to exit anyway)
      if (rate < 0 || dataOff < 0) {
        val next = off.toLong + 8L + size + (size & 1L)
        if (next <= off || next > Int.MaxValue.toLong) return None
        off = next.toInt
      }
    }
    if (rate < 0 || dataOff < 0 || channels <= 0 || blockAlign <= 0) return None
    val pcm = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + dataLen.toInt)
    Some((rate, channels, blockAlign, pcm))
  }

  /** Per-frame audio feature row; quarantine = frame_idx −1 (and
    * channel −1, since no channel applies). Mono audio is channel 0. */
  final case class AudioFrameFeatures(
      id: Long, channel: Long, frame_idx: Long, n_samples: Long,
      energy_sum_sq: Long, peak_abs: Long, zero_crossings: Long)

  /** Audio FEATURE EXTRACTION — the per-frame preprocessing pass
    * between decode and modeling (VAD gating, loudness normalization,
    * silence trimming all key on exactly these): window the PCM into
    * fixed `frameLen`-sample frames and emit integer-exact features —
    * energy (Σ s², the RMS numerator), peak |s|, and frame-local zero
    * crossings (sign flips between adjacent samples; the crossing
    * count restarts per frame so frames are independent — no
    * cross-frame state, embarrassingly parallel at any scale). Only
    * complete frames are emitted (a tail shorter than `frameLen` is
    * dropped — the standard framing contract). All features are exact
    * long arithmetic, so a SQL oracle re-derives them bit-for-bit.
    *
    * Multi-channel PCM is DE-INTERLEAVED: channel c of C reads samples
    * at interleaved positions i·C + c, and every channel frames
    * independently (channel 0 of a mono file ≡ the old mono output,
    * bit for bit). Framing raw interleaved samples instead would count
    * L-vs-R sign flips as "crossings" and halve the real frame
    * duration — wrong features, silently.
    *
    * Totality: undecodable bytes OR a blockAlign that contradicts
    * 16-bit × channels → one quarantine row (channel −1, frame_idx −1,
    * n_samples −1); decodable audio SHORTER than one frame per channel
    * → one too-short row (channel −1, frame_idx −1, n_samples 0) —
    * never a silently dropped input. Partition-wise map; blobs stay in
    * partition. */
  def audioFrameFeatures(spark: SparkSession, media: DataFrame,
                         idCol: String, binCol: String,
                         frameLen: Int): Dataset[AudioFrameFeatures] = {
    require(frameLen >= 2, s"frameLen must be >= 2, got $frameLen")
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull)
      .withColumn(binCol, coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavPcm16Payload(bytes) match {
          case None =>
            Iterator.single(
              AudioFrameFeatures(id, -1L, -1L, -1L, -1L, -1L, -1L))
          // truly malformed: the container's own blockAlign disagrees
          // with 16-bit × channels, so the interleaving stride is
          // unknowable — quarantine, don't guess
          case Some((_, ch, ba, _)) if ba != 2 * ch =>
            Iterator.single(
              AudioFrameFeatures(id, -1L, -1L, -1L, -1L, -1L, -1L))
          case Some((_, ch, _, pcm)) if (pcm.length / 2) / ch < frameLen =>
            Iterator.single(
              AudioFrameFeatures(id, -1L, -1L, 0L, -1L, -1L, -1L))
          case Some((_, ch, _, pcm)) =>
            val perCh = (pcm.length / 2) / ch
            def sample(c: Int, i: Int): Int = {
              val o = 2 * (i * ch + c)
              val v = (pcm(o) & 0xff) | ((pcm(o + 1) & 0xff) << 8)
              if (v >= 0x8000) v - 0x10000 else v
            }
            (0 until ch).iterator.flatMap { c =>
              (0 until perCh / frameLen).iterator.map { f =>
                var energy = 0L; var peak = 0L; var zc = 0L
                var i = 0
                while (i < frameLen) {
                  val s = sample(c, f * frameLen + i)
                  energy += s.toLong * s
                  if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
                  if (i > 0) {
                    val prev = sample(c, f * frameLen + i - 1)
                    if ((prev < 0) != (s < 0)) zc += 1
                  }
                  i += 1
                }
                AudioFrameFeatures(id, c.toLong, f.toLong, frameLen.toLong,
                  energy, peak, zc)
              }
            }
        }
      })
  }

  // ---- real frame container ("video") -------------------------------

  /** Real decoded-video-frame row. */
  final case class VideoFrame(
      id: Long, frame_idx: Long, width: Int, height: Int,
      mean_luma_x1000: Long)

  /** Container magic for [[encodeFrameVideo]]: "GVID" + 4-byte BE frame
    * count, then per frame a 4-byte BE length prefix + a REAL PNG. */
  private val VideoMagic = Array[Byte]('G', 'V', 'I', 'D')

  /** Encode each doc as a length-prefixed concatenated-PNG "video":
    * frame f holds text bytes [f·w·h, (f+1)·w·h) as a w×h 8-bit GRAY
    * PNG via the JDK's real PNG writer (space-padded past the end);
    * every doc gets max(1, ceil(len/(w·h))) frames. The layout is the
    * fixed-index seekable shape real containers give a demuxer: frame
    * N is reachable by walking N length prefixes, decoding nothing.
    * Map-only, one encoder per row; blobs never leave their partition. */
  def encodeFrameVideo(spark: SparkSession, docs: DataFrame, idCol: String,
                       textCol: String, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val fpx = w * h
        val nFrames = math.max(1L, (bytes.length + fpx - 1L) / fpx).toInt
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(VideoMagic)
        def be32(v: Int): Array[Byte] = Array(
          (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
        bos.write(be32(nFrames))
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var i = 0
          while (i < fpx) {
            img.getRaster.setSample(i % w, i / w, 0,
              textByte(bytes, f * fpx + i))
            i += 1
          }
          val frame = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", frame)
          val fb = frame.toByteArray
          bos.write(be32(fb.length))
          bos.write(fb)
          f += 1
        }
        (id, bos.toByteArray)
      }).toDF("id", "media")
  }

  /** Demux + decode + stride-sample a [[encodeFrameVideo]] container:
    * every `everyN`-th frame is PNG-decoded (the REAL reader) to
    * (id, frame_idx, width, height, mean_luma_x1000); skipped frames
    * cost one length-prefix read and an arraycopy-free seek — the
    * whole point of the container. A corrupt container — bad magic,
    * length prefix running past the buffer, a frame the PNG reader
    * rejects, or fewer frames than the header promises — emits ONE
    * quarantine row (id, -1, -1, -1, -1) and never fails the task.
    * Partition-wise, no shuffle. */
  def sampleVideoFrames(spark: SparkSession, media: DataFrame,
                        idCol: String, binCol: String,
                        everyN: Int): Dataset[VideoFrame] = {
    require(everyN > 0, s"need everyN > 0, got $everyN")
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull)
      .withColumn(binCol, coalesce(col(binCol), lit(Array.empty[Byte])))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val quarantine = Seq(VideoFrame(id, -1L, -1, -1, -1L))
        def be32(o: Int): Long =
          ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
            ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
        if (bytes.length < 8 ||
            !VideoMagic.indices.forall(i => bytes(i) == VideoMagic(i)))
          quarantine
        else {
          val nFrames = be32(4)
          val out = Seq.newBuilder[VideoFrame]
          var off = 8L
          var f = 0L
          var bad = false
          while (f < nFrames && !bad) {
            if (off + 4 > bytes.length) bad = true
            else {
              val len = be32(off.toInt)
              val start = off + 4
              if (len <= 0 || start + len > bytes.length) bad = true
              else {
                if (f % everyN == 0) {
                  try {
                    val img = javax.imageio.ImageIO.read(
                      new java.io.ByteArrayInputStream(
                        bytes, start.toInt, len.toInt))
                    if (img == null) bad = true
                    else {
                      val (w, h) = (img.getWidth, img.getHeight)
                      var sum = 0L
                      var i = 0
                      while (i < w * h) {
                        sum += img.getRaster.getSample(i % w, i / w, 0)
                        i += 1
                      }
                      out += VideoFrame(id, f, w, h,
                        sum * 1000L / (w.toLong * h))
                    }
                  } catch { case _: Exception => bad = true }
                }
                off = start + len
                f += 1
              }
            }
          }
          if (bad || f < nFrames) quarantine else out.result()
        }
      })
  }

  /** Frame sampling: treat the binary as a container of fixed-size
    * frames and emit every `everyN`-th frame with its hash and size —
    * the batch shape of video frame-sampling, where a real demuxer
    * (ffmpeg) replaces the fixed-stride slicer. Map-only: explode over
    * a computed frame-index sequence, byte-slice per frame, no shuffle;
    * blobs never leave their partition. */
  def frameSample(media: DataFrame, idCol: String, binCol: String,
                  frameBytes: Int, everyN: Int): DataFrame = {
    // fail at the call site, not as a per-row ANSI DIVIDE_BY_ZERO deep
    // inside the job
    require(frameBytes > 0 && everyN > 0,
      s"need frameBytes > 0 and everyN > 0, got $frameBytes / $everyN")
    val nFrames =
      ceil(length(col(binCol)).cast("double") / frameBytes).cast("long")
    media
      .select(col(idCol), col(binCol), nFrames.as("n_frames"))
      .select(col(idCol), col(binCol),
        // stepped sequence emits ONLY the kept indices — an unstepped
        // explode + `% everyN` filter would materialize everyN× the
        // rows, each dragging the full blob column along
        explode(when(col("n_frames") > 0,
            sequence(lit(0L), col("n_frames") - 1, lit(everyN.toLong)))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        sha2(col(binCol).substr(
          (col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)), 256).as("frame_sha256"),
        length(col(binCol).substr(
          (col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes))).cast("long").as("n_frame_bytes"))
  }
}
