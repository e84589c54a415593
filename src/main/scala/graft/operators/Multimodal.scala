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
  * shape, typed output — is real and tested. The decoder itself is a
  * STUB (this container carries no image/audio codecs): a deterministic
  * function of the bytes standing in where libjpeg/ffmpeg would be. The
  * stub's field derivations are chosen so a SQL oracle can verify the
  * plumbing end-to-end.
  *
  * Scale notes: one decode task per input partition, no shuffle; media
  * blobs stream through the iterator (never collected); with a real
  * codec only the body of [[decodeStub]] changes — schema and plan shape
  * stay identical. Size partitions by bytes
  * (`spark.sql.files.maxPartitionBytes`) so a task's blobs fit memory.
  */
object Multimodal {

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
