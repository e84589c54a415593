package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concatenate-and-chunk sequence packing — the training-export step
  * between a curated corpus and the trainer: documents are laid
  * head-to-tail on a per-stream token tape and the tape is cut into
  * fixed-length sequences, so every training sequence is exactly
  * `seqLen` tokens with documents crossing sequence boundaries (the
  * published GPT/LLaMA pretraining data prep, as opposed to
  * pad-per-document batching which wastes the tail of every row).
  *
  * Reference scope note: the reference has no training-export tier at
  * all (its pipeline ends at catalog import —
  * `backend/import_dataset_versions/task.py`); this is
  * beyond-reference capability like the dedup/ANN/curation families.
  *
  * Determinism: the tape order inside a stream is `orderCol`
  * ascending — a total order supplied by the caller — so offsets,
  * boundaries, and every downstream shard hash are value-exact
  * cross-engine. Zero-token documents occupy no tape and emit no
  * segment (they'd otherwise mint empty segments at whatever
  * boundary they fell on).
  *
  * Scale shape (100 TB): ONE running-sum window per stream partition
  * (a linear scan — no global sort), then a per-row bounded explode
  * (a document overlaps at most n_tok/seqLen + 1 sequences). The
  * stream key is the parallelism unit: at production scale callers
  * pass a sharded stream (source × shard-id from the layout, each a
  * few GB), never one global stream — the same discipline as any
  * range-partitioned layout write. Segment rows stay in their
  * stream's partition; no shuffle after the window.
  */
object SequencePack {

  /** One row per (document × overlapped sequence): `seq_idx` is the
    * stream-local sequence ordinal, `seg_begin`/`seg_end` the token
    * span INSIDE that sequence ([begin, end)), `tok_begin`/`tok_end`
    * the document's absolute tape span. */
  def chunk(docs: DataFrame, streamCol: String, orderCol: String,
            nTokCol: String, seqLen: Long): DataFrame = {
    // ROWS framing, not the default RANGE: duplicate orderCol values
    // inside a stream must not share (double-count) a tape span, and
    // the oracle's cumsum is ROWS UNBOUNDED PRECEDING
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("tok_end", sum(col(nTokCol)).over(w))
      .withColumn("tok_begin", col("tok_end") - col(nTokCol))
      .filter(col(nTokCol) > 0L)
      .withColumn("seq_idx",
        explode(sequence(expr(s"tok_begin div $seqLen"),
          expr(s"(tok_end - 1) div $seqLen"))))
      .select(col(streamCol), col(orderCol), col("seq_idx"),
        greatest(col("tok_begin") - col("seq_idx") * seqLen, lit(0L))
          .as("seg_begin"),
        least(col("tok_end") - col("seq_idx") * seqLen, lit(seqLen))
          .as("seg_end"),
        col("tok_begin"), col("tok_end"))
  }

  /** Incremental packing: lay a NEW batch of documents on the tape
    * starting from each stream's stored end offset — the maintained
    * form of [[chunk]] for a growing corpus (the SentenceIndex /
    * SpanIndex discipline applied to the export tier). Because the
    * tape is append-only and a document's spans depend only on the
    * offsets BEFORE it, incremental ≡ from-scratch by construction:
    * appending batches in `orderCol` order emits exactly the segment
    * rows a full repack would, so shard manifests stay stable and a
    * re-export of an old shard is byte-identical. `offsets` is the
    * per-stream ledger (streamCol, tape_end) — stream-count sized, a
    * broadcast join; absent streams start a fresh tape at 0. Cost is
    * O(batch): one window over the batch, one broadcast join, no
    * touch of already-packed data. */
  def appendChunk(batch: DataFrame, offsets: DataFrame, streamCol: String,
                  orderCol: String, nTokCol: String,
                  seqLen: Long): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    batch
      .join(broadcast(offsets.select(col(streamCol),
        col("tape_end").as("_base"))), Seq(streamCol), "left")
      .withColumn("_base", coalesce(col("_base"), lit(0L)))
      .withColumn("tok_end", col("_base") + sum(col(nTokCol)).over(w))
      .withColumn("tok_begin", col("tok_end") - col(nTokCol))
      .filter(col(nTokCol) > 0L)
      .withColumn("seq_idx",
        explode(sequence(expr(s"tok_begin div $seqLen"),
          expr(s"(tok_end - 1) div $seqLen"))))
      .select(col(streamCol), col(orderCol), col("seq_idx"),
        greatest(col("tok_begin") - col("seq_idx") * seqLen, lit(0L))
          .as("seg_begin"),
        least(col("tok_end") - col("seq_idx") * seqLen, lit(seqLen))
          .as("seg_end"),
        col("tok_begin"), col("tok_end"))
  }

  /** The per-stream ledger [[appendChunk]] consumes, derived from
    * already-emitted segments: (streamCol, tape_end). */
  def tapeOffsets(segments: DataFrame, streamCol: String): DataFrame =
    segments.groupBy(col(streamCol))
      .agg(max(col("tok_end")).as("tape_end"))

  /** Per-stream packing report: documents/segments/sequences, total
    * tokens, fill ratio in exact ppm (only the LAST sequence of a
    * stream can be short), and boundary crossings (each extra
    * segment beyond one per document is exactly one crossing). */
  def stats(segments: DataFrame, streamCol: String, orderCol: String,
            seqLen: Long): DataFrame =
    segments.groupBy(col(streamCol))
      .agg(count_distinct(col(orderCol)).as("n_docs"),
        count(lit(1)).as("n_segments"),
        (max(col("seq_idx")) + 1L).as("n_seqs"),
        max(col("tok_end")).as("total_tokens"))
      .select(col(streamCol), col("n_docs"), col("n_segments"),
        col("n_seqs"), col("total_tokens"),
        // decimal(38,0) multiply: long arithmetic silently overflows
        // past ~9.2e12 tokens per stream — plausible at 100 TB if a
        // caller skips the shard-the-stream discipline
        expr("cast(total_tokens as decimal(38,0)) * 1000000" +
          s" div (n_seqs * $seqLen)").as("fill_ppm"),
        (col("n_segments") - col("n_docs")).as("n_crossings"))

  /** Shard manifest: sequences grouped into fixed-count shards per
    * stream — the export writer's unit of work and the resume/verify
    * ledger a 100 TB export run keeps (a shard re-export must land
    * byte-identical, which is why the manifest rows are value-exact). */
  def shardManifest(segments: DataFrame, streamCol: String,
                    orderCol: String, seqsPerShard: Long): DataFrame =
    segments
      .withColumn("shard_idx", expr(s"seq_idx div $seqsPerShard"))
      .groupBy(col(streamCol), col("shard_idx"))
      .agg(count_distinct(col("seq_idx")).as("n_seqs"),
        count(lit(1)).as("n_segments"),
        count_distinct(col(orderCol)).as("n_docs"),
        sum(col("seg_end") - col("seg_begin")).as("n_tokens"),
        min(col("seq_idx")).as("first_seq"),
        max(col("seq_idx")).as("last_seq"))
}
