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
    * the document's absolute tape span.
    *
    * CONTRACT: `orderCol` must be UNIQUE within each stream (callers
    * pass a document id). The ROWS-framed running sum gives tied rows
    * distinct, non-overlapping tape spans, but WHICH tied row gets
    * which span follows Spark's partition-internal order — ties would
    * make per-row spans (and downstream shard hashes) run-dependent. */
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

  /** Fixed-length TOKEN-ID sequences from per-document id streams —
    * the trainer-consumable tape, and the last hop of the tokenizer
    * chain: [[graft.operators.Bpe.encodeIds]] emits (doc, tok_idx,
    * token_id) per document; this lays those documents head-to-tail
    * on a per-stream tape (the [[chunk]] discipline applied to actual
    * ids, not counts) and cuts it into `seqLen`-token sequences, with
    * the FINAL partial sequence of each stream padded to length with
    * an explicit `padId`. A training job memory-maps exactly this:
    * every sequence is `seqLen` cells, documents cross sequence
    * boundaries, and each cell still knows which document it came
    * from (pad cells carry a NULL doc).
    *
    * `ids`: (docCol, posCol, idColName) with `posCol` 1-based and
    * contiguous per document (the [[graft.operators.Bpe.encodeIds]]
    * contract). `streams`: one row per document mapping `docCol` →
    * `streamCol`; a document with no id rows (empty text) occupies no
    * tape, exactly like [[chunk]]'s zero-token rule. `docCol` must be
    * unique per stream — it is the tape order ([[chunk]]'s
    * determinism contract). `eosId` (optional): append one document-
    * separator cell after each non-empty document's last token — the
    * GPT-pretraining delimiter a trainer needs to mask cross-document
    * attention; the EOS cell is attributed to ITS document (pads stay
    * NULL-doc).
    *
    * Output: (streamCol, seq_idx, seq_pos, token_id, doc_id) — one
    * row per tape cell, `seq_pos` ∈ [0, seqLen), `doc_id` NULL on pad
    * cells. Exploded-to-scalar rather than array-typed so the rows
    * are oracle-comparable and writers can re-window them into
    * whatever batch shape the trainer wants.
    *
    * Scale shape (100 TB): one per-doc count aggregate, ONE running-
    * sum window per stream partition (linear scan, no global sort),
    * one shuffle join of the id stream against the doc-sized offset
    * relation on the doc key, and a stream-count-sized pad explode.
    * The id stream never moves through a window — only the doc-level
    * offsets do. */
  def packIdTape(ids: DataFrame, docCol: String, posCol: String,
                 idColName: String, streams: DataFrame, streamCol: String,
                 seqLen: Long, padId: Long,
                 eosId: Option[Long] = None): DataFrame = {
    // with an EOS separator (the GPT-pretraining document delimiter),
    // every non-empty doc contributes one extra trailing cell — the
    // EOS is attributed to ITS document, unlike pads (NULL doc)
    val raw = ids.select(col(docCol).as("_doc"),
      col(posCol).cast("long").as("_pos"),
      col(idColName).cast("long").as("_tid"))
    val cells = eosId.fold(raw)(e =>
      raw.unionByName(raw.groupBy(col("_doc"))
        .agg((max(col("_pos")) + 1L).as("_pos"))
        .select(col("_doc"), col("_pos"), lit(e).as("_tid"))))
    val nTok = cells.groupBy(col("_doc")).agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(col(streamCol)).orderBy(col("_doc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val based = streams.select(col(docCol).as("_doc"), col(streamCol))
      .join(nTok, Seq("_doc")) // inner: zero-token docs occupy no tape
      .withColumn("_end", sum(col("_n")).over(w))
      .withColumn("_base", col("_end") - col("_n"))
    val body = cells.join(based.select(col("_doc"), col(streamCol),
        col("_base")), Seq("_doc"))
      .withColumn("_tape", col("_base") + col("_pos") - 1L)
      .select(col(streamCol), expr(s"_tape div ${seqLen}L").as("seq_idx"),
        expr(s"_tape % ${seqLen}L").as("seq_pos"),
        col("_tid").as("token_id"),
        col("_doc").cast("long").as("doc_id"))
    val pads = based.groupBy(col(streamCol))
      .agg(max(col("_end")).as("_total"))
      .withColumn("_to",
        expr(s"((_total + ${seqLen - 1}L) div ${seqLen}L) * ${seqLen}L"))
      .filter(col("_to") > col("_total"))
      .select(col(streamCol),
        explode(sequence(col("_total"), col("_to") - 1L)).as("_tape"))
      .select(col(streamCol), expr(s"_tape div ${seqLen}L").as("seq_idx"),
        expr(s"_tape % ${seqLen}L").as("seq_pos"),
        lit(padId).as("token_id"), lit(null).cast("long").as("doc_id"))
    body.unionByName(pads)
  }

  /** Shard manifest over the ID TAPE itself (the [[packIdTape]]
    * output), not over token counts: per (stream, shard) the sequence
    * range, cell/pad/doc counts AND a content checksum — the sum of
    * 40-bit md5 integers over `seq_idx|seq_pos|token_id` — so the
    * manifest pins the actual ids on the tape. A re-export of a shard
    * must land byte-identical; with [[shardManifest]] a swapped pair
    * of equal-length documents would slip through a count-only
    * manifest, here it breaks the checksum. Commutative sum → exact
    * and order-free on any engine. 40 bits (not the q128 family's 48)
    * because the sum must stay in a signed 64-bit on EVERY engine:
    * Spark's non-ANSI sum wraps silently past 2^63 while DuckDB
    * promotes to HUGEINT, so overflow would diverge the engines, and
    * 48-bit values cap a shard at ~32k cells. 40-bit caps it at
    * 2^23 ≈ 8.4M cells per shard (seqsPerShard·seqLen must stay
    * under that — e.g. 8192 seqs × 1024 tokens), checked at runtime. */
  def idShardManifest(tape: DataFrame, streamCol: String,
                      seqsPerShard: Long): DataFrame = {
    require(seqsPerShard > 0 && seqsPerShard <= (1L << 23),
      s"seqsPerShard=$seqsPerShard: seqsPerShard*seqLen (cells per " +
        "shard) must stay under 2^23 so the 40-bit checksum sum " +
        "stays in a signed 64-bit; seqsPerShard alone already exceeds it")
    tape
      .withColumn("shard_idx", expr(s"seq_idx div ${seqsPerShard}L"))
      // native md5-prefix (value-identical to
      // conv(substring(md5(..), 1, 10), 16, 10) — no 32-char hex
      // string + decimal re-parse per tape cell; r15, guide §1.2)
      .withColumn("_h", {
        import org.apache.spark.sql.GraftExpressionBridge
        GraftExpressionBridge.column(graft.functions.Md5PrefixLong(
          GraftExpressionBridge.expression(
            concat_ws("|", col("seq_idx"), col("seq_pos"),
              col("token_id"))), 10))
      })
      .groupBy(col(streamCol), col("shard_idx"))
      .agg(count_distinct(col("seq_idx")).as("n_seqs"),
        count(lit(1)).as("n_cells"),
        sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("n_pad"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("seq_idx")).as("first_seq"),
        max(col("seq_idx")).as("last_seq"),
        sum(col("_h")).as("id_checksum"))
  }

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
