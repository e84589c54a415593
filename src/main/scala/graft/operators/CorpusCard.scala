package graft.operators

import graft.gdl.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MAINTAINED corpus data card — q190's cross-module summary as lake
  * state updated per batch instead of four family chains recomputed
  * per run (VERDICT r9 "Missing" #5).
  *
  * Family-by-family maintenance strategy, chosen per family's algebra:
  *
  *  - **Volume** (n_docs, chars, tokens) and **quality** (n_scored,
  *    Σ quality·1e9): additive per-source sums — each batch appends
  *    its per-source delta row to `<name>_base`; the read is one
  *    groupBy-sum over batch-count-sized rows (the IncrementalAggSpec
  *    pattern). `score` is a FROZEN scorer: rescoring the corpus with
  *    a retrained model is a rebuild event, not a refresh.
  *  - **Sentence dedup** (n_sents, n_struck): a [[SentenceIndex]]
  *    carries the min-combine first-occurrence state; each batch's
  *    verdicts (strike against stored ∪ batch) aggregate additively.
  *    Exactness contract: batch pks are ≥ every stored pk (append-only
  *    corpora with monotone doc ids — the q189 discipline); a
  *    smaller-pk late arrival would retroactively flip stored
  *    verdicts, which additive counters cannot see.
  *  - **Near-dup docs** (dup_docs): a [[NearDupIndex]] maintains the
  *    cluster closure via [[NearDupIndex.refreshClustersExact]] (exact
  *    Jaccard on banded candidates — pair-set equal to a from-scratch
  *    LSH, so the maintained labels match the from-scratch closure
  *    value-exactly). The per-source dup count is NOT additive (a new
  *    doc can dethrone an old keeper), so [[card]] re-derives it from
  *    the maintained label table + the `<name>_docmeta` relation —
  *    O(labeled docs) with cluster-bounded windows, never a corpus
  *    text re-scan.
  *
  * Delivery contract: [[refreshBatch]]/[[ingestStream]] are the ONLY
  * fold-in paths, and both are at-LEAST-once safe — batch-id-keyed
  * MERGEs make the additive tables a fixpoint under replay, matching
  * the algebra the two index families already have. The caller
  * supplies the batch key (a streaming batchId, a change-feed
  * checkpoint seq — anything stable under replay of the same delta).
  * An earlier plain-append `refresh` was removed: a violated
  * at-most-once assumption double-counted volume/quality silently,
  * and a caller who HAS at-most-once delivery loses nothing by
  * keying the batch.
  *
  * Input contract (build/refresh): docs (doc_id, source, n_chars,
  * text). `sentences(docs)` → (doc_id, sent_idx, sent_text);
  * `score(docs)` → (doc_id, quality double).
  */
final class CorpusCard(store: TableStore, name: String,
                       sentences: DataFrame => DataFrame,
                       score: DataFrame => DataFrame) {

  private def baseT = s"${name}_base"
  private def metaT = s"${name}_docmeta"

  private val sentIdx = new SentenceIndex(store, name)
  private val dupIdx = new NearDupIndex(store, s"${name}_dup")

  private def packed(sents: DataFrame): DataFrame =
    sents.withColumn("pk",
      col("doc_id") * 1000000L + col("sent_idx") +
        coalesce(expr("assert_true(sent_idx < 1000000)").cast("long"),
          lit(0L)))

  /** One batch's additive per-source delta: volume + quality sums and
    * the sentence family's verdict counts (vs stored ∪ batch). */
  private def baseDelta(docs: DataFrame,
                        firstBatch: Boolean): DataFrame = {
    import graft.functions.TextFunctions._
    val vol = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        sum(size(tokens(col("text"))).cast("long")).as("tokens_total"))
    val sp = packed(sentences(docs))
    val verdicts =
      if (firstBatch) {
        // no stored state yet: first occurrence within the batch
        val k = sp.groupBy(col("sent_text")).agg(min(col("pk")).as("_kp"))
        sp.join(k, Seq("sent_text"))
          .withColumn("kept", col("pk") === col("_kp"))
      } else sentIdx.strike(sp)
    val sd = verdicts.select(col("doc_id"), col("kept"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sents"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_struck"))
    val qual = docs.select(col("doc_id"), col("source"))
      .join(score(docs), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_scored"),
        sum(floor(col("quality") * 1e9 + 0.5).cast("long")).as("sum_q9"))
    vol.join(sd, Seq("source"), "left").join(qual, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_chars_total"),
        col("tokens_total"),
        coalesce(col("n_sents"), lit(0L)).as("n_sents"),
        coalesce(col("n_struck"), lit(0L)).as("n_struck"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("sum_q9"), lit(0L)).as("sum_q9"))
  }

  private def docMeta(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"))

  /** Seed all state from the initial corpus. */
  def build(docs: DataFrame): Unit = {
    val d = docs.localCheckpoint(eager = true)
    store.overwrite(baseT, baseDelta(d, firstBatch = true)
      .withColumn("batch_id", lit(-1L)))
    store.overwrite(metaT, docMeta(d))
    sentIdx.build(packed(sentences(d)))
    dupIdx.build(d, "doc_id", "text")
    dupIdx.buildClusters(d, "doc_id", "text")
  }

  /** Fold one batch in under an AT-LEAST-ONCE delivery contract
    * (streaming foreachBatch, retried pollers): `batchId` keys the
    * additive tables' rows, and the writes are row-level MERGEs
    * instead of appends — a replayed batch recomputes the IDENTICAL
    * delta (the two indices answer with the same verdicts by their
    * min-combine / drop-if-present algebra) and merges it onto
    * itself, so every state table is a fixpoint under replay at ANY
    * crash point: exactly-once from algebra, not from a ledger.
    * Order is load-bearing like [[NearDupIndex.ingest]]: verdicts and
    * cluster deltas are computed against the PRE-batch state, then
    * the indices absorb the batch.
    *
    * @param corpusText the CURRENT full corpus relation (the source
    *   table the change feed reads from; including the batch is fine —
    *   exact verification only ever fetches pre-batch candidate ids
    *   from it, candidate-bounded, never a full scan) */
  def refreshBatch(docs: DataFrame, corpusText: DataFrame,
                   batchId: Long): Unit = {
    val d = docs.localCheckpoint(eager = true)
    store.merge(baseT,
      baseDelta(d, firstBatch = false)
        .withColumn("batch_id", lit(batchId)),
      keyCols = Seq("source", "batch_id"))
    store.merge(metaT, docMeta(d), keyCols = Seq("doc_id"))
    sentIdx.refresh(packed(sentences(d)))
    dupIdx.refreshClustersExact(d, "doc_id", "text", corpusText)
    dupIdx.refresh(d, "doc_id", "text")
  }

  /** Streaming ingest: each micro-batch lands in the SOURCE table and
    * folds into the card, exactly-once under foreachBatch replay (see
    * [[refreshBatch]]). `sourceTable` is appended here so the exact
    * cross-verification reads a corpus that already contains every
    * PRIOR batch — the single-writer discipline a streaming ingest
    * pipeline has anyway. */
  def ingestStream(stream: DataFrame, sourceStore: TableStore,
                   sourceTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val d = batch.select(col("doc_id"), col("source"),
            col("n_chars"), col("text")).localCheckpoint(eager = true)
          // replay-safe source append: merge on the doc key
          sourceStore.merge(sourceTable, d, keyCols = Seq("doc_id"))
          refreshBatch(d, sourceStore.read(sourceTable).get, batchId)
        }
      }

  /** The current card — q190's exact output shape, one row per
    * source, from maintained state only: a groupBy-sum over the
    * additive deltas plus the cluster-bounded dup ranking. */
  def card(): DataFrame = {
    val base = store.read(baseT).getOrElse(throw new IllegalStateException(
        s"corpus card '$name' has no build"))
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_chars_total")).as("n_chars_total"),
        sum(col("tokens_total")).as("tokens_total"),
        sum(col("n_sents")).as("n_sents"),
        sum(col("n_struck")).as("n_struck"),
        sum(col("n_scored")).as("n_scored"),
        sum(col("sum_q9")).as("sum_q9"))
    val labeled = store.read(metaT).get
      .join(dupIdx.clusters(), Seq("doc_id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val dup = labeled.withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(sum(when(col("rn") > 1, 1L).otherwise(0L)).as("dup_docs"))
    base.join(dup, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_chars_total"),
        col("tokens_total"), col("n_sents"), col("n_struck"),
        when(col("n_sents") > 0L,
          expr("n_struck * 1000000L div n_sents")).otherwise(0L)
          .as("sent_dup_ppm"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        expr("coalesce(dup_docs, 0L) * 1000000L div n_docs")
          .as("dup_doc_ppm"),
        col("n_scored"),
        when(col("n_scored") > 0L, expr("sum_q9 div n_scored"))
          .as("mean_quality_e9"))
  }
}
