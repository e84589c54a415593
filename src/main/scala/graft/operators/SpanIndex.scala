package graft.operators

import graft.gdl.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent SPAN-grain dedup state — the incremental form of the
  * q191 C4 rule (Raffel et al. 2020 discarded any THREE-SENTENCE span
  * occurring more than once; q188/[[SentenceIndex]] is the stricter
  * sentence-grain cousin).
  *
  * The span machinery is a thin layer over [[SentenceIndex]]: spans
  * are hashed sliding `spanLen`-sentence windows, and since a span
  * never crosses a document boundary, a batch of WHOLE documents
  * derives all of its spans locally — no cross-batch stitching. The
  * stored state is therefore the same (key, first_pk) min-combine
  * relation, and the whole crash/replay/out-of-order argument is
  * inherited verbatim: min is commutative, associative, idempotent,
  * so incremental refresh ≡ from-scratch rebuild, with no sequencing.
  *
  * Input contract (all methods): whole-document sentence rows
  * (doc_id, sent_idx, sent_text, pk) with `pk` the packed global
  * first-occurrence order (the q188/q191 doc·1e6 + idx envelope).
  *
  * Scale shape: the window is per-doc (bounded), the span groupBy and
  * the strike join hash-partition on the span key — identical to
  * [[SentenceIndex]], O(batch + one equi-join) per increment.
  */
final class SpanIndex(store: TableStore, name: String, spanLen: Int = 3) {
  require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")

  private val inner = new SentenceIndex(store, s"${name}_span$spanLen")

  /** Sentence rows → span rows (doc_id, sent_idx, sent_text = the
    * newline-joined span, pk): per-doc sliding windows, tail rows
    * (fewer than spanLen sentences ahead) dropped BEFORE the concat —
    * Spark's concat_ws skips nulls, so filtering on the last lead is
    * what keeps partial tail spans out (the q191 lesson). */
  def spans(sents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("sent_idx"))
    val base = sents.select(col("doc_id"), col("sent_idx"),
      col("sent_text"), col("pk"))
    val withLeads = (1 until spanLen).foldLeft(base) { (df, k) =>
      df.withColumn(s"_s$k", lead(col("sent_text"), k).over(w))
    }
    withLeads.filter(col(s"_s${spanLen - 1}").isNotNull)
      .select(col("doc_id"), col("sent_idx"),
        concat_ws("\n", col("sent_text") +:
          (1 until spanLen).map(k => col(s"_s$k")): _*).as("sent_text"),
        col("pk"))
  }

  /** Seed from a corpus sentence relation. Overwrite = rebuild. */
  def build(sents: DataFrame): Unit = inner.build(spans(sents))

  /** Fold one batch of whole documents in — O(batch). */
  def refresh(sents: DataFrame): Unit = inner.refresh(spans(sents))

  /** The logical state: one (sent_key, first_pk) row per span key. */
  def storedMins(): DataFrame = inner.storedMins()

  /** Physically collapse the append tail (value-identity). */
  def compactKeys(): Unit = inner.compactKeys()

  /** Per-SPAN verdicts for a batch: `kept` iff the span occurrence is
    * the first across stored ∪ batch. */
  def strikeSpans(sents: DataFrame): DataFrame = inner.strike(spans(sents))

  /** Per-SENTENCE verdicts for a batch of whole documents: `removed`
    * iff the sentence is covered by ANY non-first duplicate span
    * occurrence (occurrences overlap, so strikes go through one
    * DISTINCT position set — the q191 rule, incrementally). Output:
    * the input rows + `removed`. */
  def strikeSentences(sents: DataFrame): DataFrame = {
    val struck = strikeSpans(sents)
      .filter(!col("kept"))
      .select(col("doc_id"),
        explode(sequence(col("sent_idx"),
          col("sent_idx") + (spanLen - 1))).as("sent_idx"))
      .distinct()
      .withColumn("_rm", lit(true))
    sents.join(struck, Seq("doc_id", "sent_idx"), "left")
      .withColumn("removed", coalesce(col("_rm"), lit(false)))
      .drop("_rm")
  }

  /** One streaming micro-batch: sentence verdicts + commit — the
    * [[SentenceIndex.ingestBatch]] contract at span grain (verdicts
    * are replay-stable by the same min-combine algebra).
    *
    * The whole-documents-per-batch input contract is LOAD-BEARING
    * here: a source that can tear one document's sentences across
    * micro-batches (e.g. a file stream over multi-part writes) leaves
    * the torn halves' spans unformed on both sides of the split —
    * batch boundaries must be document-atomic (one file per logical
    * batch, or a doc-complete upstream grouping). */
  def ingestBatch(sents: DataFrame): DataFrame = {
    val v = strikeSentences(sents)
    refresh(sents)
    v
  }
}
