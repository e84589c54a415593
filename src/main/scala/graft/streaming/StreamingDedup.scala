package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for continuous document ingest — the
  * streaming form of [[graft.operators.Dedup.exact]].
  *
  * Batch exact-dedup groups the whole corpus by content hash; a stream
  * cannot hold every hash ever seen, so state must be bounded. The
  * watermark variant keeps the first-arriving copy per content hash and
  * expires a hash's state once the watermark passes its event time plus
  * the delay — the trade every streaming dedup makes explicit: a
  * duplicate arriving later than the watermark window is emitted again
  * (and left for the periodic batch dedup to sweep).
  *
  * Scale: state is one (hash, timestamp) entry per distinct document in
  * the watermark window, sharded by the state-store's hash partitioning
  * on the dedup key; the document body never enters the state store —
  * only the 32-char hash travels.
  */
object StreamingDedup {

  /** Keep the first-arriving copy of each content hash; bounded state.
    *
    * @param docs    streaming DataFrame with `textCol` and event-time
    *                `tsCol`
    * @param delay   watermark delay, e.g. "10 minutes": duplicates
    *                within this window of each other are suppressed
    */
  def exactByContent(docs: DataFrame, textCol: String, tsCol: String,
                     delay: String): DataFrame =
    docs.withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Unbounded-state variant (exact global dedup, the semantics of the
    * batch operator): correct for bounded backfills, grows state forever
    * on a true stream — callers choose the trade explicitly. */
  def exactByContentUnbounded(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("text_hash", md5(col(textCol)))
      .dropDuplicates("text_hash")

  /** Near-dup streaming suppression keyed on the 16-bit SimHash: docs
    * whose token multisets agree (whitespace/formatting variants — the
    * near-dups exact hashing misses) collapse to one fingerprint and
    * dedupe like [[exactByContent]]. The fingerprint is computed
    * map-only per row ([[graft.functions.TextFunctions
    * .simhash16FromHashes]]) — an explode+groupBy SimHash would add a
    * second stateful stage before the dedup state, which streaming
    * forbids in append mode. Same bounded-state watermark semantics;
    * 16 bits is the oracle-checkable demo width, production widens the
    * identical construction to 64. */
  def nearBySimhash(docs: DataFrame, textCol: String, tsCol: String,
                    delay: String): DataFrame =
    docs
      .withColumn("_hs", graft.functions.TextFunctions.tokenHashes(col(textCol)))
      .withColumn("simhash",
        graft.functions.TextFunctions.simhash16FromHashes(col("_hs")))
      .drop("_hs")
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("simhash")
}
