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

  final case class ProbeRow(probe: Long, doc_id: Long, simhash: Long,
                            ts: java.sql.Timestamp)
  final case class BucketEntry(docId: Long, tsMs: Long)
  final case class BucketState(entries: List[BucketEntry])
  final case class NearDupMatch(id_a: Long, id_b: Long, hamming: Long,
                                ts: java.sql.Timestamp)

  /** Streaming near-dup MATCH detection within Hamming distance ≤ 1 —
    * the streaming form of [[graft.operators.Dedup.simhashNearDup]]'s
    * multiprobe: each arriving doc probes its own 16-bit fingerprint
    * plus every 1-bit flip (17 probe rows, a map-only explode), and the
    * stateful stage is keyed by PROBE BUCKET. A bucket's state holds
    * only docs whose OWN fingerprint equals the bucket key — the
    * identity row registers, flip rows only look. A d ≤ 1 pair CO-
    * OCCURS in two buckets (each doc's identity bucket holds the
    * other's probe), but only the LATER arrival's probe row finds the
    * earlier one registered, so each pair emits exactly once — the
    * register-only-identity asymmetry is what carries the guarantee,
    * with no dedup stage after the stateful operator (append mode
    * allows one). A replayed doc_id is neither re-registered nor
    * re-matched in its identity bucket; a replayed FLIP row can still
    * re-emit a d=1 pair (pair-level state would be needed to suppress
    * that), so an at-least-once source should be fronted by
    * [[exactByContent]] or treated as emitting at-least-once matches.
    *
    * Emits (id_a = earlier-ARRIVING doc, id_b = later, hamming, ts of
    * the later arrival). Within a micro-batch, processing order is
    * (ts, doc_id) — deterministic; across batches it is arrival order,
    * which tracks event time only as far as the source does.
    *
    * State is bounded the same way as [[exactByContent]]: entries whose
    * event time has fallen behind the watermark by more than `delayMs`
    * are pruned on every bucket visit, and idle buckets are removed
    * wholesale by event-time timeout. Per-entry cost is two longs — the
    * document body never enters the state store, and the 17× probe
    * fan-out carries (probe, id, fingerprint, ts) rows, not text.
    *
    * @param docs streaming (idCol: long, textCol: string, tsCol:
    *             timestamp) rows
    * @param delayMs watermark delay: near-dups farther apart than this
    *                in event time are NOT matched (the periodic batch
    *                sweep owns those)
    */
  def nearBySimhashH1(docs: DataFrame, idCol: String, textCol: String,
                      tsCol: String, delayMs: Long): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val bits = 16
    val fp = docs
      .withColumn("_hs", graft.functions.TextFunctions.tokenHashes(col(textCol)))
      .withColumn("simhash",
        graft.functions.TextFunctions.simhash16FromHashes(col("_hs")))
      .withWatermark(tsCol, s"$delayMs milliseconds")
      .select(
        explode(array(
          (0 until bits).map(j => col("simhash").bitwiseXOR(lit(1L << j))) :+
            col("simhash"): _*)).as("probe"),
        col(idCol).cast("long").as("doc_id"), col("simhash"),
        col(tsCol).as("ts"))
      .as[ProbeRow]
    fp.groupByKey(_.probe)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (probe: Long, it: Iterator[ProbeRow], state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
            .filter(_.tsMs + delayMs >= wm)
          if (state.hasTimedOut) {
            // the timeout is always re-set past every entry's expiry on
            // data visits, so by the time it fires the prune above has
            // emptied the bucket — nothing can survive here
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupMatch]
            it.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
              // a replayed identity row (at-least-once source) is
              // already registered: matching it again would emit every
              // pair once per replay, registering it again would emit
              // them once per duplicate entry forever after
              val replay = r.simhash == probe &&
                entries.exists(_.docId == r.doc_id)
              if (!replay) {
                entries.foreach { e =>
                  if (e.docId != r.doc_id)
                    out += NearDupMatch(e.docId, r.doc_id,
                      java.lang.Long.bitCount(r.simhash ^ probe).toLong, r.ts)
                }
                if (r.simhash == probe)
                  entries = BucketEntry(r.doc_id, r.ts.getTime) :: entries
              }
            }
            if (entries.isEmpty) state.remove()
            else {
              state.update(BucketState(entries))
              state.setTimeoutTimestamp(
                entries.map(_.tsMs).max + delayMs + 1L)
            }
            out.iterator
          }
      }
      .toDF()
  }
}
