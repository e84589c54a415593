package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING crawl-frontier scheduling — the online q180: candidate
  * URLs arrive continuously (sitemap pings, link discoveries, recrawl
  * triage), and each politeness CYCLE emits at most `k` fetches per
  * host, highest priority first, exactly once when the cycle's
  * event-time window closes under the watermark.
  *
  * The budget is the SAME bounded [[graft.operators.TopK]] aggregate
  * the batch q180 uses — a typed Aggregator whose partial buffers
  * carry ≤ k rows per (window, host), so streaming state per key is
  * k entries, not the candidate backlog. Append mode + watermark give
  * the exactly-once cycle close; late candidates inside the watermark
  * still compete for the budget, late beyond it are dropped (the
  * standard streaming-aggregation contract, pinned by the spec).
  *
  * Input columns: `ts` (event-time timestamp), `host`, `ord` (priority,
  * higher first — the q180 packing: new=+100, then recency), `tie`
  * (deterministic long id, lower first). Output: one row per scheduled
  * fetch: (cycle_start, cycle_end, host, ord, tie, fetch_order).
  */
object FrontierStream {

  def scheduleCycles(cands: DataFrame, cycle: String, watermark: String,
                     k: Int): DataFrame =
    budgeted(cands.withWatermark("ts", watermark), cycle, k)

  /** The batch equivalent over the same candidate relation — what a
    * backfill over historical cycles runs, and the value pin for the
    * stream (FrontierStreamSpec asserts stream ≡ batch row-for-row). */
  def scheduleCyclesBatch(cands: DataFrame, cycle: String,
                          k: Int): DataFrame =
    budgeted(cands, cycle, k)

  // ONE aggregation chain for both entry points: the spec's
  // stream ≡ batch pin is only meaningful if both run the same plan —
  // a second copy would let them drift apart silently.
  private def budgeted(cands: DataFrame, cycle: String,
                       k: Int): DataFrame =
    cands
      .groupBy(window(col("ts"), cycle).as("cycle"), col("host"))
      .agg(graft.operators.TopK.topK(k)(col("ord"), col("tie")).as("top"))
      .select(col("cycle.start").as("cycle_start"),
        col("cycle.end").as("cycle_end"), col("host"),
        posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("cycle_start"), col("cycle_end"), col("host"),
        col("e.ord").as("ord"), col("e.tie").as("tie"),
        (col("pos") + 1).cast("long").as("fetch_order"))
}
