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

  /** [[scheduleCycles]] with robots `Crawl-delay` consumed — the same
    * per-host rule the batch q192 applies: a host whose governing
    * group states a delay gets budget
    * min(k, max(1, floor(cycleSecs / delay))); hosts absent from
    * `delays` keep the full k. `delays` (host, crawl_delay — the
    * [[graft.operators.Robots.selectCrawlDelay]] shape) is the STATIC
    * side of one stream-static equi-join BEFORE the aggregation, so
    * the budget rides the group key (it is constant per host) and the
    * streaming state stays ≤ k entries per (cycle, host) — the delay
    * tightens what's EMITTED, never what's kept.
    *
    * Domain-grain politeness (the batch q201 rule) is the same call
    * with `host` pre-mapped to the registrable domain
    * ([[graft.operators.HostRules.registrableDomain]] — a stateless
    * projection/static join, stream-safe) and `delays` keyed by
    * domain (max over member hosts, the conservative read). */
  def scheduleCyclesDelayed(cands: DataFrame, cycle: String,
                            watermark: String, k: Int, delays: DataFrame,
                            cycleSecs: Double): DataFrame =
    budgetedDelayed(cands.withWatermark("ts", watermark), cycle, k,
      delays, cycleSecs)

  /** Batch pin for [[scheduleCyclesDelayed]] (stream ≡ batch, same
    * chain). */
  def scheduleCyclesDelayedBatch(cands: DataFrame, cycle: String, k: Int,
                                 delays: DataFrame,
                                 cycleSecs: Double): DataFrame =
    budgetedDelayed(cands, cycle, k, delays, cycleSecs)

  private def budgetedDelayed(cands: DataFrame, cycle: String, k: Int,
                              delays: DataFrame,
                              cycleSecs: Double): DataFrame = {
    val d = delays.select(col("host").as("_dh"), col("crawl_delay"))
    val withBudget = cands
      .join(d, col("host") === col("_dh"), "left")
      // when(), not coalesce(least(greatest(...))): Spark's
      // least/greatest SKIP nulls (they return the extreme of the
      // non-null operands), so a missing delay would collapse to
      // greatest(1, null) = 1 instead of falling through to k
      .withColumn("budget",
        when(col("crawl_delay").isNotNull,
          least(lit(k.toLong), greatest(lit(1L),
            floor(lit(cycleSecs) / col("crawl_delay")))))
          .otherwise(lit(k.toLong)))
      .drop("_dh", "crawl_delay")
    budgeted(withBudget, cycle, k, extraKeys = Seq("budget"))
      .filter(col("fetch_order") <= col("budget"))
  }

  // ONE aggregation chain for all entry points: the spec's
  // stream ≡ batch pin is only meaningful if both run the same plan —
  // a second copy would let them drift apart silently. `extraKeys`
  // must be functionally dependent on host (the delay budget is) so
  // they refine nothing — they just ride through the aggregation.
  private def budgeted(cands: DataFrame, cycle: String, k: Int,
                       extraKeys: Seq[String] = Nil): DataFrame =
    cands
      .groupBy(window(col("ts"), cycle).as("cycle") +: col("host") +:
        extraKeys.map(col): _*)
      .agg(graft.operators.TopK.topK(k)(col("ord"), col("tie")).as("top"))
      .select(col("cycle.start").as("cycle_start") +:
        col("cycle.end").as("cycle_end") +: col("host") +:
        extraKeys.map(col) :+
        posexplode(col("top")).as(Seq("pos", "e")): _*)
      .select(col("cycle_start") +: col("cycle_end") +: col("host") +:
        extraKeys.map(col) :+
        col("e.ord").as("ord") :+ col("e.tie").as("tie") :+
        (col("pos") + 1).cast("long").as("fetch_order"): _*)
}
