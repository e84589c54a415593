package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chat-transcript rendering with context-window truncation — the
  * serialization step between episode assembly (q161) and SFT
  * training: events sessionize on a gap, each session keeps the
  * TRAILING whole turns whose token counts fit the context budget
  * (the keep-the-most-recent-context rule), and the kept turns
  * render as a role-alternating transcript that always opens with
  * `user:`.
  *
  * Token counts are DECLARED per turn (`turn_tokens`): in a real
  * pipeline they come from the tokenizer (q170's byte-BPE), not from
  * the renderer — taking them as input keeps the operator tokenizer-
  * agnostic and the truncation arithmetic exact (long sums, no
  * estimation). A session whose newest turn alone exceeds the budget
  * renders empty (n_turns_kept 0) rather than emitting a split turn
  * — truncation is whole-turn by contract.
  *
  * Scale shape (100 TB of events): the gap sessionization and the
  * suffix token sum are per-user / per-session windows (gap-bounded,
  * never corpus-wide); the final assembly's groupBy reuses the
  * window's user_id hash partitioning, so the whole chain is ONE
  * shuffle end to end (the q161 discipline). collect_list skips the
  * dropped turns' nulls, so the transcript array is exactly the kept
  * suffix in (ts, event_id) order.
  */
object ChatRender {

  /** @param events (user_id, event_id, ts_us, event_type,
    *               turn_tokens) — one row per turn
    * @param gapUs  session gap in microseconds
    * @param budgetTokens context budget; a turn is kept iff the
    *               suffix token sum ending at the session's newest
    *               turn stays ≤ budget (boundary inclusive)
    * @return (user_id, session_id, n_turns_total, n_turns_kept,
    *         tokens_kept, rendered) */
  def render(events: DataFrame, gapUs: Long,
             budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wk = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(cum))
      .withColumn("keep",
        sum(col("turn_tokens")).over(wk) <= budgetTokens)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_turns_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_turns_kept"),
        sum(when(col("keep"), col("turn_tokens")).otherwise(0L))
          .as("tokens_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("ts_us"), col("event_id"), col("event_type"))))),
          (x, i) => concat(
            when(i % 2 === 0, "user: ").otherwise("assistant: "),
            x.getField("event_type"))), "\n").as("rendered"))
  }
}
