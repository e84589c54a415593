package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming forms of the engine's event operators.
  *
  * The reference pipeline is batch-with-iteration (SURVEY §2.7 — no
  * streaming operators), so these are engine extensions: the same
  * transforms as [[graft.queries.EventOps]] expressed over an unbounded
  * source, with watermarks bounding state. Because the batch stages are
  * pure DataFrame → DataFrame functions, they run under `foreachBatch`
  * unchanged — the design SURVEY §1.3 called out.
  *
  * Scale: state per window×type key only (watermark expires old state);
  * shuffle partitioning is the regular groupBy hash shuffle. A real
  * deployment reads Kafka; files here, the source is swappable.
  */
object EventStream {

  /** Schema of the streamed events source (ts arrives as epoch micros —
    * produced by [[graft.Tables]]' nanos conversion upstream). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** 5-minute tumbling windowed counts/sums with a 10-minute watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** Read a directory of parquet event files as a stream. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked stream-stream interval join — the impression↔click
    * attribution shape: each left event pairs with right events of the
    * same user whose timestamp falls in [left.ts, left.ts + maxDelay].
    *
    * Both sides carry a watermark and the join condition bounds the
    * event-time distance in BOTH directions, so Spark derives state
    * watermarks for each side and evicts buffered rows once they can no
    * longer match — state is O(arrival rate × (watermark + maxDelay))
    * per side, independent of stream length. Without the time bound the
    * join would buffer both streams forever; that shape is rejected by
    * design here.
    *
    * Inputs use [[eventSchema]]; output: (user_id, l_event_id,
    * r_event_id, l_ts, r_ts, r_value). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   watermark: String, maxDelay: String): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("l_event_id"), col("ts").as("l_ts"),
              col("user_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("r_event_id"), col("ts").as("r_ts"),
              col("user_id").as("r_user"), col("value").as("r_value"))
    l.join(r, expr(
        s"""user_id = r_user AND
            r_ts >= l_ts AND
            r_ts <= l_ts + interval $maxDelay"""))
      .select(col("user_id"), col("l_event_id"), col("r_event_id"),
              col("l_ts"), col("r_ts"), col("r_value"))
  }

  /** ts travels as epoch microseconds — java.sql.Timestamp.getTime is
    * millisecond-truncated and would diverge from the batch µs math. */
  final case class SessionEvent(event_id: Long, ts_us: Long, user_id: Long)
  final case class SessionState(sessionId: Long, lastTsUs: Long, nEvents: Long,
                                startUs: Long)
  final case class SessionUpdate(user_id: Long, session_id: Long,
                                 n_events: Long, start_us: Long, end_us: Long)

  /** The per-batch session fold shared by [[sessionize]] and
    * [[sessionizeEventTime]] — one copy so gap/roll semantics (and any
    * fix to them) cannot drift between the two variants. Folds the
    * batch's event-time-sorted timestamps into the state, emitting each
    * CLOSED session. */
  private def foldSessions(userId: Long, tsSorted: Seq[Long],
                           st0: SessionState, gapUs: Long)
      : (SessionState, Seq[SessionUpdate]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
    var st = st0
    tsSorted.foreach { tsUs =>
      st = if (st.lastTsUs == Long.MinValue || tsUs - st.lastTsUs > gapUs) {
        if (st.nEvents > 0)
          out += SessionUpdate(userId, st.sessionId, st.nEvents, st.startUs, st.lastTsUs)
        SessionState(st.sessionId + 1, tsUs, 1L, tsUs)
      } else SessionState(st.sessionId, tsUs, st.nEvents + 1, st.startUs)
    }
    (st, out.toSeq)
  }

  /** Event-time variant of [[sessionize]]: sessions also CLOSE when the
    * watermark passes their last event + gap, via EventTimeTimeout — the
    * production shape where an idle user's final session must flush
    * without waiting for their next event. Input rows need `ts`
    * (timestamp, watermarked by the caller) alongside `ts_us`.
    *
    * A timed-out user keeps a CLOSED-sentinel state (4 longs) rather
    * than being removed: removing would reset the session counter, and
    * the user's next session would re-emit session_id = 1 — colliding
    * with ids already emitted for that user. State is therefore bounded
    * by key cardinality, the same budget as [[rateLimit]].
    */
  def sessionizeEventTime(events: org.apache.spark.sql.Dataset[TimedSessionEvent],
                          gapUs: Long): org.apache.spark.sql.Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[TimedSessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            // keep the counter; no further timeout — nothing is open
            state.update(SessionState(st.sessionId, Long.MinValue, 0L, 0L))
            Iterator.single(
              SessionUpdate(userId, st.sessionId, st.nEvents, st.startUs, st.lastTsUs))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val st0 = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
            val (st, closed) = foldSessions(userId, sorted.map(_.ts_us), st0, gapUs)
            state.update(st)
            // close the open session once the watermark passes last + gap
            state.setTimeoutTimestamp((st.lastTsUs + gapUs) / 1000L + 1L)
            closed.iterator
          }
      }
  }

  final case class TimedSessionEvent(event_id: Long, ts: java.sql.Timestamp,
                                     ts_us: Long, user_id: Long)

  final case class FunnelEvent(event_id: Long, ts_us: Long, user_id: Long,
                               event_type: String)
  final case class FunnelState(t1Us: Long, t2Us: Long, t3Us: Long)
  final case class FunnelUpdate(user_id: Long, t1_us: Option[Long],
                                t2_us: Option[Long], t3_us: Option[Long],
                                steps: Long)

  /** Stateful streaming form of `q82_funnel` (view → click → purchase,
    * each step strictly after the previous): per-user state is three
    * longs; each micro-batch folds its events in (ts, id) order and
    * emits the user's funnel snapshot when a step advances. Under
    * in-order delivery the greedy first-qualifying event equals the
    * batch min-after semantics, so the last snapshot per user matches
    * `q82` exactly (pinned by FunnelStreamSpec). Cross-batch order is
    * the source's responsibility, as with [[sessionize]]; state never
    * grows past 3 longs per user, independent of stream length. */
  def funnel(events: org.apache.spark.sql.Dataset[FunnelEvent]):
      org.apache.spark.sql.Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val unset = Long.MinValue
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(unset, unset, unset))
          val before = st
          it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" if st.t1Us == unset =>
                st = st.copy(t1Us = e.ts_us)
              case "click" if st.t1Us != unset && st.t2Us == unset &&
                  e.ts_us > st.t1Us =>
                st = st.copy(t2Us = e.ts_us)
              case "purchase" if st.t2Us != unset && st.t3Us == unset &&
                  e.ts_us > st.t2Us =>
                st = st.copy(t3Us = e.ts_us)
              case _ =>
            }
          }
          if (st == before) Iterator.empty
          else {
            state.update(st)
            val steps = Seq(st.t1Us, st.t2Us, st.t3Us).count(_ != unset).toLong
            Iterator.single(FunnelUpdate(userId,
              Option(st.t1Us).filter(_ != unset),
              Option(st.t2Us).filter(_ != unset),
              Option(st.t3Us).filter(_ != unset), steps))
          }
      }
  }

  /** Stateful gap-based sessionization via `flatMapGroupsWithState` —
    * the custom-state streaming form of `q30_sessionize`. Each user's
    * state carries (current session id, last event time); a gap >
    * `gapUs` rolls the session. Emits each CLOSED session exactly once
    * (Append mode); the final still-open session stays in state and is
    * never emitted by this variant — close-on-idle is what
    * [[sessionizeEventTime]] adds via EventTimeTimeout.
    *
    * State is O(1) per user (four longs); at 100 TB the state store
    * shards by the group key like any keyed state.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
                 gapUs: Long): org.apache.spark.sql.Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // within a micro-batch events may arrive unordered; sort the
          // batch (cross-batch order is the file-source's responsibility)
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val st0 = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
          val (st, closed) = foldSessions(userId, sorted.map(_.ts_us), st0, gapUs)
          state.update(st)
          closed.iterator
      }
  }

  final case class EpisodeEvent(event_id: Long, ts: java.sql.Timestamp,
                                ts_us: Long, user_id: Long, event_type: String)
  final case class EpisodeTurn(ts_us: Long, event_id: Long, event_type: String)
  final case class EpisodeState(sessionId: Long, lastTsUs: Long, startUs: Long,
                                turns: Seq[EpisodeTurn])
  final case class EpisodeUpdate(user_id: Long, session_id: Long,
                                 n_turns: Long, duration_us: Long,
                                 trajectory: String)

  private def emitEpisode(userId: Long, st: EpisodeState): EpisodeUpdate = {
    // turns re-sort at emit: late (in-watermark) events land mid-session
    val ordered = st.turns.sortBy(t => (t.ts_us, t.event_id))
    // duration from the ORDERED turns (max − min), not the fold's
    // last-processed timestamp — equal to the batch aggregate even
    // when a late in-watermark event extended the session backward
    EpisodeUpdate(userId, st.sessionId, ordered.size.toLong,
      ordered.last.ts_us - ordered.head.ts_us,
      ordered.map(_.event_type).mkString("->"))
  }

  /** Streaming episode/trajectory assembly — the online form of
    * `q161_episode_assembly`: each user's state accumulates the open
    * session's turns; a gap > `gapUs` (or the watermark passing
    * last + gap, via EventTimeTimeout) CLOSES the session and emits it
    * as one ordered-trajectory row, exactly once. Session-boundary
    * semantics (`> gapUs`, roll, 1-based ids, closed-sentinel keeps the
    * counter) mirror [[foldSessions]]/[[sessionizeEventTime]];
    * StreamingEpisodeSpec pins stream ≡ the batch q161 row-for-row, so
    * any drift between the folds turns a spec red.
    *
    * State is O(open-session turns) per user — the same bound the batch
    * side's per-session collect_list carries, gap-bounded by
    * construction, never the stream's history.
    */
  def assembleEpisodes(events: org.apache.spark.sql.Dataset[EpisodeEvent],
                       gapUs: Long): org.apache.spark.sql.Dataset[EpisodeUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[EpisodeEvent], state: GroupState[EpisodeState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.update(EpisodeState(st.sessionId, Long.MinValue, 0L, Nil))
            if (st.turns.nonEmpty) Iterator.single(emitEpisode(userId, st))
            else Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var st = state.getOption
              .getOrElse(EpisodeState(0L, Long.MinValue, 0L, Nil))
            val out = scala.collection.mutable.ArrayBuffer.empty[EpisodeUpdate]
            sorted.foreach { e =>
              val turn = EpisodeTurn(e.ts_us, e.event_id, e.event_type)
              st = if (st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs) {
                if (st.turns.nonEmpty) out += emitEpisode(userId, st)
                EpisodeState(st.sessionId + 1, e.ts_us, e.ts_us, Vector(turn))
              } else st.copy(lastTsUs = e.ts_us, turns = st.turns :+ turn)
            }
            state.update(st)
            state.setTimeoutTimestamp((st.lastTsUs + gapUs) / 1000L + 1L)
            out.iterator
          }
      }
  }

  final case class CapEvent(event_id: Long, ts_us: Long, user_id: Long)
  final case class CapKept(user_id: Long, event_id: Long, ts_us: Long, seq: Long)

  /** Streaming per-key rate cap — the online form of the per-domain
    * document cap (q91): each key passes through only its first
    * `maxPerKey` events, so downstream state and sinks see a bounded
    * per-key volume no matter how hot a key gets. State is ONE long per
    * key (the kept count) — bounded by key cardinality, not traffic,
    * with no watermark needed. Within a micro-batch events process in
    * event-time order (per-group sort, the sessionize discipline);
    * across batches the cap is arrival-order — an online rate
    * limiter's semantics. A single-batch replay therefore equals the
    * batch `row_number ≤ k` form, which StreamingRateLimitSpec pins.
    */
  def rateLimit(events: org.apache.spark.sql.Dataset[CapEvent],
                maxPerKey: Long): org.apache.spark.sql.Dataset[CapKept] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[CapEvent], state: GroupState[Long]) =>
          val seen = state.getOption.getOrElse(0L)
          // clamp BEFORE toInt: maxPerKey > Int.MaxValue would wrap
          // negative and take(negative) drops every event of the key
          val room = math.min(math.max(maxPerKey - seen, 0L),
            Int.MaxValue.toLong).toInt
          if (room == 0) Iterator.empty // saturated key: skip the sort
          else {
            val kept = it.toSeq.sortBy(e => (e.ts_us, e.event_id)).take(room)
              .zipWithIndex.map { case (e, i) =>
                CapKept(userId, e.event_id, e.ts_us, seen + i + 1) }
            state.update(seen + kept.size)
            kept.iterator
          }
      }
  }
}
