package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch event queries (q_tumbling_window /
  * q_sessionize): the same semantics expressed over an unbounded
  * source with watermarks and state, exercised batch-equivalently in
  * EventStreamsSpec via MemoryStream + Trigger.AvailableNow.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late events beyond 10 min are dropped, closed windows are evicted);
  * sessionization state is one [[SessionState]] per active user,
  * evicted by processing-time timeout. Both shuffle once on the
  * grouping key — identical to their batch twins.
  */
object EventStreams {

  /** Watermarked tumbling-window count/sum per hour (the streaming
    * form of q_tumbling_window). Append mode: a window emits exactly
    * once, when the watermark passes its end. */
  def tumblingHourly(events: DataFrame,
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("v"))
      .select(col("w.start").as("bucket"), col("n"), col("v"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         value: Double)
  final case class SessionState(count: Long, lastTs: Long, sessions: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** The ONE session-fold both sessionize variants share (kept single
    * so the gap/ordering semantics documented on [[sessionize]] cannot
    * silently diverge between the two timeout modes): events sorted by
    * (ts, event_id) within the batch, a >gap silence opens a session,
    * lastTs never moves backward. */
  private def foldSession(prev: SessionState, events: Iterator[Event],
                          gapMs: Long): SessionState = {
    var st = prev
    events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val t = e.ts.getTime
      val newSession = st.count == 0L || t - st.lastTs > gapMs
      st = SessionState(st.count + 1, math.max(st.lastTs, t),
        st.sessions + (if (newSession) 1L else 0L))
    }
    st
  }

  /** Gap sessionization with custom state (the streaming form of
    * q_sessionize): a >30 min silence starts a new session. State is
    * one small case class per user; emitted on every update so the
    * sink always has the current per-user session count.
    *
    * State lifetime: evicted by a processing-time timeout after
    * `stateTimeoutMinutes` without activity (the final counts are
    * emitted once more at eviction). A user reappearing after eviction
    * restarts their counts — bounded state is the 100 TB trade against
    * exact lifetime totals.
    *
    * Ordering: events are sorted by (ts, event_id) within each
    * micro-batch; an event arriving in a LATER batch with an earlier
    * timestamp folds into the current session when it is within the
    * gap of the newest seen timestamp (never reopening closed
    * history) — an explicit approximation, not silent miscounting.
    *
    * Trigger caveat: an armed processing-time timeout keeps a
    * `Trigger.AvailableNow` query alive until the wall-clock timer
    * fires — drive bounded replays with `processAllAvailable()` +
    * `stop()`, or use [[sessionizeEventTime]] whose eviction is
    * watermark-driven and therefore end-of-data-terminating. */
  def sessionize(events: Dataset[Event],
                 gapMinutes: Long = 30,
                 stateTimeoutMinutes: Long = 120): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.ProcessingTimeTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Idle past the timeout: emit the final counts, drop the
            // state — per-user memory is bounded by the idle window.
            val st = state.get
            state.remove()
            UserSessions(uid, st.count, st.sessions)
          } else {
            val st = foldSession(
              state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L)),
              it, gapMs)
            state.update(st)
            state.setTimeoutDuration(stateTimeoutMinutes * 60L * 1000L)
            UserSessions(uid, st.count, st.sessions)
          }
      }
  }

  /** Watermark-driven sessionization: same session semantics as
    * [[sessionize]], but state eviction is tied to EVENT time — a
    * user's state is dropped once the watermark passes their newest
    * event plus the session gap, at which point the final counts are
    * emitted one last time.
    *
    * This is the preferred form for replay/backfill and bounded
    * drains: no wall-clock timers are armed, so a
    * `Trigger.AvailableNow` run terminates at end of data, and state
    * lifetime is a function of the DATA (watermark) rather than of how
    * fast the job happens to process it. State per user is one
    * [[SessionState]]; total state is bounded by the number of users
    * active within the watermark horizon. */
  def sessionizeEventTime(events: Dataset[Event],
                          gapMinutes: Long = 30,
                          watermark: String = "10 minutes"): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Watermark passed lastTs + gap: the session can never be
            // extended by in-watermark data — emit final counts, evict.
            val st = state.get
            state.remove()
            UserSessions(uid, st.count, st.sessions)
          } else {
            val st = foldSession(
              state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L)),
              it, gapMs)
            state.update(st)
            // Evict once the watermark proves the gap has elapsed. The
            // timestamp must sit strictly above the current watermark or
            // Spark rejects it (a very late group's gap may already have
            // passed) — clamp to watermark+1ms so eviction fires on the
            // next watermark advance.
            state.setTimeoutTimestamp(
              math.max(st.lastTs + gapMs, state.getCurrentWatermarkMs() + 1L))
            UserSessions(uid, st.count, st.sessions)
          }
      }
  }

  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class SessionRecord(user_id: Long, session_start: Timestamp,
                                 session_end: Timestamp, n_events: Long)

  /** One row PER CLOSED SESSION from custom state — the
    * flatMapGroupsWithState form (0..n outputs per group per batch,
    * where mapGroupsWithState is locked to exactly one): a session
    * closes either when a >gap event arrives (emitted immediately,
    * same batch) or when the watermark passes its end + gap (emitted
    * from the timeout branch, state removed). Same output SHAPE as the
    * native [[sessionWindows]] aggregation; this form is for session
    * semantics the built-in can't express — custom close rules,
    * per-session derived fields — while keeping the identical
    * watermark-bounded state lifecycle. Append mode (a record is final
    * when emitted). State per user is one [[OpenSession]].
    *
    * Ordering: per-batch events fold in (ts, event_id) order; a
    * cross-batch straggler within the gap of the open session extends
    * it, one beyond the gap closes it first — the same explicit
    * approximation as [[sessionize]]. */
  def sessionRecords(events: Dataset[Event],
                     gapMinutes: Long = 30,
                     watermark: String = "10 minutes"): Dataset[SessionRecord] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionRecord](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[OpenSession]) =>
          def rec(s: OpenSession) = SessionRecord(uid,
            new Timestamp(s.start), new Timestamp(s.last), s.n)
          if (state.hasTimedOut) {
            // Watermark passed last + gap: the open session can never
            // be extended by in-watermark data — close it, drop state.
            val s = state.get
            state.remove()
            Iterator.single(rec(s))
          } else {
            val closed = Seq.newBuilder[SessionRecord]
            var open = state.getOption
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case Some(s) if t - s.last > gapMs =>
                  closed += rec(s)
                  Some(OpenSession(t, t, 1L))
                case Some(s) =>
                  Some(OpenSession(s.start, math.max(s.last, t), s.n + 1L))
                case None =>
                  Some(OpenSession(t, t, 1L))
              }
            }
            // flatMap groups only sees keys WITH data or WITH a timeout
            // — open is defined on every data path.
            val s = open.get
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1L))
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop events whose `idCols` were already
    * seen, keeping state only within the watermark (the streaming twin
    * of q_dedup_exact — state is evicted once an id is older than the
    * watermark, so memory is bounded by the late-data window instead
    * of the stream's lifetime). */
  def dedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                           watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Native session-window aggregation: per-user session rows built by
    * Spark's built-in `session_window` (dynamic gap, watermark-driven
    * merge + eviction) — the pure-aggregation alternative to the
    * custom-state [[sessionize]] forms. Where sessionize keeps ONE
    * running counter per user (emitting totals), this emits ONE ROW
    * PER CLOSED SESSION with its bounds and event count — the shape a
    * downstream table wants. All engine machinery: no user state, so
    * it parallelizes and evicts exactly like any windowed agg. Append
    * mode; a session emits when the watermark passes its close. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("v"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("v"))

  /** Stream-stream interval join: match each left event with the right
    * events of the SAME user within `[left.ts - before, left.ts +
    * after]` — the enrichment shape (clicks ⋈ impressions, spans ⋈
    * metrics) expressed with Structured Streaming's watermarked
    * stream-stream join. Both sides carry a watermark and the join
    * condition bounds the event-time distance, so each side's buffered
    * state is evicted once the other side's watermark passes the
    * bound — state is O(rate × window), not O(stream). Append-mode
    * only (inner join emits when both sides are sealed).
    *
    * Column contract: left has (event_id, ts, user_id, ...), right is
    * aliased (r_event_id, r_ts, user_id, ...); output pairs them. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   before: String = "10 minutes",
                   after: String = "10 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right
      .withColumnRenamed("event_id", "r_event_id")
      .withColumnRenamed("ts", "r_ts")
      .withWatermark("r_ts", watermark)
    l.join(r,
      l("user_id") === r("user_id")
        && col("r_ts") >= col("ts") - expr(s"INTERVAL $before")
        && col("r_ts") <= col("ts") + expr(s"INTERVAL $after"))
      .drop(r("user_id"))
  }

  /** Convenience: run a streaming DataFrame to a memory sink until all
    * available data is processed; returns the sink table name. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  outputMode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
