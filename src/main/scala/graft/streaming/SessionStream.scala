package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, session_window, unix_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization with explicit custom state
  * (`flatMapGroupsWithState`) — the streaming twin of the batch
  * window-based sessionizer (`ops.Relational.sessionize` / q17).
  *
  * State per key is O(1) (last-seen timestamp + counters), emitted sessions
  * are closed on gap expiry via processing-time timeout, so state size is
  * bounded by live keys — the property that keeps stateful streaming
  * viable at 100 TB/day ingest.
  */
object SessionStream {

  final case class Event(user_id: Long, ts_us: Long, event_id: Long)
  final case class SessionState(
      sessionStartUs: Long, lastTsUs: Long, nEvents: Long)
  /** Sessions are identified by (user_id, start_us) — a counter would
    * restart after state removal on timeout and collide with previously
    * emitted keys; the start timestamp cannot.
    */
  final case class SessionOut(
      user_id: Long, n_events: Long,
      start_us: Long, end_us: Long, closed: Boolean)

  /** Fold a user's new events into session state; emit a closed session
    * whenever a gap larger than `gapUs` appears (or on timeout —
    * `timeoutMs` defaults to the event-time gap, so processing-time
    * expiry approximates the same cutoff).
    */
  def updateSessions(gapUs: Long, timeoutMs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, s.nEvents,
        s.sessionStartUs, s.lastTsUs, closed = true))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var out = Vector.empty[SessionOut]
    var cur = state.getOption
    for (e <- sorted) {
      cur match {
        case Some(s) if e.ts_us - s.lastTsUs > gapUs =>
          out :+= SessionOut(userId, s.nEvents,
            s.sessionStartUs, s.lastTsUs, closed = true)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        case Some(s) =>
          cur = Some(s.copy(lastTsUs = e.ts_us, nEvents = s.nEvents + 1))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutDuration(s"$timeoutMs milliseconds")
    }
    out.iterator
  }

  /** Wire the updater over a (possibly streaming) typed event Dataset.
    * `timeoutMs` bounds how long an idle session's state lives before the
    * session is force-closed (defaults to the gap, in processing time).
    */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapUs: Long,
      timeoutMs: Long = -1L): Dataset[SessionOut] = {
    import spark.implicits._
    val t = if (timeoutMs > 0) timeoutMs else math.max(1L, gapUs / 1000L)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        updateSessions(gapUs, t))
  }

  /** Event-time variant: sessions close when the WATERMARK passes
    * `last event + gap` — the semantically exact closure (processing-time
    * timeouts only approximate it under lag). Requires a watermark on the
    * event-time column; state per key stays O(1).
    */
  def sessionizeEventTime(
      spark: SparkSession,
      events: Dataset[Event],
      gapUs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import spark.implicits._

    def update(userId: Long, it: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, s.nEvents,
          s.sessionStartUs, s.lastTsUs, closed = true))
      }
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var out = Vector.empty[SessionOut]
      var cur = state.getOption
      for (e <- sorted) {
        cur match {
          case Some(s) if e.ts_us - s.lastTsUs > gapUs =>
            out :+= SessionOut(userId, s.nEvents, s.sessionStartUs,
              s.lastTsUs, closed = true)
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
          case Some(s) =>
            cur = Some(s.copy(lastTsUs = e.ts_us, nEvents = s.nEvents + 1))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close when the watermark passes the gap boundary; clamp to the
        // watermark for state touched by late-arriving data (a timeout
        // below the watermark is rejected by the state machinery)
        val boundary = (s.lastTsUs + gapUs) / 1000L
        state.setTimeoutTimestamp(
          math.max(boundary, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    events
      .withColumn("__ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("__ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update _)
  }

  /** The DECLARATIVE twin of [[sessionizeEventTime]]: Spark's built-in
    * `session_window` grouping, where the engine owns session merge,
    * state-store layout, and watermark-driven closure — no hand-written
    * state machine to get wrong, and the streaming aggregation exchanges
    * only on (user_id, window), exactly like a batch groupBy would.
    * Prefer this whenever the requirement is "one row per closed session
    * with aggregates"; the custom [[sessionize]]/[[sessionizeEventTime]]
    * updaters exist for what this cannot express — per-event progress
    * emission, custom session identity, processing-time flushes (see also
    * [[FunnelStream]]). Output mirrors [[SessionOut]] minus `closed`
    * (append mode only ever emits closed sessions).
    */
  def sessionizeDeclarative(
      spark: SparkSession,
      events: Dataset[Event],
      gap: String = "1 minute",
      watermarkDelay: String = "10 seconds"): DataFrame = {
    events
      .withColumn("__ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("__ts"), gap).as("__sw"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("__ts"))).as("start_us"),
        unix_micros(max(col("__ts"))).as("end_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
  }
}
