package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
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
      sessionStartUs: Long, lastTsUs: Long, nEvents: Long, sessionSeq: Long)
  final case class SessionOut(
      user_id: Long, session_seq: Long, n_events: Long,
      start_us: Long, end_us: Long, closed: Boolean)

  /** Fold a user's new events into session state; emit a closed session
    * whenever a gap larger than `gapUs` appears (or on timeout).
    */
  def updateSessions(gapUs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, s.sessionSeq, s.nEvents,
        s.sessionStartUs, s.lastTsUs, closed = true))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var out = Vector.empty[SessionOut]
    var cur = state.getOption
    for (e <- sorted) {
      cur match {
        case Some(s) if e.ts_us - s.lastTsUs > gapUs =>
          out :+= SessionOut(userId, s.sessionSeq, s.nEvents,
            s.sessionStartUs, s.lastTsUs, closed = true)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, s.sessionSeq + 1))
        case Some(s) =>
          cur = Some(s.copy(lastTsUs = e.ts_us, nEvents = s.nEvents + 1))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutDuration("30 seconds")
    }
    out.iterator
  }

  /** Wire the updater over a (possibly streaming) typed event Dataset. */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapUs: Long): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        updateSessions(gapUs))
  }
}
