package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

import SessionStream.{Event, SessionOut}

/** [[SessionStream.sessionize]] on Spark 4's `transformWithState` — the
  * third operator ported to the successor API (after [[QuotaStreamV2]] and
  * [[HeavyHitterStreamV2]]). The V1 session state is one opaque case-class
  * blob; here its three fields live in independently named, individually
  * evolvable stores ("start", "last", "n") so adding a fourth counter
  * later is a new named state, not a checkpoint-breaking schema change.
  * The processing-time idle flush becomes an explicit per-key TIMER
  * (re-armed on every batch that touches the key) whose expiry emits the
  * final closed row — the V1 `GroupStateTimeout.ProcessingTimeTimeout`
  * re-expressed in the new API's timer surface.
  *
  * Semantics are pinned to V1 (SessionStreamV2Spec replays the same
  * scenario over both): per-batch events fold in (ts_us, event_id) order,
  * a gap larger than `gapUs` closes the running session and opens a new
  * one, and sessions are identified by (user_id, start_us). State per key
  * stays O(1). Requires the RocksDB state store provider.
  */
object SessionStreamV2 extends Serializable {

  val RequiredStateStoreProvider: String = QuotaStreamV2.RequiredStateStoreProvider

  class SessionProcessor(gapUs: Long, timeoutMs: Long)
      extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var start: ValueState[Long] = _
    @transient private var last: ValueState[Long] = _
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      start = getHandle.getValueState[Long]("start", Encoders.scalaLong, TTLConfig.NONE)
      last = getHandle.getValueState[Long]("last", Encoders.scalaLong, TTLConfig.NONE)
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def clearAll(): Unit = { start.clear(); last.clear(); n.clear() }

    override def handleInputRows(userId: Long, events: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var out = Vector.empty[SessionOut]
      // resume the open session from the named stores
      var cur: Option[(Long, Long, Long)] =
        if (start.exists()) Some((start.get(), last.get(), n.get())) else None
      for (e <- sorted) {
        cur match {
          case Some((st, lt, cnt)) if e.ts_us - lt > gapUs =>
            out :+= SessionOut(userId, cnt, st, lt, closed = true)
            cur = Some((e.ts_us, e.ts_us, 1L))
          case Some((st, _, cnt)) =>
            cur = Some((st, e.ts_us, cnt + 1L))
          case None =>
            cur = Some((e.ts_us, e.ts_us, 1L))
        }
      }
      cur.foreach { case (st, lt, cnt) =>
        start.update(st); last.update(lt); n.update(cnt)
        // re-arm the idle flush: one live timer per key
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(
          timerValues.getCurrentProcessingTimeInMs() + timeoutMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!start.exists()) return Iterator.empty
      val outRow = SessionOut(userId, n.get(), start.get(), last.get(),
        closed = true)
      clearAll()
      Iterator(outRow)
    }
  }

  /** Wire the processor over a (possibly streaming) typed event Dataset —
    * same signature and defaults as [[SessionStream.sessionize]].
    */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapUs: Long,
      timeoutMs: Long = -1L): Dataset[SessionOut] = {
    import spark.implicits._
    val t = if (timeoutMs > 0) timeoutMs else math.max(1L, gapUs / 1000L)
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapUs, t),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
