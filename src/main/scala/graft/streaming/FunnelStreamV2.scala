package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import FunnelStream.{Event, FunnelOut, FunnelState}

/** [[FunnelStream.funnel]] on Spark 4's `transformWithState`. Each stage's
  * first-touch timestamp lives in its OWN named value store ("view",
  * "click", "purchase") — adding a fourth funnel stage later is one new
  * named state, not a checkpoint-breaking rewrite of a packed blob, which
  * is exactly the state-evolution story funnels need (product funnels grow
  * stages). The idle expiry becomes an explicit per-key timer whose firing
  * emits the final `completed=false` row.
  *
  * Semantics are pinned to V1 (FunnelStreamV2Spec replays the same
  * scenarios over both): per-batch events fold in (ts_us, event_id) order,
  * a stage advances only when it is the next one and strictly after the
  * prior stage's timestamp, one emission per ADVANCE, state removed on
  * completion. Requires the RocksDB state store provider.
  */
object FunnelStreamV2 extends Serializable {

  val RequiredStateStoreProvider: String = QuotaStreamV2.RequiredStateStoreProvider

  private val Unset = -1L

  class FunnelProcessor(timeoutMs: Long)
      extends StatefulProcessor[Long, Event, FunnelOut] {
    @transient private var view: ValueState[Long] = _
    @transient private var click: ValueState[Long] = _
    @transient private var purchase: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      view = getHandle.getValueState[Long]("view", Encoders.scalaLong, TTLConfig.NONE)
      click = getHandle.getValueState[Long]("click", Encoders.scalaLong, TTLConfig.NONE)
      purchase = getHandle.getValueState[Long]("purchase", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def read(s: ValueState[Long]): Long =
      if (s.exists()) s.get() else Unset

    private def stateNow: FunnelState =
      FunnelState(read(view), read(click), read(purchase))

    private def stageOf(st: FunnelState): Int =
      (if (st.viewUs != Unset) 1 else 0) +
        (if (st.clickUs != Unset) 1 else 0) +
        (if (st.purchaseUs != Unset) 1 else 0)

    private def toOut(userId: Long, st: FunnelState, closed: Boolean): FunnelOut =
      FunnelOut(userId, stageOf(st), st.viewUs, st.clickUs, st.purchaseUs,
        completed = st.purchaseUs != Unset, closed = closed)

    private def advance(st: FunnelState, e: Event): Option[FunnelState] =
      e.event_type match {
        case "view" if st.viewUs == Unset =>
          Some(st.copy(viewUs = e.ts_us))
        case "click" if st.viewUs != Unset && st.clickUs == Unset &&
            e.ts_us > st.viewUs =>
          Some(st.copy(clickUs = e.ts_us))
        case "purchase" if st.clickUs != Unset && st.purchaseUs == Unset &&
            e.ts_us > st.clickUs =>
          Some(st.copy(purchaseUs = e.ts_us))
        case _ => None
      }

    private def clearAll(): Unit = {
      view.clear(); click.clear(); purchase.clear()
      getHandle.listTimers().foreach(getHandle.deleteTimer)
    }

    override def handleInputRows(userId: Long, events: Iterator[Event],
        timerValues: TimerValues): Iterator[FunnelOut] = {
      var st = stateNow
      var out = Vector.empty[FunnelOut]
      for (e <- events.toSeq.sortBy(e => (e.ts_us, e.event_id)))
        advance(st, e).foreach { next =>
          st = next
          out :+= toOut(userId, st, closed = st.purchaseUs != Unset)
        }
      if (st.purchaseUs != Unset) clearAll() // done: free the key
      else if (stageOf(st) > 0) {
        if (st.viewUs != Unset) view.update(st.viewUs)
        if (st.clickUs != Unset) click.update(st.clickUs)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(
          timerValues.getCurrentProcessingTimeInMs() + timeoutMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelOut] = {
      val st = stateNow
      if (stageOf(st) == 0) return Iterator.empty
      clearAll()
      Iterator(toOut(userId, st, closed = true)) // abandoned
    }
  }

  /** Wire the processor over a (possibly streaming) typed event Dataset —
    * same signature and defaults as [[FunnelStream.funnel]].
    */
  def funnel(spark: SparkSession, events: Dataset[Event],
      timeoutMs: Long = 60000L): Dataset[FunnelOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(timeoutMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
