package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the native batch as-of join (plans.AsOfJoinPlan,
  * q76): attach the latest right-side row to every left event, per key —
  * attribution ("which click preceded this purchase") and feature
  * staleness joins over a live stream.
  *
  * The state IS AsOfJoinExec's merge state made persistent: ONE buffered
  * right row per key (the maximum (ts, id) ordering tuple seen), kept in a
  * named `transformWithState` value store, so state is O(keys) regardless
  * of stream volume — the boundedness that keeps the operator viable at
  * 100 TB/day. Within a micro-batch, ticks replay in ascending
  * (ts_us, event_id) — exactly the batch operator's required child
  * ordering — so a left event only ever sees rights at-or-before its own
  * tuple and a replayed batch emits identically. Tolerance is the same
  * O(1) head-distance check at emit.
  *
  * Streaming semantics (vs the batch operator): results append — a right
  * row arriving in a LATER micro-batch than a left event does not revise
  * the already-emitted match, it only upgrades the buffer for subsequent
  * lefts. Under per-key in-order arrival (or any single-batch replay of a
  * key's history) the output equals the batch backward-strict as-of join
  * row-for-row (StreamAsOfSpec pins parity against q76's shape). A right
  * row older than the buffered one is ignored outright: backward as-of
  * only ever needs the newest right at-or-before each left, and the
  * buffer is already newer for every future left.
  */
object StreamAsOf extends Serializable {

  /** `transformWithState` only runs on RocksDB-backed state. */
  val RequiredStateStoreProvider: String = QuotaStreamV2.RequiredStateStoreProvider

  /** One input tick — both sides union into a single keyed stream
    * (`is_right = true` for the reference side).
    */
  final case class Tick(
      user_id: Long, ts_us: Long, event_id: Long, is_right: Boolean)

  /** The buffered merge state: the max-(ts, id) right row seen so far. */
  final case class RightSeen(ts_us: Long, event_id: Long)

  /** One output row per LEFT tick; `right_*` are −1 when unmatched. */
  final case class AsOfMatch(
      user_id: Long, event_id: Long, ts_us: Long,
      right_event_id: Long, right_ts_us: Long, matched: Boolean)

  /** Per-key processor: one named value state ("lastRight"). `toleranceUs`
    * < 0 disables the window; `ttl` bounds idle keys' state lifetime
    * (requires processing-time mode).
    */
  class AsOfProcessor(toleranceUs: Long, ttl: TTLConfig)
      extends StatefulProcessor[Long, Tick, AsOfMatch] {
    @transient private var lastRight: ValueState[RightSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastRight = getHandle.getValueState[RightSeen](
        "lastRight", Encoders.product[RightSeen], ttl)

    override def handleInputRows(key: Long, ticks: Iterator[Tick],
        timerValues: TimerValues): Iterator[AsOfMatch] = {
      var buf = if (lastRight.exists()) lastRight.get() else null
      val out = Vector.newBuilder[AsOfMatch]
      // the batch operator's required child ordering, replayed per batch:
      // rights at-or-before a left (by tuple) land in the buffer first
      for (t <- ticks.toSeq.sortBy(x => (x.ts_us, x.event_id))) {
        if (t.is_right) {
          if (buf == null || t.ts_us > buf.ts_us ||
              (t.ts_us == buf.ts_us && t.event_id > buf.event_id))
            buf = RightSeen(t.ts_us, t.event_id)
        } else {
          // backward as-of: the buffered right must be event-time
          // at-or-before the left (a buffered right from the key's
          // FUTURE — possible only when a left arrives a batch behind a
          // later right — never matches, same as the batch operator)
          val before = buf != null &&
            (buf.ts_us < t.ts_us ||
              (buf.ts_us == t.ts_us && buf.event_id < t.event_id))
          val inWindow = before &&
            (toleranceUs < 0 || t.ts_us - buf.ts_us <= toleranceUs)
          out += (if (inWindow)
            AsOfMatch(key, t.event_id, t.ts_us, buf.event_id, buf.ts_us,
              matched = true)
          else
            AsOfMatch(key, t.event_id, t.ts_us, -1L, -1L, matched = false))
        }
      }
      if (buf != null) lastRight.update(buf)
      out.result().iterator
    }
  }

  /** Wire the processor over a (possibly streaming) typed tick Dataset.
    * `ttlMs > 0` expires idle keys' buffered right row after that much
    * processing time — the state bound for unbounded key spaces.
    */
  def matches(spark: SparkSession, ticks: Dataset[Tick],
      toleranceUs: Long = -1L, ttlMs: Long = -1L): Dataset[AsOfMatch] = {
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    ticks
      .groupByKey(_.user_id)
      .transformWithState(
        new AsOfProcessor(toleranceUs, ttl), mode, OutputMode.Append())
  }

  /** EVENT-TIME processor — the exactness variant: ticks BUFFER in a named
    * list state until the watermark passes their timestamp, then fold in
    * global (ts_us, event_id) order, at which point no earlier
    * in-watermark tick can still arrive — so every left's match is FINAL
    * and equals the batch backward-strict as-of join under ANY arrival
    * order within the watermark (where [[AsOfProcessor]] provably emits
    * the stale buffer for a left that out-raced its click). The honest
    * cost is the same buffered-lateness trade `funnelEventTime` makes:
    * state per key is O(ticks inside the watermark window), not O(1).
    * Ticks at or below the watermark on arrival are dropped (the standard
    * allowed-lateness contract). A per-key timer at the oldest pending
    * timestamp drives emission when the watermark advances without new
    * input for the key.
    */
  class EventTimeAsOfProcessor(toleranceUs: Long)
      extends StatefulProcessor[Long, Tick, AsOfMatch] {
    @transient private var pending: org.apache.spark.sql.streaming.ListState[Tick] = _
    @transient private var lastRight: ValueState[RightSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[Tick](
        "pending", Encoders.product[Tick], TTLConfig.NONE)
      lastRight = getHandle.getValueState[RightSeen](
        "lastRight", Encoders.product[RightSeen], TTLConfig.NONE)
    }

    /** Fold every pending tick the watermark has passed; hold the rest. */
    private def processRipe(key: Long, wmUs: Long): Iterator[AsOfMatch] = {
      val all = pending.get().toSeq
      val (ripe, hold) = all.partition(_.ts_us <= wmUs)
      var buf = if (lastRight.exists()) lastRight.get() else null
      val out = Vector.newBuilder[AsOfMatch]
      for (t <- ripe.sortBy(x => (x.ts_us, x.event_id))) {
        if (t.is_right) {
          if (buf == null || t.ts_us > buf.ts_us ||
              (t.ts_us == buf.ts_us && t.event_id > buf.event_id))
            buf = RightSeen(t.ts_us, t.event_id)
        } else {
          val inWindow = buf != null &&
            (toleranceUs < 0 || t.ts_us - buf.ts_us <= toleranceUs)
          out += (if (inWindow)
            AsOfMatch(key, t.event_id, t.ts_us, buf.event_id, buf.ts_us,
              matched = true)
          else
            AsOfMatch(key, t.event_id, t.ts_us, -1L, -1L, matched = false))
        }
      }
      if (buf != null) lastRight.update(buf)
      pending.clear()
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (hold.nonEmpty) {
        pending.appendList(hold.toArray)
        // wake when the watermark passes the oldest held tick; timer
        // timestamps must sit strictly above the current watermark
        getHandle.registerTimer(
          math.max(hold.map(_.ts_us).min / 1000L, wmUs / 1000L + 1))
      }
      out.result().iterator
    }

    override def handleInputRows(key: Long, ticks: Iterator[Tick],
        timerValues: TimerValues): Iterator[AsOfMatch] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      // drop sub-watermark arrivals; buffer the rest
      val fresh = ticks.filter(_.ts_us > wmUs).toArray
      if (fresh.nonEmpty) pending.appendList(fresh)
      processRipe(key, wmUs)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[AsOfMatch] =
      processRipe(key, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  /** Wire the event-time processor; requires a watermark, expressed here
    * on a derived `__ts` column exactly like `funnelEventTime`.
    */
  def matchesEventTime(spark: SparkSession, ticks: Dataset[Tick],
      toleranceUs: Long = -1L,
      watermarkDelay: String = "10 seconds"): Dataset[AsOfMatch] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    ticks
      .withColumn("__ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("__ts", watermarkDelay)
      .as[Tick]
      .groupByKey(_.user_id)
      .transformWithState(
        new EventTimeAsOfProcessor(toleranceUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
