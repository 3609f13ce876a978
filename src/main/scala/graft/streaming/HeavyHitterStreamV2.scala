package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import HeavyHitterStream.{HHOut, Obs}

/** [[HeavyHitterStream]] on Spark 4's `transformWithState` — the second
  * stateful operator ported to the successor API (after [[QuotaStreamV2]]),
  * and the one that shows WHY the new state model matters: V1 packs the
  * sketch and the candidate set into one opaque case-class blob, so
  * evolving either means a checkpoint-breaking schema change; here they
  * are two independently named stores — the serialized count-min sketch in
  * a `ValueState[Array[Byte]]` and the top-k candidate ids in a
  * `ListState[Long]` — each evolvable (or TTL-able) on its own.
  *
  * Semantics are pinned to V1 (HeavyHitterStreamV2Spec replays the same
  * scenarios over both): fixed-seed CMS absorbs every observation across
  * micro-batches and restarts, candidates admit any id seen in the batch,
  * rank by (−estimate, id). State per group stays O(sketch + k).
  *
  * Requires the RocksDB state store provider, like every
  * `transformWithState` operator ([[QuotaStreamV2.RequiredStateStoreProvider]]).
  */
object HeavyHitterStreamV2 extends Serializable {

  /** Sketch-plus-candidates processor; k/eps/confidence fixed at wiring. */
  class HitterProcessor(k: Int, eps: Double, confidence: Double)
      extends StatefulProcessor[String, Obs, HHOut] {
    @transient private var sketch: ValueState[Array[Byte]] = _
    @transient private var candidates: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sketch = getHandle.getValueState[Array[Byte]](
        "cms", Encoders.BINARY, TTLConfig.NONE)
      candidates = getHandle.getListState[Long](
        "candidates", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(group: String, obs: Iterator[Obs],
        timerValues: TimerValues): Iterator[HHOut] = {
      val cms =
        if (sketch.exists()) HeavyHitterStream.deserialize(sketch.get())
        else HeavyHitterStream.newSketch(eps, confidence)
      val batchItems = scala.collection.mutable.LinkedHashSet.empty[Long]
      obs.foreach { o =>
        cms.addLong(o.item)
        batchItems += o.item
      }
      // same admission rule as V1: incumbents ++ batch ids, re-estimated
      // against the updated sketch, top-k by (-est, id)
      val top = (candidates.get().toSeq ++ batchItems)
        .distinct
        .map(item => item -> cms.estimateCount(item))
        .sortBy { case (item, est) => (-est, item) }
        .take(k)
      sketch.update(HeavyHitterStream.serialize(cms))
      candidates.clear()
      candidates.appendList(top.map(_._1).toArray)
      top.iterator.zipWithIndex.map { case ((item, est), i) =>
        HHOut(group, item, est, i + 1)
      }
    }
  }

  /** Wire the processor over a (possibly streaming) typed observation
    * Dataset. No timers: the sketch IS the durable frequency ledger.
    */
  def hitters(spark: SparkSession, obs: Dataset[Obs], k: Int = 3,
      eps: Double = 0.001, confidence: Double = 0.99): Dataset[HHOut] = {
    import spark.implicits._
    obs
      .groupByKey(_.group)
      .transformWithState(
        new HitterProcessor(k, eps, confidence), TimeMode.None(), OutputMode.Append())
  }
}
