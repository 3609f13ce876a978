package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import QuotaStream.{Admission, Doc}

/** [[QuotaStream]] on Spark 4's `transformWithState` — the successor API to
  * `flatMapGroupsWithState` with a forward-compatible state format: state
  * lives in NAMED, individually-evolvable stores behind a
  * [[StatefulProcessor]] handle instead of one opaque case-class blob, so
  * adding a second counter later is a new named state, not a
  * checkpoint-breaking schema change.
  *
  * Semantics are pinned to the V1 operator (QuotaStreamSpec runs the same
  * scenarios over both): one long of state per source, deterministic
  * admission by ascending doc_id within a batch, cap enforced ACROSS
  * micro-batches and restarts. The V1 path stays for checkpoints that
  * already exist — a running query cannot swap operators mid-checkpoint.
  *
  * Deployment note: `transformWithState` requires the RocksDB state store
  * provider ([[QuotaStreamV2.RequiredStateStoreProvider]]); the HDFS-backed
  * default is rejected by Spark at query start. Same per-batch memory
  * profile as V1 (the deterministic sort materializes one source's slice
  * of one micro-batch) — bound batches at the source.
  */
object QuotaStreamV2 extends Serializable {

  /** `transformWithState` only runs on RocksDB-backed state; set
    * `spark.sql.streaming.stateStore.providerClass` to this before
    * starting the query.
    */
  val RequiredStateStoreProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Per-source quota ledger: one named long ("admitted") per key. */
  class QuotaProcessor(maxDocs: Long)
      extends StatefulProcessor[String, Doc, Admission] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long](
        "admitted", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(source: String, docs: Iterator[Doc],
        timerValues: TimerValues): Iterator[Admission] = {
      var n = if (admitted.exists()) admitted.get() else 0L
      // same deterministic fold as QuotaStream.updateQuota: sort the
      // batch's candidates so a replayed micro-batch admits identically
      val out = docs.toSeq.sortBy(_.doc_id).map { d =>
        val admit = n < maxDocs
        if (admit) n += 1
        Admission(d.doc_id, source, admit, n)
      }
      admitted.update(n)
      out.iterator
    }
  }

  /** Wire the processor over a (possibly streaming) typed doc Dataset. */
  def admissions(spark: SparkSession, docs: Dataset[Doc],
      maxDocs: Long): Dataset[Admission] = {
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(
        new QuotaProcessor(maxDocs), TimeMode.None(), OutputMode.Append())
  }
}
