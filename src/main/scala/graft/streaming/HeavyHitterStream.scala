package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming heavy hitters — qa5's streaming twin: per group (event
  * type), a count-min sketch absorbs every observation across
  * micro-batches and restarts, and a bounded CANDIDATE set (the
  * space-saving companion CMS needs, since a sketch alone can estimate
  * but not enumerate) tracks the current top-k. Emits the top-k with
  * estimated counts after each batch that touches the group.
  *
  * State per group is O(sketch + k): the serialized CMS (a few KB at
  * eps=0.001, fixed regardless of stream length or user cardinality)
  * plus k candidate ids — the bounded-memory property that makes
  * frequency tracking viable on an unbounded stream where an exact
  * per-user count table would grow without limit. CMS merge/update is
  * exact arithmetic (Cormode & Muthukrishnan 2005), and the fixed seed
  * makes every estimate deterministic, so replayed batches reproduce
  * identical output.
  *
  * The candidate set admits any id seen in the current batch, so a
  * newly-hot key enters as soon as it out-estimates the incumbent #k —
  * the standard space-saving admission rule; ties break on the lower id
  * for determinism.
  */
object HeavyHitterStream extends Serializable {

  final case class Obs(group: String, item: Long)
  final case class HHState(sketch: Array[Byte], candidates: Seq[Long])
  final case class HHOut(group: String, item: Long, est_count: Long, rank: Int)

  private val Seed = 42

  private[streaming] def newSketch(eps: Double, confidence: Double): CountMinSketch =
    CountMinSketch.create(eps, confidence, Seed)

  private[streaming] def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  private[streaming] def serialize(cms: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  /** Fold one group's batch into its sketch + candidate state; emit the
    * group's current top-k (rank 1 = heaviest).
    */
  def updateHitters(k: Int, eps: Double, confidence: Double)(
      group: String,
      obs: Iterator[Obs],
      state: GroupState[HHState]): Iterator[HHOut] = {
    val prior = state.getOption
    val cms = prior.map(s => deserialize(s.sketch))
      .getOrElse(newSketch(eps, confidence))
    val batchItems = scala.collection.mutable.LinkedHashSet.empty[Long]
    obs.foreach { o =>
      cms.addLong(o.item)
      batchItems += o.item
    }
    val candidates = (prior.map(_.candidates).getOrElse(Seq.empty) ++ batchItems)
      .distinct
      .map(item => item -> cms.estimateCount(item))
      .sortBy { case (item, est) => (-est, item) }
      .take(k)
    state.update(HHState(serialize(cms), candidates.map(_._1)))
    candidates.iterator.zipWithIndex.map { case ((item, est), i) =>
      HHOut(group, item, est, i + 1)
    }
  }

  /** Wire the updater over a (possibly streaming) typed observation
    * Dataset. No timeout: the sketch IS the durable frequency ledger.
    */
  def hitters(spark: SparkSession, obs: Dataset[Obs], k: Int = 3,
      eps: Double = 0.001, confidence: Double = 0.99): Dataset[HHOut] = {
    import spark.implicits._
    obs
      .groupByKey(_.group)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateHitters(k, eps, confidence))
  }
}
