package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup

/** State-store MinHash-LSH near-dup: the LOW-LATENCY, bounded-window twin
  * of [[CurationStream.runNearDup]]'s storage-backed band registry.
  *
  * The registry variant is the corpus-scale path — at 100 TB the band-key
  * set is corpus-sized and belongs in bucketed parquet, not the state
  * backend. But a dedup policy scoped to a RETENTION WINDOW ("suppress
  * near-dups of anything crawled in the last N hours") has state bounded
  * by the window, which is exactly what the streaming state store with
  * event-time timeouts is built for: per-bucket state, evicted when the
  * watermark passes last-touch + retention, no storage round-trip per
  * micro-batch.
  *
  * Semantics: bucket-level first-wins. Each LSH band bucket remembers the
  * first doc that claimed it; any later doc hashing into a claimed bucket
  * inside the retention window emits a [[NearDupHit]] naming the keeper.
  * One-sided like all LSH banding: a doc that loses one bucket but wins
  * another still holds the won bucket (may over-suppress later arrivals;
  * never under-reports a collision). Downstream consumers either alert on
  * the hit stream directly or aggregate per doc_id (any-band-hit => dup).
  */
object NearDupStateStream {

  /** One (doc, band) collision against the bucket's current keeper. */
  final case class NearDupHit(doc_id: Long, band_key: Long, keeper_id: Long)

  final case class BandRow(doc_id: Long, band_key: Long, ts: Timestamp)
  final case class BucketState(keeperId: Long)

  /** (doc_id, band_key, ts) LSH bucket rows for a document stream —
    * [[Dedup.bandKeys]] with the event-time column carried through so the
    * watermark survives the projection.
    */
  def bandRows(docs: DataFrame, numPerms: Int, rowsPerBand: Int): DataFrame =
    Dedup.bandKeys(
        Dedup.minhashSignatures(docs, numPerms, carry = Seq("ts")),
        rowsPerBand, carry = Seq("ts"))
      .select(col("id").as("doc_id"),
        xxhash64(col("band"), col("band_sig")).as("band_key"),
        col("ts"))

  /** The hit stream: one row per (doc, band) that collides with a bucket
    * claimed inside the retention window. State is one Long per LIVE
    * bucket, evicted by event-time timeout `retentionMs` after the
    * bucket's last touch — memory is O(buckets-in-window), independent of
    * corpus size.
    */
  def nearDupHits(docs: DataFrame,
      numPerms: Int = 16, rowsPerBand: Int = 4,
      watermarkDelay: String = "10 minutes",
      retentionMs: Long = 3600L * 1000): Dataset[NearDupHit] = {
    val s = docs.sparkSession
    import s.implicits._
    bandRows(docs, numPerms, rowsPerBand)
      .withWatermark("ts", watermarkDelay)
      .as[BandRow]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bandKey: Long, rows: Iterator[BandRow],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // retention window passed with no new touch: forget the bucket
            state.remove()
            Iterator.empty
          } else {
            // deterministic within-batch order: earliest (ts, doc_id) wins
            // an unclaimed bucket, matching the batch pipeline's
            // canonical-min greedy policy
            val sorted = rows.toIndexedSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var keeper = state.getOption.map(_.keeperId)
            val hits = Seq.newBuilder[NearDupHit]
            sorted.foreach { r =>
              keeper match {
                case None => keeper = Some(r.doc_id)
                case Some(k) if k != r.doc_id =>
                  hits += NearDupHit(r.doc_id, bandKey, k)
                case Some(_) => () // the keeper's own re-arrival
              }
            }
            state.update(BucketState(keeper.get))
            state.setTimeoutTimestamp(
              sorted.map(_.ts.getTime).max + retentionMs)
            hits.result().iterator
          }
      }
  }
}
