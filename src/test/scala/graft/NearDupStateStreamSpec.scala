package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.NearDupStateStream

/** Bounded-window state-store near-dup (streaming/NearDupStateStream.scala):
  * the low-latency twin of the storage-backed band registry. Drives real
  * micro-batches through MemoryStream so watermark motion and event-time
  * state eviction are observed, not mocked.
  */
class NearDupStateStreamSpec extends SparkSpec {

  test("flags LSH collisions within the window and evicts state after retention") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val hits = NearDupStateStream.nearDupHits(docs,
      numPerms = 16, rowsPerBand = 4,
      watermarkDelay = "10 minutes", retentionMs = 3600L * 1000)
    val q = hits.writeStream.format("memory").queryName("neardup_hits")
      .outputMode("append").start()
    def t(min: Long) = new Timestamp(min * 60000L)
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different words about spark clusters shuffling parquet"
    try {
      // batch 1: doc 1 claims its buckets (earliest (ts, doc_id) wins);
      // doc 3 carries the identical text, so ALL 16/4 = 4 bands collide
      input.addData((1L, textA, t(1000)), (3L, textA, t(1000)))
      q.processAllAvailable()
      val b1 = s.table("neardup_hits").as[NearDupStateStream.NearDupHit].collect()
      assert(b1.map(_.doc_id).toSet == Set(3L), b1.mkString(","))
      assert(b1.forall(_.keeper_id == 1L))
      assert(b1.length == 4, s"expected 4 band collisions, got ${b1.length}")

      // batch 2: unrelated doc 2h later — the post-batch watermark
      // (110 min past batch 1) passes batch-1 buckets' 60-min retention
      input.addData((99L, textB, t(1000 + 120)))
      q.processAllAvailable()
      // batch 3: runs with that watermark, so the timed-out buckets evict
      input.addData((98L, "unrelated corpus entirely nine mice danced under twelve green moons", t(1000 + 121)))
      q.processAllAvailable()
      // batch 4: textA again — its buckets were evicted, so doc 4 claims
      // them fresh and must NOT be flagged against long-gone doc 1
      input.addData((4L, textA, t(1000 + 122)))
      q.processAllAvailable()
      val all = s.table("neardup_hits").as[NearDupStateStream.NearDupHit].collect()
      assert(!all.map(_.doc_id).contains(4L),
        s"doc 4 flagged after retention eviction: ${all.mkString(",")}")
      assert(all.map(_.doc_id).toSet == Set(3L), all.mkString(","))
    } finally {
      q.stop()
      s.sql("DROP TABLE IF EXISTS neardup_hits")
    }
  }

  test("a within-window re-arrival IS flagged (state still live)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val hits = NearDupStateStream.nearDupHits(docs,
      numPerms = 16, rowsPerBand = 4,
      watermarkDelay = "1 minute", retentionMs = 3600L * 1000)
    val q = hits.writeStream.format("memory").queryName("neardup_hits2")
      .outputMode("append").start()
    def t(min: Long) = new Timestamp(min * 60000L)
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    try {
      input.addData((10L, text, t(500)))
      q.processAllAvailable()
      // 30 min later — inside the 60-min retention — a near-identical doc
      input.addData((11L, text, t(530)))
      q.processAllAvailable()
      val all = s.table("neardup_hits2").as[NearDupStateStream.NearDupHit].collect()
      assert(all.nonEmpty && all.map(_.doc_id).toSet == Set(11L))
      assert(all.forall(_.keeper_id == 10L))
    } finally {
      q.stop()
      s.sql("DROP TABLE IF EXISTS neardup_hits2")
    }
  }
}
