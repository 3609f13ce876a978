package graft

import java.nio.file.Files
import java.util.ConcurrentModificationException
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.sources.WeatherLakeV2Sink

/** Multi-writer torture of the optimistic-concurrency protocol: N writer
  * threads run appends/merges/deletes over OVERLAPPING partitions (every
  * thread also writes the shared partition, so publish-time read-domain
  * conflicts genuinely fire) while a maintenance thread races
  * checkpoints and compactions. The contract under test:
  *
  *  - losers are always LOUD (`ConcurrentModificationException` and
  *    nothing else) and retry-able on a fresh snapshot;
  *  - no lost updates: each thread owns a disjoint KEY space, so the
  *    expected final value of every key is the fold of that thread's own
  *    successful-op log — any cross-thread interference (a merge
  *    publishing over a state it never saw) would corrupt it;
  *  - the core format invariant holds throughout: every committed data
  *    file is listed by EXACTLY ONE live manifest, and every listed file
  *    exists.
  */
class ConcurrentWritersSpec extends SparkSpec {
  private val Writers = 4
  private val OpsPerWriter = 12
  private val MaxAttempts = 200

  private def retry[T](f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case _: ConcurrentModificationException =>
          attempt += 1
          assert(attempt < MaxAttempts, "conflict retry budget exhausted")
          Thread.sleep(5 + Random.nextInt(20))
      }
    }
    sys.error("unreachable")
  }

  private def payload(k: Long, v: Long, t: Int): String =
    s"""{"k":$k,"v":$v,"t":$t}"""

  test("randomized interleaving of appends/merges/deletes across " +
      "overlapping partitions with racing maintenance: losers loud, " +
      "no lost updates, every file listed by exactly one live manifest") {
    val lake = Files.createTempDirectory("lakeconcur").toString
    val s = spark
    import s.implicits._

    def frame(rows: Seq[(String, Long, Long, Int)]) =
      rows.map { case (city, k, v, t) =>
        (city, "2024-01-01", "00", payload(k, v, t))
      }.toDF("city", "ds", "hour", "raw_json")

    // seed: every thread's key space has a base row in BOTH its own
    // partition and the shared one
    val seed = (0 until Writers).flatMap { t =>
      Seq((s"own$t", t * 1000L, 0L, t), ("shared", t * 1000L + 500, 0L, t))
    }
    frame(seed).write.format("graft.sources.WeatherLakeV2Sink")
      .option("manifestId", "base").mode("append").save(lake)

    val key = (df: org.apache.spark.sql.DataFrame) =>
      get_json_object(df("raw_json"), "$.k")

    // per-thread log of SUCCESSFUL ops, folded into the expected state
    // afterwards (key spaces are disjoint across threads)
    final case class OpLog(
      ops: mutable.ArrayBuffer[(String, Long, Long)] = // (op, key, value)
        mutable.ArrayBuffer.empty)
    val logs = Array.fill(Writers)(OpLog())
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(Writers + 1)

    (0 until Writers).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try {
            val rnd = new Random(42 + t)
            var op = 0
            while (op < OpsPerWriter) {
              val k = t * 1000L + rnd.nextInt(3) * 7 +
                (if (rnd.nextBoolean()) 500 else 0)
              val city = if (k % 1000 >= 500) "shared" else s"own$t"
              rnd.nextInt(10) match {
                case d if d < 2 => // append a brand-new key (never conflicts)
                  val nk = t * 1000L + 100 + op
                  frame(Seq((s"own$t", nk, op.toLong, t)))
                    .write.format("graft.sources.WeatherLakeV2Sink")
                    .option("manifestId", s"app-$t-$op")
                    .mode("append").save(lake)
                  logs(t).ops += (("merge", nk, op.toLong))
                case d if d < 8 => // keyed merge (upsert) — may conflict
                  retry {
                    WeatherLakeV2Sink.mergeCommitted(s, lake,
                      frame(Seq((city, k, op.toLong, t))), key)
                  }
                  logs(t).ops += (("merge", k, op.toLong))
                case _ => // delete the key — may conflict
                  retry {
                    WeatherLakeV2Sink.deleteCommitted(s, lake,
                      predicate = df =>
                        get_json_object(df("raw_json"), "$.k") === k.toString &&
                        get_json_object(df("raw_json"), "$.t") === t.toString)
                  }
                  logs(t).ops += (("delete", k, 0L))
              }
              op += 1
            }
          } catch { case e: Throwable => failures.add(e) }
        }
      })
    }
    // the maintenance antagonist: checkpoints and compactions racing the
    // writers — they may lose loudly too, never corrupt
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        try {
          (0 until 8).foreach { i =>
            Thread.sleep(40)
            try {
              if (i % 2 == 0) WeatherLakeV2Sink.checkpointManifests(lake)
              else WeatherLakeV2Sink.compact(s, lake, targetBytes = 1L << 20)
            } catch { case _: ConcurrentModificationException => () }
          }
        } catch { case e: Throwable => failures.add(e) }
      }
    })

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS), "torture timed out")
    if (!failures.isEmpty) {
      val e = failures.peek()
      e.printStackTrace()
      fail(s"unexpected worker failure: $e")
    }

    // ---- invariant: every committed file listed by EXACTLY ONE live
    // manifest, and every listed file exists
    val lines = WeatherLakeV2Sink.committedEntryLines(lake)
    val paths = lines.map(l => l.split('\t').head)
    assert(paths.distinct.size == paths.size,
      "a data file is listed by more than one live manifest")
    paths.foreach(p => assert(new java.io.File(p).isFile, s"missing $p"))

    // ---- no lost updates: fold each thread's own successful-op log
    val expected = mutable.Map.empty[Long, Long]
    (0 until Writers).foreach { t =>
      // seed rows
      expected(t * 1000L) = 0L
      expected(t * 1000L + 500) = 0L
      logs(t).ops.foreach {
        case ("merge", k, v) => expected(k) = v
        case ("delete", k, _) => expected.remove(k)
        case other => sys.error(s"unexpected log entry $other")
      }
    }
    def state(): Map[Long, Long] =
      WeatherLakeV2Sink.readCommitted(s, lake)
        .select(
          get_json_object(col("value"), "$.k").cast("long").as("k"),
          get_json_object(col("value"), "$.v").cast("long").as("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state() == expected.toMap,
      "final state diverged from the per-thread op logs (lost update)")

    // ---- the history is still maintainable afterwards
    WeatherLakeV2Sink.checkpointManifests(lake)
    WeatherLakeV2Sink.vacuum(lake, minAgeMs = 0L, force = true)
    assert(state() == expected.toMap)
  }
}
