package graft

import java.nio.file.Files
import java.util.ConcurrentModificationException
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** Multi-writer torture of the TYPED lake with MERGE-ON-READ in the mix:
  * N writer threads run typed appends, copy-on-write merges, MOR merges
  * and MOR deletes over OVERLAPPING partitions while a maintenance thread
  * races checkpoints, compactions and reconciles. On top of the classic
  * torture's contract (loud losers only, no lost updates, every file
  * listed by exactly one live manifest) this exercises the file-identity
  * conflict rules end-to-end: a compaction/reconcile that would strand a
  * racing mor publish's delete-row targets — or the reverse — must lose
  * LOUDLY, never silently resurrect a deletion.
  */
class TypedConcurrentWritersSpec extends SparkSpec {
  private val Writers = 4
  private val OpsPerWriter = 8
  private val MaxAttempts = 300

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType),
    StructField("city", StringType)))
  private val pc = Seq("city")

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

  test("typed torture: appends + CoW merges + MOR merges/deletes across " +
      "overlapping partitions with racing checkpoint/compact/reconcile — " +
      "loud losers only, no lost updates, no resurrected deletions") {
    val lake = Files.createTempDirectory("typedconcur").toString + "/lake"
    val s = spark
    import s.implicits._

    def cityOf(k: Long, t: Int): String =
      if (k % 1000 >= 500) "shared" else s"own$t"
    def frame(rows: Seq[(Long, Long, Int)]): DataFrame =
      rows.map { case (k, v, t) => (k, v, cityOf(k, t)) }
        .toDF("k", "v", "city")

    val seed = (0 until Writers).flatMap { t =>
      Seq((t * 1000L, 0L, t), (t * 1000L + 500, 0L, t))
    }
    TypedLake.appendTyped(spark, lake, frame(seed), schema, pc,
      statsFields = Seq("k"), manifestId = Some("base"))

    final case class OpLog(
      ops: mutable.ArrayBuffer[(String, Long, Long)] =
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
            val rnd = new Random(137 + t)
            var op = 0
            while (op < OpsPerWriter) {
              val k = t * 1000L + rnd.nextInt(3) * 7 +
                (if (rnd.nextBoolean()) 500 else 0)
              rnd.nextInt(10) match {
                case d if d < 2 => // append a brand-new key
                  val nk = t * 1000L + 100 + op
                  TypedLake.appendTyped(spark, lake,
                    frame(Seq((nk, op.toLong, t))), schema, pc,
                    statsFields = Seq("k"), manifestId = Some(s"app-$t-$op"))
                  logs(t).ops += (("merge", nk, op.toLong))
                case d if d < 5 => // copy-on-write merge upsert
                  retry {
                    TypedLake.mergeTyped(s, lake, schema, pc,
                      frame(Seq((k, op.toLong, t))),
                      keyCols = Seq("k", "city"))
                  }
                  logs(t).ops += (("merge", k, op.toLong))
                case d if d < 8 => // MERGE-ON-READ merge upsert
                  retry {
                    TypedLake.mergeTypedMor(s, lake, schema, pc,
                      frame(Seq((k, op.toLong, t))),
                      keyCols = Seq("k", "city"))
                  }
                  logs(t).ops += (("merge", k, op.toLong))
                case _ => // MERGE-ON-READ delete of the key
                  retry {
                    TypedLake.deleteTypedMor(s, lake, schema, pc,
                      predicate = df => df("k") === k)
                  }
                  logs(t).ops += (("delete", k, 0L))
              }
              op += 1
            }
          } catch { case e: Throwable => failures.add(e) }
        }
      })
    }
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        try {
          (0 until 6).foreach { i =>
            Thread.sleep(60)
            try {
              i % 3 match {
                case 0 => WeatherLakeV2Sink.checkpointManifests(lake)
                case 1 => TypedLake.compactTyped(s, lake, schema, pc,
                  targetBytes = 1L << 20)
                case _ => TypedLake.reconcileMor(s, lake, schema, pc)
              }
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

    // every committed data file listed by exactly one live manifest, and
    // every listed file (delete files included) exists
    val paths = WeatherLakeV2Sink.committedFiles(lake)
    assert(paths.distinct.size == paths.size,
      "a data file is listed by more than one live manifest")
    (paths ++ WeatherLakeV2Sink.committedMorDeleteFiles(lake))
      .foreach(p => assert(new java.io.File(p).isFile, s"missing $p"))

    // no lost updates / no resurrected deletions: fold each thread's log
    val expected = mutable.Map.empty[Long, Long]
    (0 until Writers).foreach { t =>
      expected(t * 1000L) = 0L
      expected(t * 1000L + 500) = 0L
      logs(t).ops.foreach {
        case ("merge", k, v) => expected(k) = v
        case ("delete", k, _) => expected.remove(k)
        case other => sys.error(s"unexpected log entry $other")
      }
    }
    def state(): Map[Long, Long] =
      TypedLake.readCommittedTyped(s, lake, schema)
        .select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state() == expected.toMap,
      "final state diverged from the per-thread op logs")

    // still maintainable: reconcile + checkpoint + vacuum, state holds,
    // no live directives remain
    TypedLake.reconcileMor(s, lake, schema, pc)
    WeatherLakeV2Sink.checkpointManifests(lake)
    WeatherLakeV2Sink.vacuum(lake, minAgeMs = 0L, force = true)
    assert(state() == expected.toMap)
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).isEmpty)
  }
}
