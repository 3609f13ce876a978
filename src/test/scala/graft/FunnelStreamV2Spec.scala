package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{FunnelStream, FunnelStreamV2}
import graft.streaming.FunnelStream.{Event, FunnelOut}

/** The transformWithState twin of FunnelStream.funnel: same strict stage
  * gating and one-emission-per-advance, with each stage's first-touch
  * timestamp in its own named store and the idle expiry as an explicit
  * per-key timer.
  */
class FunnelStreamV2Spec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, FunnelStreamV2.RequiredStateStoreProvider)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def run(dir: String, expectInput: Long, expectRows: Long,
      timeoutMs: Long = 1000L): Seq[FunnelOut] =
    withRocksDb {
      val s = spark
      import s.implicits._
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
        .parquet(dir).as[Event]
      val name = s"funnel_v2_${System.nanoTime()}"
      val q = FunnelStreamV2.funnel(spark, stream, timeoutMs).writeStream
        .format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      drainThenStop(q, expectInput, expectRows,
        () => spark.table(name).count())
      spark.table(name).as[FunnelOut].collect().toSeq
    }

  test("V2 funnel matches V1 semantics on the same batch") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("funnelV2").toString + "/ev"
    val events = Seq(
      Event(1L, 100L, 1L, "view"),
      Event(1L, 50L, 2L, "click"),   // before first view → not stage 2
      Event(1L, 200L, 3L, "view"),   // duplicate stage → ignored
      Event(1L, 300L, 4L, "click"),
      Event(1L, 400L, 5L, "purchase"),
      Event(2L, 100L, 6L, "click"),  // no view → never enters
      Event(2L, 200L, 7L, "purchase"))
    events.toDS().coalesce(1).write.parquet(dir)
    val got = run(dir, expectInput = 7L, expectRows = 3L)
    assert(got.filter(_.user_id == 2L).isEmpty,
      "stage order is strict: no view → no funnel entry")
    val u1 = got.filter(_.user_id == 1L).sortBy(_.stage)
    assert(u1.map(_.stage) == Seq(1, 2, 3), s"one emission per advance: $u1")
    assert(u1.last ==
      FunnelOut(1L, 3, 100L, 300L, 400L, completed = true, closed = true))
    // literal parity with the V1 operator on identical input (batch mode)
    val v1 = FunnelStream.funnel(spark,
      spark.read.parquet(dir).as[Event], timeoutMs = 1000L).collect().toSet
    assert(got.toSet == v1, "V2 diverged from V1 on the same input")
  }

  test("V2 abandoned funnels expire via the per-key timer with completed=false") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("funnelV2To").toString + "/ev"
    Seq(Event(3L, 100L, 1L, "view"), Event(3L, 200L, 2L, "click"))
      .toDS().coalesce(1).write.parquet(dir)
    val got = run(dir, expectInput = 2L, expectRows = 3L) // 2 advances + the timer expiry row
    assert(got.exists(o => o.stage == 2 && o.closed && !o.completed &&
      o.purchase_us == -1L), s"expected an expiry row, got $got")
  }

  test("V2 funnel state survives a checkpointed RESTART: stages chain across runs") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("funnelV2Cp").toString
    val dir = s"$base/ev"; val cp = s"$base/cp"; val out = s"$base/out"
    def outRows(): Long =
      try spark.read.parquet(out).count() catch { case _: Exception => 0L }
    def runCp(expectInput: Long, expectRows: Long): Unit = withRocksDb {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
        .parquet(dir).as[Event]
      val q = FunnelStreamV2.funnel(spark, stream, timeoutMs = 3600000L)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      drainThenStop(q, expectInput, expectRows, outRows _)
    }
    Seq(Event(7L, 100L, 1L, "view"))
      .toDS().coalesce(1).write.mode("append").parquet(dir)
    runCp(expectInput = 1L, expectRows = 1L)
    // run 2 (fresh query, same checkpoint): click+purchase must gate on
    // the view recovered FROM the named "view" store, not reprocessed input
    Seq(Event(7L, 200L, 2L, "click"), Event(7L, 300L, 3L, "purchase"))
      .toDS().coalesce(1).write.mode("append").parquet(dir)
    runCp(expectInput = 2L, expectRows = 3L)
    val got = spark.read.parquet(out).as[FunnelOut].collect().toSeq
      .filter(_.user_id == 7L)
    assert(got.map(_.stage).sorted == Seq(1, 2, 3),
      s"stages must chain across the restart, got $got")
    assert(got.exists(o => o.stage == 3 && o.completed && o.view_us == 100L),
      "the completed row must carry the pre-restart view timestamp from state")
  }
}
