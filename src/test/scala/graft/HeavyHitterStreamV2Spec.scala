package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{HeavyHitterStream, HeavyHitterStreamV2, QuotaStreamV2}
import graft.streaming.HeavyHitterStream.{HHOut, Obs}

/** The transformWithState twin must behave exactly like the
  * flatMapGroupsWithState original: same fixed-seed sketch, same
  * candidate admission, same cross-restart accumulation — with the state
  * split into two NAMED stores (cms ValueState + candidates ListState).
  */
class HeavyHitterStreamV2Spec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, QuotaStreamV2.RequiredStateStoreProvider)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("V2 hitters match V1 output on the same batch") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("hhV2").toString + "/obs"
    val obs = Seq.fill(10)(Obs("click", 7L)) ++ Seq.fill(4)(Obs("click", 3L)) ++
      (100L to 104L).map(Obs("click", _)) ++ Seq(Obs("view", 9L))
    obs.toDF().coalesce(1).write.parquet(dir)
    val got = withRocksDb {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Obs]].schema)
        .parquet(dir).as[Obs]
      val name = s"hh_v2_${System.nanoTime()}"
      val q = HeavyHitterStreamV2.hitters(spark, stream, k = 3).writeStream
        .format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); q.stop()
      spark.table(name).as[HHOut].collect().toSeq
    }
    val click = got.filter(_.group == "click").sortBy(_.rank)
    assert(click.map(_.item).take(2) == Seq(7L, 3L))
    assert(click.head.est_count === 10L && click(1).est_count === 4L)
    assert(got.filter(_.group == "view") == Seq(HHOut("view", 9L, 1L, 1)))
    // literal parity with the V1 operator on identical input (batch mode)
    val v1 = HeavyHitterStream.hitters(spark,
      spark.read.parquet(dir).as[Obs], k = 3).collect().toSet
    assert(got.toSet == v1, "V2 diverged from V1 on the same input")
  }

  test("V2 named stores survive a checkpointed RESTART: counts accumulate") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("hhV2Cp").toString
    val dir = s"$base/obs"; val cp = s"$base/cp"; val out = s"$base/out"
    def run(): Unit = withRocksDb {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Obs]].schema)
        .parquet(dir).as[Obs]
      val q = HeavyHitterStreamV2.hitters(spark, stream, k = 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); q.stop()
    }
    (Seq.fill(3)(Obs("g", 5L)) ++ Seq(Obs("g", 6L)))
      .toDF().coalesce(1).write.mode("append").parquet(dir)
    run()
    // run 2: item 6's TOTAL (5) must beat item 5's 3 — only possible if
    // BOTH named stores (sketch counts and candidate set) recovered
    Seq.fill(4)(Obs("g", 6L))
      .toDF().coalesce(1).write.mode("append").parquet(dir)
    run()
    val ranks = spark.read.parquet(out).as[HHOut].collect().toSeq
      .filter(_.group == "g")
    val lastTop = ranks.filter(o => o.rank == 1 && o.est_count == 5L)
    assert(lastTop.map(_.item) == Seq(6L),
      s"item 6 must lead with the CROSS-RUN total of 5, got $ranks")
  }
}
