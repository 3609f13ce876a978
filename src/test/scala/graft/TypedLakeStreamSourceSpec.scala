package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** `readStream.table` over a TYPED lake table — the classic manifest-set
  * stream's contract (offsets = consumed manifest names, admission
  * control, AvailableNow, exactly-once across caught-up maintenance) on
  * the Parquet payload, with typed rows out (no JSON lines).
  */
class TypedLakeStreamSourceSpec extends SparkSpec {
  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("typedstreamwh").toString
    spark.conf.set("spark.sql.catalog.tslake", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.tslake.warehouse", w)
    w
  }

  private def checkpoint(): String =
    Files.createTempDirectory("typedstreamck").toString

  test("readStream.table over a typed table: typed rows per committed " +
      "manifest, AvailableNow drains to the start snapshot, a restart " +
      "resumes from the checkpoint, and later commits arrive next run") {
    warehouse
    spark.sql("""CREATE TABLE tslake.s1 (id BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO tslake.s1
      SELECT id, id * 2, concat('r', id % 2) FROM range(10)""")
    spark.sql("""INSERT INTO tslake.s1
      SELECT id + 10, (id + 10) * 2, concat('r', id % 2) FROM range(5)""")
    val ck = checkpoint()
    def runOnce(): Unit = {
      val q = spark.readStream.table("tslake.s1")
        .groupBy().agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"))
        .writeStream.format("memory").queryName("ts1")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }
    runOnce()
    val r1 = spark.table("ts1").collect().head
    assert(r1.getLong(0) == 15, r1)
    assert(r1.getLong(1) == (0L until 15L).map(_ * 2).sum, r1)
    // a third commit lands; the restarted query reads ONLY the delta
    // (checkpointed offset = the two consumed manifests)
    spark.sql("INSERT INTO tslake.s1 VALUES (100, 200, 'r0')")
    runOnce()
    val r2 = spark.table("ts1").collect().head
    assert(r2.getLong(0) == 16, r2)
    assert(r2.getLong(1) == (0L until 15L).map(_ * 2).sum + 200, r2)
  }

  test("maxManifestsPerTrigger paces the drain one manifest per batch; " +
      "startingAt latest skips history; projection reaches the typed rows") {
    warehouse
    spark.sql("""CREATE TABLE tslake.s2 (id BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)""")
    (0 until 3).foreach(k => spark.sql(
      s"""INSERT INTO tslake.s2
        SELECT id + ${k * 10}, id + ${k * 10}, 'r0' FROM range(10)"""))
    val q = spark.readStream
      .option("maxManifestsPerTrigger", "1")
      .table("tslake.s2")
      .select("id") // pruned projection over typed columns
      .writeStream.format("memory").queryName("ts2")
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(!q.isActive)
    // one manifest per micro-batch: 3 batches committed
    assert(q.recentProgress.count(_.numInputRows > 0) == 3,
      q.recentProgress.map(_.numInputRows).mkString(","))
    assert(spark.table("ts2").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 30L))
    // startingAt latest: everything already committed is skipped
    val q2 = spark.readStream
      .option("startingAt", "latest")
      .table("tslake.s2")
      .writeStream.format("memory").queryName("ts2b")
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.table("ts2b").count() == 0)
  }

  test("merge-on-read interplay is LOUD: live delete files refuse at " +
      "stream start, and a mordelete commit mid-history fails its batch " +
      "instead of silently delivering deleted rows") {
    warehouse
    spark.sql("""CREATE TABLE tslake.s3 (id BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("""INSERT INTO tslake.s3
      SELECT id, id, concat('r', id % 2) FROM range(10)""")
    spark.sql("DELETE FROM tslake.s3 WHERE id = 3")
    // start refused while delete files are live
    val e = intercept[Exception] {
      val q = spark.readStream.table("tslake.s3")
        .writeStream.format("memory").queryName("ts3")
        .option("checkpointLocation", checkpoint())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      q.exception.foreach(throw _)
    }
    assert(e.getMessage.contains("merge-on-read delete file"), e.getMessage)
    // reconcile, then the stream runs — each surviving row exactly once
    spark.sql("CALL tslake.system.reconcile('s3')")
    val q2 = spark.readStream.table("tslake.s3")
      .writeStream.format("memory").queryName("ts3b")
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.table("ts3b").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 10L).filterNot(_ == 3))
  }

  test("typed medallion on readStream: bronze appends drain through the " +
      "stream into a MOR-merged silver across restarts — upserts without " +
      "a single silver data-file rewrite, reconciled at the end") {
    warehouse
    spark.sql("""CREATE TABLE tslake.mb (k BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)""")
    spark.sql("""CREATE TABLE tslake.ms (k BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    val ck = checkpoint()
    def drain(): Unit = {
      val q = spark.readStream
        .option("maxManifestsPerTrigger", "1") // one commit per batch →
        // each batch is key-unique (a single upsert payload)
        .table("tslake.mb")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            batch.createOrReplaceTempView("mb_batch")
            batch.sparkSession.sql(
              """MERGE INTO tslake.ms t USING mb_batch s
                ON t.k = s.k AND t.region = s.region
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""")
            ()
          }
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    def silverState: Map[Long, Long] = spark.table("tslake.ms")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val silverPath = s"$warehouse/ms"

    spark.sql("INSERT INTO tslake.mb VALUES (1, 10, 'r1'), (2, 20, 'r0')")
    drain()
    assert(silverState == Map(1L -> 10L, 2L -> 20L))
    val silverFiles = WeatherLakeV2Sink.committedFiles(silverPath).toSet
    // restart with the same checkpoint: only the new commit drains, and
    // the silver upsert is merge-on-read — every pre-existing silver
    // data file is STILL committed untouched
    spark.sql("INSERT INTO tslake.mb VALUES (1, 11, 'r1'), (3, 30, 'r1')")
    drain()
    assert(silverState == Map(1L -> 11L, 2L -> 20L, 3L -> 30L))
    assert(WeatherLakeV2Sink.committedFiles(silverPath).toSet
      .intersect(silverFiles) == silverFiles,
      "mor-merged silver must never rewrite committed files")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(silverPath).nonEmpty)
    // reconcile the silver: same state, clean copy-on-write table again
    spark.sql("CALL tslake.system.reconcile('ms')")
    assert(silverState == Map(1L -> 11L, 2L -> 20L, 3L -> 30L))
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(silverPath).isEmpty)
  }

  test("a caught-up stream sees NOTHING from a checkpoint/compaction " +
      "(layout-only exactly-once), and a fresh stream over the compacted " +
      "table reads each row once — the classic source's contract on the " +
      "typed payload") {
    warehouse
    spark.sql("""CREATE TABLE tslake.s4 (id BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)""")
    (0 until 2).foreach(k => spark.sql(
      s"""INSERT INTO tslake.s4
        SELECT id + ${k * 10}, id, 'r0' FROM range(10)"""))
    val ck = checkpoint()
    def drain(cp: String): Seq[Long] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.table("tslake.s4")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= batch.select("id").collect().map(_.getLong(0))
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      got.toSeq.sorted
    }
    assert(drain(ck) == (0L until 20L))
    // checkpoint the manifests: a caught-up stream receives nothing new
    assert(WeatherLakeV2Sink.checkpointManifests(s"$warehouse/s4") > 0)
    assert(drain(ck).isEmpty, "layout-only re-list replayed to a " +
      "caught-up stream")
    // a FRESH stream over the checkpointed table reads each row once
    assert(drain(checkpoint()) == (0L until 20L))
  }
}
