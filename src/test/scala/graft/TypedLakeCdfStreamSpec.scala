package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** Streaming CHANGE FEED over a typed mor table
  * (`readStream.format("graft.sources.TypedLakeChangeFeed")`): the face
  * that lets a CDC-rate merge-on-read table feed a streaming consumer
  * WITHOUT constant reconciles — genesis = current resolved state as
  * inserts, each batch = exact net deltas (both sides mor-resolved),
  * admission-bounded, restart-exact, loud at the vacuum horizon.
  */
class TypedLakeCdfStreamSpec extends SparkSpec {
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/lake"

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("region", StringType)))
  private val pc = Seq("region")

  private def seed(lake: String, n: Int = 20): Unit = {
    val s = spark
    import s.implicits._
    TypedLake.appendTyped(spark, lake,
      (0 until n).map(i => (i.toLong, s"n-$i", s"r${i % 2}"))
        .toDF("id", "name", "region"),
      schema, pc, statsFields = Seq("id"), manifestId = Some("base"))
  }

  private def feed(lake: String, extra: (String, String)*) = {
    val r = spark.readStream
      .format("graft.sources.TypedLakeChangeFeed")
      .schema(schema)
      .option("path", lake)
      .option("keyCols", "id")
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("genesis is the MOR-RESOLVED current state as inserts (live " +
      "position deletes subtracted, NO reconcile), and later commits " +
      "stream their exact net deltas") {
    val lake = tmp("cdfbasic")
    seed(lake)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") < 3L) // live position deletes
    val q = feed(lake).writeStream.format("memory")
      .queryName("cdf_basic").outputMode("append").start()
    try {
      q.processAllAvailable()
      val genesis = spark.table("cdf_basic").collect()
      assert(genesis.forall(_.getString(0) == "insert"))
      assert(genesis.map(_.getLong(1)).toSet == (3L until 20L).toSet)

      // three more commits — update, delete, insert — net deltas stream
      TypedLake.updateTypedMor(spark, lake, schema, pc,
        predicate = df => df("id") === 5L,
        assignments = Seq("name" -> (_ => lit("upd"))))
      TypedLake.deleteTypedMor(spark, lake, schema, pc,
        predicate = df => df("id") === 7L)
      val s = spark
      import s.implicits._
      TypedLake.appendTyped(spark, lake,
        Seq((100L, "n-100", "r0")).toDF("id", "name", "region"), schema, pc)
      q.processAllAvailable()
      val delta = spark.table("cdf_basic").collect().drop(genesis.length)
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(delta == Set(
        ("update_preimage", 5L, "n-5"), ("update_postimage", 5L, "upd"),
        ("delete", 7L, "n-7"), ("insert", 100L, "n-100")), delta)
    } finally q.stop()
  }

  test("maxManifestsPerTrigger paces admission: the same net state " +
      "arrives over MORE batches, never duplicated") {
    val lake = tmp("cdfpace")
    seed(lake, n = 6)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 0L)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 1L)
    val batches = mutable.ArrayBuffer.empty[(Long, Seq[Row])]
    val q = feed(lake, "maxManifestsPerTrigger" -> "1").writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
        batches.synchronized { batches += id -> df.collect().toSeq }; ()
      }.start()
    try {
      q.processAllAvailable()
      val all = batches.synchronized {
        batches.flatMap(_._2)
          .map(r => (r.getString(0), r.getLong(1))).toList
      }
      // one manifest per batch: base alone is an empty diff? no — the
      // FIRST admitted manifest already diffs against genesis-empty, so
      // every batch nets what its admitted prefix adds
      assert(batches.synchronized(batches.size) >= 3,
        s"expected >=3 paced batches, got ${batches.size}")
      // no duplicates, exact final multiset: inserts 0..5 minus the two
      // deletes' nets — depending on pacing the deletes arrive either as
      // insert-then-delete pairs or never-inserted; the APPLIED state is
      // what must match
      val state = mutable.Map.empty[Long, String]
      batches.synchronized(batches.sortBy(_._1)).foreach { case (_, rows) =>
        rows.foreach { r =>
          (r.getString(0), r.getLong(1)) match {
            case ("insert", id) => state(id) = r.getString(2)
            case ("update_postimage", id) => state(id) = r.getString(2)
            case ("update_preimage", _) => ()
            case ("delete", id) => state.remove(id)
            case other => fail(s"unexpected change $other")
          }
        }
      }
      assert(state.keySet == (2L until 6L).toSet, state)
    } finally q.stop()
  }

  test("the MEDALLION runs on a mor silver WITHOUT reconcile: gold " +
      "applies the streamed net deltas across a RESTART and matches the " +
      "silver's resolved state; replays nothing already committed") {
    val lake = tmp("cdfmedallion")
    seed(lake, n = 10)
    val ckpt = Files.createTempDirectory("cdfckpt").toString
    // gold: a keyed copy maintained purely from the change feed
    val gold = mutable.Map.empty[Long, String]
    val applied = mutable.ArrayBuffer.empty[(String, Long)]
    def run(): Unit = {
      val q = feed(lake).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
          df.collect().foreach { r =>
            gold.synchronized {
              applied += ((r.getString(0), r.getLong(1)))
              r.getString(0) match {
                case "insert" | "update_postimage" =>
                  gold(r.getLong(1)) = r.getString(2)
                case "update_preimage" => ()
                case "delete" => gold.remove(r.getLong(1))
              }
            }
          }; ()
        }.start()
      q.processAllAvailable()
      q.stop()
    }
    // round 1: CDC delete + update on the mor silver, then drain
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") % 3 === 0L)
    run()
    val expect1 = (0L until 10L).filterNot(_ % 3 == 0)
      .map(i => i -> s"n-$i").toMap
    assert(gold.synchronized(gold.toMap) == expect1, gold)
    val appliedAfter1 = gold.synchronized(applied.size)

    // round 2: more mor CDC while the stream is DOWN, then restart —
    // only the net delta arrives, nothing replays
    TypedLake.updateTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 4L,
      assignments = Seq("name" -> (_ => lit("gold-4"))))
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 8L)
    run()
    val expect2 = expect1 - 8L + (4L -> "gold-4")
    assert(gold.synchronized(gold.toMap) == expect2, gold)
    val newApplied = gold.synchronized(applied.drop(appliedAfter1).toList)
    assert(newApplied.toSet == Set(("update_preimage", 4L),
      ("update_postimage", 4L), ("delete", 8L)), newApplied)
    // the silver still carries live delete files — no reconcile ran
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).nonEmpty)
  }

  test("option(\"table\") resolves path AND schema through the catalog " +
      "— the only safe form for RENAMED tables: old-generation files " +
      "stream under the new column name with VALUES, never nulls") {
    val w = Files.createTempDirectory("cdftable").toString
    spark.conf.set("spark.sql.catalog.cdft", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.cdft.warehouse", w)
    spark.sql("""CREATE TABLE cdft.t (id BIGINT, score BIGINT,
      region STRING) USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("""INSERT INTO cdft.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(6)""")
    spark.sql("ALTER TABLE cdft.t RENAME COLUMN score TO quality")
    spark.sql("DELETE FROM cdft.t WHERE id = 2") // live position deletes
    val q = spark.readStream
      .format("graft.sources.TypedLakeChangeFeed")
      .option("table", "cdft.t")
      .option("keyCols", "id")
      .load()
      .writeStream.format("memory").queryName("cdf_table")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdf_table").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // pre-rename files answer under `quality` with their VALUES
      assert(rows == (0L until 6L).filter(_ != 2L)
        .map(i => ("insert", i, i * 10)).toSet, rows)
    } finally q.stop()
    spark.sql("DROP TABLE cdft.t")
  }

  test("startingAt=latest skips the genesis state (deltas only), the " +
      "frontier persists in the stream's metadata path across restarts, " +
      "and Trigger.AvailableNow drains and terminates") {
    val lake = tmp("cdflatest")
    seed(lake, n = 30) // pre-existing history the consumer must SKIP
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 1L)
    val ckpt = Files.createTempDirectory("cdflatestck").toString
    val got = mutable.ArrayBuffer.empty[(String, Long)]
    def run(): Unit = {
      val q = feed(lake, "startingAt" -> "latest").writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
          got.synchronized {
            got ++= df.collect().map(r => (r.getString(0), r.getLong(1)))
          }; ()
        }.start()
      // AvailableNow must terminate on its own
      assert(q.awaitTermination(60000), "AvailableNow did not terminate")
    }
    run()
    assert(got.synchronized(got.isEmpty),
      s"latest start must emit NO genesis rows, got $got")
    // new commits stream as deltas across the restart
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 5L)
    val s2 = spark
    import s2.implicits._
    TypedLake.appendTyped(spark, lake,
      Seq((200L, "n-200", "r0")).toDF("id", "name", "region"), schema, pc)
    run()
    assert(got.synchronized(got.toSet) ==
      Set(("delete", 5L), ("insert", 200L)), got)
  }

  test("vacuum past the consumer's frontier fails the restart LOUDLY " +
      "(never a silent skip), while a caught-up consumer survives " +
      "routine checkpoint + vacuum") {
    val lake = tmp("cdfvacuum")
    seed(lake, n = 8)
    val ckpt = Files.createTempDirectory("cdfvac").toString
    def drain(): Unit = {
      val q = feed(lake).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
          df.collect(); ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    drain() // consumed: base
    // caught-up survives ROUTINE maintenance: checkpoint collapses the
    // live set, vacuum reclaims — the superseding manifest is inside the
    // consumer's next admitted set, so resolution stays whole
    WeatherLakeV2Sink.checkpointManifests(lake)
    WeatherLakeV2Sink.vacuum(lake, minAgeMs = 1L, force = true)
    drain() // must not throw, and nets nothing (layout-only)
    // now make consumed history UNRECOVERABLE: a mor delete + reconcile
    // supersede what the consumer has NOT yet folded, then vacuum
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 2L)
    TypedLake.reconcileMor(spark, lake, schema, pc)
    WeatherLakeV2Sink.vacuum(lake, minAgeMs = 1L, force = true)
    // the consumer's FROM set references the vacuumed pre-reconcile
    // manifests — the replay must fail loudly
    val e = intercept[Exception] {
      val q = feed(lake).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
          df.collect(); ()
        }.start()
      try { q.processAllAvailable() } finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("vacuum horizon")),
      messages(e).mkString(" | "))
  }
}
