package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** The typed change feed (snapshot-diff CDF — no written change files)
  * and the medallion it enables: a typed bronze table's net row deltas
  * drain into a typed silver via the cursor feed + typed MERGE, across
  * restarts and a mid-stream vacuum.
  */
class TypedLakeCdcSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("region", StringType, nullable = false)))
  private val pc = Seq("region")

  private def mk(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (k, v) => (k, v, s"r${k % 2}") }.toDF("k", "v", "region")
  }

  private def changes(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("changesBetweenTyped classifies inserts/deletes/updates from the " +
      "file diff; survivor rewrites emit nothing; several commits " +
      "collapse to their net effect") {
    val lake = Files.createTempDirectory("typedcdf").toString
    TypedLake.appendTyped(spark, lake, mk(1L -> 10L, 2L -> 20L, 3L -> 30L),
      schema, pc, manifestId = Some("base"))
    val v0 = WeatherLakeV2Sink.snapshot(lake)
    // update k=1, delete k=2, insert k=9 — via typed merge ops
    TypedLake.mergeTyped(spark, lake, schema, pc,
      mk(1L -> 100L, 9L -> 90L), keyCols = Seq("k", "region"))
    TypedLake.deleteTyped(spark, lake, schema, pc,
      predicate = df => df("k") === 2L)
    val v1 = WeatherLakeV2Sink.snapshot(lake)
    val got = changes(TypedLake.changesBetweenTyped(spark, lake, schema,
      Seq("k", "region"), from = v0, to = v1))
    assert(got == Set(
      ("update_preimage", 1L, 10L), ("update_postimage", 1L, 100L),
      ("delete", 2L, 20L), ("insert", 9L, 90L)), got)
    // k=3 was a survivor rewrite (merge touched its file) — no change
    // row for it; a compaction nets to zero changes too
    TypedLake.compactTyped(spark, lake, schema, pc, targetBytes = 1L << 20)
    val v2 = WeatherLakeV2Sink.snapshot(lake)
    assert(TypedLake.changesBetweenTyped(spark, lake, schema,
      Seq("k", "region"), from = v1, to = v2).count() == 0)
  }

  test("typed medallion: bronze net deltas drain into silver via the " +
      "cursor feed + typed MERGE across restarts; a caught-up consumer " +
      "survives checkpoint + vacuum with zero replay") {
    val bronze = Files.createTempDirectory("typedbronze").toString
    val silver = Files.createTempDirectory("typedsilver").toString
    val cursor = s"${Files.createTempDirectory("typedcur")}/cursor"
    TypedLake.appendTyped(spark, silver, mk(), schema, pc,
      manifestId = Some("init")) // empty silver with a committed schema
    def drain(): Long = {
      val (delta, newSet) = TypedLake.readNewChangesTyped(spark, bronze,
        schema, Seq("k", "region"), cursor)
      val n = delta.count()
      if (n > 0) {
        // apply the net delta as ONE typed CDC merge: deletes marked by
        // the _change column, pre-images dropped (post-image wins)
        val batch = delta.filter(col("_change") =!= "update_preimage")
          .withColumn("__op",
            when(col("_change") === "delete", lit("d")).otherwise(lit("u")))
          .drop("_change")
        TypedLake.mergeTyped(spark, silver, schema, pc, batch,
          keyCols = Seq("k", "region"),
          actions = TypedLake.TypedMergeActions(
            matchedDelete = Some(df => df(TypedLake.srcCol("__op")) === "d"),
            matchedUpdate = Some(None),
            insert = Some(None),
            insertCond = Some(df => df(TypedLake.srcCol("__op")) =!= "d")))
      }
      WeatherLakeV2Sink.replaceCursor(cursor, newSet)
      n
    }
    def silverState: Map[Long, Long] =
      TypedLake.readCommittedTyped(spark, silver, schema)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    TypedLake.appendTyped(spark, bronze, mk(1L -> 10L, 2L -> 20L), schema, pc)
    assert(drain() == 2)
    assert(silverState == Map(1L -> 10L, 2L -> 20L))
    // more bronze commits: update + delete + insert, drained in one pass
    TypedLake.mergeTyped(spark, bronze, schema, pc, mk(1L -> 11L, 5L -> 50L),
      keyCols = Seq("k", "region"))
    TypedLake.deleteTyped(spark, bronze, schema, pc,
      predicate = df => df("k") === 2L)
    assert(drain() > 0)
    assert(silverState == Map(1L -> 11L, 5L -> 50L))
    // restart (new process = same durable cursor): nothing re-applies
    assert(drain() == 0)
    // mid-stream maintenance on bronze: the caught-up feed survives a
    // checkpoint + forced vacuum with zero replay
    WeatherLakeV2Sink.checkpointManifests(bronze)
    WeatherLakeV2Sink.vacuum(bronze, minAgeMs = 0L, force = true)
    assert(drain() == 0)
    assert(silverState == Map(1L -> 11L, 5L -> 50L))
    // and the feed keeps working after the vacuum
    TypedLake.appendTyped(spark, bronze, mk(7L -> 70L), schema, pc)
    assert(drain() == 1)
    assert(silverState == Map(1L -> 11L, 5L -> 50L, 7L -> 70L))
  }
}
