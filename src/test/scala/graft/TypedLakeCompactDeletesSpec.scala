package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** `CALL lake.system.compact_deletes` — consolidate merge-on-read delete
  * files WITHOUT rewriting data: at CDC rates every commit sheds one
  * small delete file; compact_deletes merges them into one per flavor,
  * drops dangling rows, preserves data-file identity, keeps the view
  * byte-identical (CDF silent), and lets vacuum reclaim the confetti.
  */
class TypedLakeCompactDeletesSpec extends SparkSpec {
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/lake"

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("region", StringType)))
  private val pc = Seq("region")

  private def seed(lake: String, n: Int = 60): Unit = {
    val s = spark
    import s.implicits._
    TypedLake.appendTyped(spark, lake,
      (0 until n).map(i => (i.toLong, s"n-$i", s"r${i % 2}"))
        .toDF("id", "name", "region"),
      schema, pc, statsFields = Seq("id"), manifestId = Some("base"))
  }

  private def ids(lake: String): Set[Long] =
    TypedLake.readCommittedTyped(spark, lake, schema)
      .select("id").collect().map(_.getLong(0)).toSet

  test("many delete files consolidate to ONE per flavor: view unchanged, " +
      "ZERO data rewrites, dangling rows dropped, CDF silent across the " +
      "commit, vacuum reclaims the superseded confetti") {
    val lake = tmp("cdel")
    seed(lake)
    // three mor commits → three delete files (two position, one equality)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 1L)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 2L)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 3L, positionDeletes = false)
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).size == 3)
    val filesBefore = WeatherLakeV2Sink.committedFiles(lake).toSet
    val snapBefore = WeatherLakeV2Sink.manifestNames(lake)

    val (before, after) = TypedLake.compactMorDeletes(spark, lake, schema)
    assert(before == 3 && after == 2, s"($before, $after)") // 1 pos + 1 eq
    val live = WeatherLakeV2Sink.committedMorDeleteFiles(lake)
    assert(live.size == 2)
    assert(live.count(TypedLake.isPosDelete) == 1)
    // data identity preserved bit-for-bit: same committed file SET
    assert(WeatherLakeV2Sink.committedFiles(lake).toSet == filesBefore)
    // the view is unchanged
    assert(ids(lake) == (0L until 60L).toSet -- Set(1L, 2L, 3L))
    // CDF across the compactdel commit is EMPTY (layout-only for the feed)
    val snapAfter = WeatherLakeV2Sink.manifestNames(lake)
    val changes = TypedLake.changesBetweenTyped(spark, lake, schema,
      keyCols = Seq("id"), from = snapBefore, to = snapAfter)
    assert(changes.count() == 0, changes.collect().mkString(", "))
    // a second call consolidates the two per-flavor files into the same
    // shape again — effectively idempotent, always harmless
    val (b2, a2) = TypedLake.compactMorDeletes(spark, lake, schema)
    assert(b2 == 2 && a2 == 2, s"($b2, $a2)")
    assert(ids(lake) == (0L until 60L).toSet -- Set(1L, 2L, 3L))
    // vacuum reclaims the superseded per-commit delete files
    val reclaimed = WeatherLakeV2Sink.vacuum(lake, minAgeMs = 1L,
      force = true)
    assert(reclaimed > 0)
    assert(ids(lake) == (0L until 60L).toSet -- Set(1L, 2L, 3L))
  }

  test("dangling delete rows are DROPPED at consolidation: after a " +
      "compaction rewrote the targets, compact_deletes shrinks to " +
      "nothing and the (applied) deletions do not resurrect") {
    val lake = tmp("cdeldangle")
    seed(lake, n = 30)
    // a second small append per directory makes every directory a
    // small-file compaction candidate
    locally {
      val s = spark
      import s.implicits._
      TypedLake.appendTyped(spark, lake,
        (100 until 130).map(i => (i.toLong, s"n-$i", s"r${i % 2}"))
          .toDF("id", "name", "region"),
        schema, pc, statsFields = Seq("id"), manifestId = Some("more"))
    }
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 7L)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 8L)
    // compaction reads MOR-RESOLVED rows and rewrites the directories —
    // every delete row now dangles (its target left the committed set)
    val compacted = TypedLake.compactTyped(spark, lake, schema, pc,
      targetBytes = 1L << 30)
    assert(compacted == 2, s"compacted $compacted dirs")
    val expect = ((0L until 30L) ++ (100L until 130L)).toSet -- Set(7L, 8L)
    assert(ids(lake) == expect)
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).size == 2)
    val (before, after) = TypedLake.compactMorDeletes(spark, lake, schema)
    assert(before == 2 && after == 0, s"($before, $after)")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).isEmpty)
    assert(ids(lake) == expect)
  }

  test("SQL face: CALL lake.system.compact_deletes returns (before, " +
      "after), DESCRIBE DETAIL's live_delete_files drops, and reads " +
      "stay correct") {
    val w = Files.createTempDirectory("cdelwh").toString
    spark.conf.set("spark.sql.catalog.cdlake", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.cdlake.warehouse", w)
    spark.sql("""CREATE TABLE cdlake.t (id BIGINT, name STRING,
      region STRING) USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('statsFields' = 'id', 'dmlMode' = 'mor')""")
    spark.sql("""INSERT INTO cdlake.t
      SELECT id, concat('n-', id), concat('r', id % 2) FROM range(50)""")
    spark.sql("DELETE FROM cdlake.t WHERE id = 11")
    spark.sql("DELETE FROM cdlake.t WHERE id = 12")
    spark.sql("DELETE FROM cdlake.t WHERE id = 13")
    val detailBefore = spark.sql("CALL cdlake.system.detail('t')").head
    assert(detailBefore.getInt(7) == 3, detailBefore) // live_delete_files
    assert(detailBefore.getInt(8) == 3, detailBefore) // all position
    assert(detailBefore.getInt(9) > 0, detailBefore) // targeted files
    val r = spark.sql("CALL cdlake.system.compact_deletes('t')").head
    assert(r.getInt(0) == 3 && r.getInt(1) == 1, r)
    val detailAfter = spark.sql("CALL cdlake.system.detail('t')").head
    assert(detailAfter.getInt(7) == 1, detailAfter)
    assert(detailAfter.getInt(8) == 1, detailAfter)
    assert(spark.table("cdlake.t").count() == 47)
    assert(spark.sql(
      "SELECT count(*) FROM cdlake.t WHERE id IN (11, 12, 13)")
      .head.getLong(0) == 0)
    // the consolidated table reconciles like any mor table
    spark.sql("CALL cdlake.system.reconcile('t')")
    assert(spark.table("cdlake.t").count() == 47)
    spark.sql("DROP TABLE cdlake.t")
  }
}
