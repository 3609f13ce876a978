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

  test("a MIXED-flavor delete history consolidates to ONE position file " +
      "(equality rows resolved to ordinals): view unchanged, ZERO data " +
      "rewrites, one anti-join leg planned, CDF silent, vacuum reclaims " +
      "the superseded confetti") {
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
    assert(before == 3 && after == 1, s"($before, $after)")
    val live = WeatherLakeV2Sink.committedMorDeleteFiles(lake)
    assert(live.size == 1 && live.forall(TypedLake.isPosDelete),
      s"post-compact flavor must be position-only, got $live")
    // data identity preserved bit-for-bit: same committed file SET
    assert(WeatherLakeV2Sink.committedFiles(lake).toSet == filesBefore)
    // the view is unchanged
    assert(ids(lake) == (0L until 60L).toSet -- Set(1L, 2L, 3L))
    // the mixed history's TWO anti-join legs collapsed back to ONE
    val legs = TypedLake.readCommittedTyped(spark, lake, schema)
      .queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti =>
          j
      }
    assert(legs.size == 1, s"expected ONE anti-join leg, got ${legs.size}")
    // CDF across the compactdel commit is EMPTY (layout-only for the feed)
    val snapAfter = WeatherLakeV2Sink.manifestNames(lake)
    val changes = TypedLake.changesBetweenTyped(spark, lake, schema,
      keyCols = Seq("id"), from = snapBefore, to = snapAfter)
    assert(changes.count() == 0, changes.collect().mkString(", "))
    // a second call is a no-op: one position file is the fixed point
    val (b2, a2) = TypedLake.compactMorDeletes(spark, lake, schema)
    assert(b2 == 1 && a2 == 1, s"($b2, $a2)")
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

  test("RENAME × equality × compact_deletes: pre-rename equality old " +
      "images convert to ordinals through the name mapping — the " +
      "renamed column's values resolve (not null-fill), so nothing " +
      "resurrects and no unrelated row dies") {
    val w = Files.createTempDirectory("cdelren").toString
    spark.conf.set("spark.sql.catalog.cdren", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.cdren.warehouse", w)
    spark.sql("""CREATE TABLE cdren.t (id BIGINT, score BIGINT,
      region STRING) USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('dmlMode' = 'mor', 'morDeletes' = 'equality')""")
    spark.sql("""INSERT INTO cdren.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(20)""")
    // pre-rename equality delete files: old images carry the OLD name
    spark.sql("DELETE FROM cdren.t WHERE id = 3")
    spark.sql("DELETE FROM cdren.t WHERE id = 4")
    spark.sql("ALTER TABLE cdren.t RENAME COLUMN score TO quality")
    assert(spark.table("cdren.t").count() == 18)
    // conversion MUST read the old images through the widened mapping: a
    // current-names-only read would null-fill `quality`, and the
    // converted set would miss these rows (resurrection) — or, matched
    // null-safely, kill unrelated null rows
    val r = spark.sql("CALL cdren.system.compact_deletes('t')").head
    assert(r.getInt(0) == 2 && r.getInt(1) == 1, r)
    val live = WeatherLakeV2Sink.committedMorDeleteFiles(s"$w/t")
    assert(live.size == 1 && live.forall(TypedLake.isPosDelete), live)
    assert(spark.table("cdren.t").count() == 18,
      "conversion changed the view")
    assert(spark.sql("SELECT count(*) FROM cdren.t WHERE id IN (3, 4)")
      .head.getLong(0) == 0, "pre-rename deletions resurrected")
    assert(spark.sql("SELECT CAST(sum(quality) AS BIGINT) FROM cdren.t")
      .head.getLong(0) == (0L until 20L).map(_ * 10).sum - 70L)
    spark.sql("DROP TABLE cdren.t")
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
