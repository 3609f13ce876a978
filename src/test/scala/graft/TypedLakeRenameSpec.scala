package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** `ALTER TABLE … RENAME COLUMN` via NAME MAPPING — metadata-only, zero
  * file rewrites (the Iceberg name-mapping move, carried as column
  * metadata in the table schema): old files keep the old physical name,
  * every read widens its scan schema with the historical spellings and
  * coalesces them back, and the whole DML/mor surface keeps working
  * across mixed file generations.
  */
class TypedLakeRenameSpec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val w = Files.createTempDirectory(s"ren$tag").toString
    spark.conf.set(s"spark.sql.catalog.ren$tag", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.ren$tag.warehouse", w)
    w
  }

  test("rename is metadata-only: old files stay readable under the new " +
      "name (values, filters, aggregates), new writes land under it, " +
      "and statsFields follows the rename") {
    val w = freshCatalog("a")
    spark.sql("""CREATE TABLE rena.t (id BIGINT, score BIGINT,
      region STRING) USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('statsFields' = 'score')""")
    spark.sql("""INSERT INTO rena.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(10)""")
    val filesBefore = WeatherLakeV2Sink.committedFiles(s"$w/t").toSet

    spark.sql("ALTER TABLE rena.t RENAME COLUMN score TO quality_score")
    // zero rewrites — the rename touched only the marker
    assert(WeatherLakeV2Sink.committedFiles(s"$w/t").toSet == filesBefore)
    assert(spark.table("rena.t").columns.toSeq ==
      Seq("id", "quality_score", "region"))
    // OLD files answer under the NEW name — never null-filled
    assert(spark.sql("SELECT CAST(sum(quality_score) AS BIGINT) FROM rena.t")
      .head.getLong(0) == (0L until 10L).map(_ * 10).sum)
    assert(spark.sql(
      "SELECT count(*) FROM rena.t WHERE quality_score >= 50")
      .head.getLong(0) == 5)
    // new writes use the new physical name and read back seamlessly
    spark.sql("""INSERT INTO rena.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(10, 20)""")
    assert(spark.sql("SELECT CAST(sum(quality_score) AS BIGINT) FROM rena.t")
      .head.getLong(0) == (0L until 20L).map(_ * 10).sum)
    // statsFields auto-followed
    val props = spark.sql("SHOW TBLPROPERTIES rena.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("statsFields").contains("quality_score"), props)
    spark.sql("DROP TABLE rena.t")
  }

  test("DML and merge-on-read keep working across mixed file " +
      "generations: UPDATE/DELETE/MERGE bind the new name, mor deletes " +
      "subtract on the v1 mapped leg, and a pre-rename EQUALITY delete " +
      "file still kills its rows after the rename (no resurrection)") {
    val w = freshCatalog("b")
    spark.sql("""CREATE TABLE renb.t (id BIGINT, score BIGINT,
      region STRING) USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('statsFields' = 'score', 'dmlMode' = 'mor',
      'morDeletes' = 'equality')""")
    spark.sql("""INSERT INTO renb.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(10)""")
    // an EQUALITY mor delete BEFORE the rename: the delete file's old
    // images carry the OLD column name
    spark.sql("DELETE FROM renb.t WHERE id = 3")
    assert(spark.table("renb.t").count() == 9)

    spark.sql("ALTER TABLE renb.t RENAME COLUMN score TO quality_score")
    // the old-name delete file still subtracts — id 3 must stay dead
    assert(spark.table("renb.t").count() == 9)
    assert(spark.sql("SELECT count(*) FROM renb.t WHERE id = 3")
      .head.getLong(0) == 0)

    // position deletes + mapping compose on the same table
    spark.sql("ALTER TABLE renb.t SET TBLPROPERTIES " +
      "('morDeletes' = 'position')")
    spark.sql("DELETE FROM renb.t WHERE quality_score = 50")
    assert(spark.table("renb.t").count() == 8)

    // UPDATE and MERGE bind the new name across old and new files
    spark.sql("UPDATE renb.t SET quality_score = 999 WHERE id = 2")
    assert(spark.sql(
      "SELECT quality_score FROM renb.t WHERE id = 2").head.getLong(0)
      == 999L)
    spark.sql("""MERGE INTO renb.t t
      USING (SELECT CAST(3 AS BIGINT) id, CAST(30 AS BIGINT) quality_score,
             'r1' region) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table("renb.t").count() == 9)
    assert(spark.sql(
      "SELECT quality_score FROM renb.t WHERE id = 3").head.getLong(0)
      == 30L)
    // reconcile folds everything and the mapped read survives
    spark.sql("CALL renb.system.reconcile('t')")
    assert(spark.table("renb.t").count() == 9)
    spark.sql("DROP TABLE renb.t")
  }

  test("chained renames coalesce over every historical spelling, and " +
      "the guards are loud: partition column, existing name, historical " +
      "collision") {
    val w = freshCatalog("c")
    spark.sql("""CREATE TABLE renc.t (id BIGINT, score BIGINT,
      region STRING) USING lake PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO renc.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(5)""")
    spark.sql("ALTER TABLE renc.t RENAME COLUMN score TO s2")
    spark.sql("""INSERT INTO renc.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(5, 10)""")
    spark.sql("ALTER TABLE renc.t RENAME COLUMN s2 TO s3")
    spark.sql("""INSERT INTO renc.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(10, 15)""")
    // three physical generations (score, s2, s3) under one logical name
    assert(spark.sql("SELECT CAST(sum(s3) AS BIGINT) FROM renc.t")
      .head.getLong(0) == (0L until 15L).map(_ * 10).sum)

    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage != null && e.getMessage.contains(needle),
        s"$sql → ${e.getMessage}")
    }
    refuse("ALTER TABLE renc.t RENAME COLUMN region TO zone",
      "partition column")
    refuse("ALTER TABLE renc.t RENAME COLUMN s3 TO id", "already exists")
    // 'score' and 's2' are historical names of s3 — re-using either
    // would make the widened scan ambiguous
    refuse("ALTER TABLE renc.t RENAME COLUMN id TO score", "historical")
    spark.sql("DROP TABLE renc.t")
  }

  test("compact MIGRATES old-spelling stats: post-rename, files whose " +
      "entry-line stats ride the historical name are candidates " +
      "regardless of size — the rewrite re-measures under the current " +
      "spelling and point predicates prune the old generation again") {
    val w = freshCatalog("d")
    spark.sql("""CREATE TABLE rend.t (id BIGINT, score BIGINT,
      region STRING) USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('statsFields' = 'score')""")
    // old generation: one comfortable file per partition dir — never a
    // small-file candidate on its own
    spark.sql("""INSERT INTO rend.t
      SELECT id, id, concat('r', id % 2) FROM range(200)""")
    spark.sql("ALTER TABLE rend.t RENAME COLUMN score TO quality")
    // new generation under the current spelling, disjoint value range
    spark.sql("""INSERT INTO rend.t
      SELECT id + 10000, id + 10000, 'r2' FROM range(50)""")
    val p = s"$w/t"
    def splitConj(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          splitConj(l) ++ splitConj(r)
        case other => Seq(other)
      }
    def planned(cond: String): Seq[String] = {
      val df = spark.table("rend.t").filter(cond)
      // the RESOLVED conjuncts the engine would push
      val conds = df.queryExecution.optimizedPlan.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          splitConj(f.condition)
      }.getOrElse(Seq.empty)
      val lines = WeatherLakeV2Sink.committedEntryLines(p)
      val statsOf = lines.map(l => l.split('\t').head ->
        WeatherLakeV2Sink.lineStats(l)).toMap
      val all = lines.map(_.split('\t').head)
      new graft.sources.LakeCatalog.StatsPrunedParquetScanBuilder("rend.t",
        spark, p, spark.table("rend.t").schema, all.sorted, statsOf,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("basePath", p)))
        .plannedFiles(conds)
    }
    // pre-compact: the mapping forces the widened coalesce read — a
    // point predicate on 'quality' fails OPEN everywhere
    val total = WeatherLakeV2Sink.committedFiles(p).size
    assert(planned("quality >= 10000").size == total,
      "old-generation files must fail open before migration")
    val compacted = spark.sql("CALL rend.system.compact('t')").head.getInt(0)
    assert(compacted >= 2, s"old-spelling dirs must be candidates, " +
      s"got $compacted")
    // post-compact: every entry line's stats key is the CURRENT name
    val lines = WeatherLakeV2Sink.committedEntryLines(p)
    assert(lines.forall(l => !WeatherLakeV2Sink.lineStats(l)
      .keysIterator.exists(_.equalsIgnoreCase("score"))),
      s"old-spelling stats must be gone, got:\n${lines.mkString("\n")}")
    // values intact across the migration, mapping still live (superseded
    // old-spelling files remain on disk — pinned snapshots can read them)
    assert(spark.table("rend.t").count() == 250)
    assert(spark.sql("SELECT CAST(sum(quality) AS BIGINT) FROM rend.t")
      .head.getLong(0) ==
        (0L until 200L).sum + (10000L until 10050L).sum)
    // the MARKER's schema carries the mapping (read plans alias it away)
    def mapping(): Map[String, Seq[String]] = {
      val cat = spark.sessionState.catalogManager.catalog("rend")
        .asInstanceOf[graft.sources.LakeCatalog]
      TypedLake.historicalNames(cat.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array.empty[String], "t")).schema())
    }
    assert(mapping().nonEmpty,
      "mapping must survive while old-spelling bytes are reachable")
    // vacuum reclaims the superseded generation; the next maintenance
    // pass RETIRES the mapping (footer-verified: nothing reachable still
    // spells 'score') and reads return to the plain pruned scan path
    spark.sql("CALL rend.system.vacuum('t', min_age_ms => 1, force => true)")
    assert(spark.sql("CALL rend.system.compact('t')").head.getInt(0) == 0)
    assert(mapping().isEmpty,
      "mapping must retire once nothing reachable spells the old name")
    val after = planned("quality >= 10000")
    assert(after.size < total && after.size >= 1,
      s"expected pruning after migration, planned $after")
    assert(after.forall(_.contains("region=r2")), after.toString)
    assert(spark.table("rend.t").count() == 250)
    assert(spark.sql("SELECT CAST(sum(quality) AS BIGINT) FROM rend.t")
      .head.getLong(0) ==
        (0L until 200L).sum + (10000L until 10050L).sum)
    spark.sql("DROP TABLE rend.t")
  }
}
