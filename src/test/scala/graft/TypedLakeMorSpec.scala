package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** MERGE-ON-READ deletion vectors: a small DELETE publishes O(deleted)
  * delete-file bytes and rewrites NO data file; every read face (function,
  * SQL catalog, time travel, CDF, DML's own reads) subtracts the delete
  * rows; reconcile folds them back into clean files; maintenance carries
  * the directives so deleted rows can never resurrect.
  */
class TypedLakeMorSpec extends SparkSpec {
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/lake"

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("region", StringType)))
  private val pc = Seq("region")

  private def seed(lake: String, n: Int = 40, id: String = "base"): Unit = {
    val s = spark
    import s.implicits._
    TypedLake.appendTyped(spark, lake,
      (0 until n).map(i => (i.toLong, s"n-$i", s"r${i % 2}"))
        .toDF("id", "name", "region"),
      schema, pc, statsFields = Seq("id"), manifestId = Some(id))
  }

  private def ids(lake: String): Set[Long] =
    TypedLake.readCommittedTyped(spark, lake, schema)
      .select("id").collect().map(_.getLong(0)).toSet

  test("a mor delete publishes O(deleted) delete files, rewrites ZERO " +
      "data files, supersedes NOTHING — and reads subtract exactly the " +
      "copy-on-write answer") {
    val lake = tmp("morbasic")
    seed(lake)
    val filesBefore = WeatherLakeV2Sink.committedFiles(lake).toSet
    val manifestsBefore = WeatherLakeV2Sink.liveManifests(lake).toSet
    val st = TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") % 10 === 3)
    assert(st.deletedRows == 4, st)
    assert(st.newFiles == 1, st) // small delete → one coalesced file
    // THE merge-on-read contract: identical data files, nothing superseded
    assert(WeatherLakeV2Sink.committedFiles(lake).toSet == filesBefore)
    assert(WeatherLakeV2Sink.liveManifests(lake).toSet
      .intersect(manifestsBefore) == manifestsBefore)
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).size == 1)
    // read parity with what a copy-on-write delete would answer
    assert(ids(lake) == (0L until 40L).filterNot(_ % 10 == 3).toSet)
    // the delete file materializes O(deleted rows), not O(table): its
    // row count IS the deleted-row count (at fixture scale parquet's
    // fixed footer overhead dwarfs row bytes, so rows are the honest pin)
    val delRows = spark.read
      .schema(TypedLake.morDeleteSchema(schema))
      .parquet(WeatherLakeV2Sink.committedMorDeleteFiles(lake): _*)
      .count()
    assert(delRows == 4, s"delete file rows: $delRows")
    // a second mor delete reads the RESOLVED view: re-deleting the same
    // predicate is a no-op (publishes nothing)
    val manifests = WeatherLakeV2Sink.manifestNames(lake).size
    val st2 = TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") % 10 === 3)
    assert(st2.deletedRows == 0, st2)
    assert(WeatherLakeV2Sink.manifestNames(lake).size == manifests)
    // stacking a second, different delete composes
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 0L)
    assert(ids(lake) == (1L until 40L).filterNot(_ % 10 == 3).toSet)
  }

  test("file-scoped targeting: re-inserting a row EQUAL to a deleted one " +
      "survives (new file, old delete rows cannot kill it)") {
    val lake = tmp("morreinsert")
    seed(lake, n = 10)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 5L)
    assert(!ids(lake).contains(5L))
    // append the IDENTICAL row again — lands in a NEW file
    val s = spark
    import s.implicits._
    TypedLake.appendTyped(spark, lake,
      Seq((5L, "n-5", "r1")).toDF("id", "name", "region"), schema, pc)
    assert(ids(lake).contains(5L),
      "old delete rows must not kill re-inserted equal rows")
  }

  test("the SQL catalog face is mor-correct end-to-end: dmlMode='mor' " +
      "DELETE through SQL, SELECT/aggregates/time travel subtract, and " +
      "CoW DML + merge on a delete-vectored table stay correct") {
    val w = Files.createTempDirectory("morwh").toString
    spark.conf.set("spark.sql.catalog.morlake", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.morlake.warehouse", w)
    spark.sql("""CREATE TABLE morlake.t (id BIGINT, name STRING,
      region STRING) USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('statsFields' = 'id', 'dmlMode' = 'mor')""")
    spark.sql("""INSERT INTO morlake.t
      SELECT id, concat('n-', id), concat('r', id % 2) FROM range(40)""")
    val p = s"$w/t"
    val filesBefore = WeatherLakeV2Sink.committedFiles(p).toSet
    val res = spark.sql(
      "DELETE FROM morlake.t WHERE id % 10 = 3").collect().head
    assert(res.getLong(2) == 4, res)
    // no data file rewritten — the SQL DELETE took the mor path
    assert(WeatherLakeV2Sink.committedFiles(p).toSet == filesBefore)
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(p).nonEmpty)
    // SELECT subtracts (MorScanResolution): rows, aggregates, filters
    assert(spark.table("morlake.t").count() == 36)
    assert(spark.sql("SELECT count(*) FROM morlake.t WHERE id % 10 = 3")
      .head.getLong(0) == 0)
    assert(spark.sql("SELECT CAST(sum(id) AS BIGINT) FROM morlake.t")
      .head.getLong(0) == (0L until 40L).filterNot(_ % 10 == 3).sum)
    // time travel: version 0 (pre-delete) still shows everything; the
    // current version subtracts
    assert(spark.sql("SELECT count(*) FROM morlake.t VERSION AS OF 0")
      .head.getLong(0) == 40)
    // a typed MERGE on the delete-vectored table: a deleted key is NOT
    // MATCHED (must insert, not update a ghost)
    spark.range(1).selectExpr("CAST(3 AS BIGINT) AS id",
        "'fresh' AS name", "'r1' AS region")
      .createOrReplaceTempView("mor_merge_src")
    spark.sql("""MERGE INTO morlake.t t USING mor_merge_src s
      ON t.id = s.id AND t.region = s.region
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val row3 = spark.table("morlake.t").filter(col("id") === 3).collect()
    assert(row3.length == 1 && row3.head.getString(1) == "fresh", row3.toSeq)
    // UPDATE on the mor table is merge-on-read too: old image becomes a
    // delete row, the new image appends, NOTHING is rewritten
    val filesBeforeUpd = WeatherLakeV2Sink.committedFiles(p).toSet
    spark.sql("UPDATE morlake.t SET name = 'u' WHERE id = 8")
    assert(WeatherLakeV2Sink.committedFiles(p).toSet
      .intersect(filesBeforeUpd) == filesBeforeUpd,
      "mor UPDATE must not rewrite committed files")
    assert(spark.table("morlake.t").count() == 37) // 36 + inserted id=3
    assert(spark.table("morlake.t").filter(col("id") === 8)
      .head.getString(1) == "u")
    assert(spark.table("morlake.t")
      .filter(col("id") === 13).count() == 0, "deleted row resurrected")
    // an identical-value re-update publishes NOTHING (idempotent)
    val manifests = WeatherLakeV2Sink.manifestNames(p).size
    val upd2 = spark.sql(
      "UPDATE morlake.t SET name = 'u' WHERE id = 8").collect().head
    assert(upd2.getLong(2) == 0, upd2)
    assert(WeatherLakeV2Sink.manifestNames(p).size == manifests)
  }

  test("reconcile folds delete rows into clean files (view unchanged, " +
      "directives consumed), and vacuum then reclaims the delete files") {
    val lake = tmp("morreconcile")
    seed(lake)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") < 10L)
    val before = ids(lake)
    assert(before == (10L until 40L).toSet)
    val delFiles = WeatherLakeV2Sink.committedMorDeleteFiles(lake)
    assert(delFiles.nonEmpty)
    val rewritten = TypedLake.reconcileMor(spark, lake, schema, pc,
      statsFields = Seq("id"))
    assert(rewritten > 0)
    assert(ids(lake) == before, "reconcile must preserve the view")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).isEmpty,
      "directives must be consumed")
    // reconcile twice is a no-op
    assert(TypedLake.reconcileMor(spark, lake, schema, pc) == 0)
    // vacuum (forced past the retention floor) reclaims the superseded
    // delete files from disk
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    WeatherLakeV2Sink.vacuum(lake, minAgeMs = 0L, force = true)
    delFiles.foreach { f =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(f)),
        s"delete file not reclaimed: $f")
    }
  }

  test("maintenance can never resurrect deleted rows: checkpoint and " +
      "measure_stats carry the directives; compaction applies deletions " +
      "while compacting; CDF emits the mor deletions") {
    val lake = tmp("mormaint")
    // several small appends so compact has candidates
    (0 until 3).foreach(k => seed(lake, n = 30, id = s"base$k"))
    // (appendTyped with the same content thrice = 90 rows, ids repeat —
    // use distinct predicate semantics: delete ALL copies of id < 5)
    val preSnap = WeatherLakeV2Sink.snapshot(lake)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") < 5L)
    val postSnap = WeatherLakeV2Sink.snapshot(lake)
    val expect = (0 until 3).flatMap(_ => 5 until 30).map(_.toLong)
    def allIds: Seq[Long] = TypedLake.readCommittedTyped(spark, lake, schema)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(allIds == expect.sorted)
    // CDF between the two snapshots: exactly the 15 deleted rows (3
    // copies each of ids 0..4), all tagged delete
    val cdf = TypedLake.changesBetweenTyped(spark, lake, schema,
      keyCols = Seq("id", "name", "region"), from = preSnap, to = postSnap)
      .collect()
    assert(cdf.length == 15, cdf.length)
    assert(cdf.forall(_.getString(0) == "delete"))
    // checkpoint collapses manifests but carries the directives
    assert(WeatherLakeV2Sink.checkpointManifests(lake) > 0)
    assert(allIds == expect.sorted, "checkpoint resurrected deleted rows")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).nonEmpty)
    // measure_stats re-lists every line and must keep the directives too
    TypedLake.measureStatsTyped(spark, lake, schema, Seq("id"))
    assert(allIds == expect.sorted, "measure resurrected deleted rows")
    // compaction reads resolved rows — its rewrite has deletions applied
    TypedLake.compactTyped(spark, lake, schema, pc)
    assert(allIds == expect.sorted, "compact resurrected deleted rows")
  }

  test("mor MERGE: matched updates become delete-row + appended new " +
      "image, inserts append, touched files are NEVER rewritten, and an " +
      "all-unchanged re-merge publishes NOTHING") {
    val w = Files.createTempDirectory("mormergewh").toString
    spark.conf.set("spark.sql.catalog.mmlake", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.mmlake.warehouse", w)
    spark.sql("""CREATE TABLE mmlake.t (id BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("""INSERT INTO mmlake.t
      SELECT id, id AS v, concat('r', id % 2) FROM range(20)""")
    val p = s"$w/t"
    val filesBefore = WeatherLakeV2Sink.committedFiles(p).toSet
    // CDC batch: update ids 0..4 (v*10), insert ids 100..102
    spark.sql("""SELECT id, id * 10 AS v, concat('r', id % 2) AS region
      FROM range(5)
      UNION ALL
      SELECT id + 100, id + 100, concat('r', id % 2) FROM range(3)""")
      .createOrReplaceTempView("mm_src")
    val r1 = spark.sql("""MERGE INTO mmlake.t t USING mm_src s
      ON t.id = s.id AND t.region = s.region
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").collect().head
    // original data files are all still committed — nothing was rewritten
    assert(WeatherLakeV2Sink.committedFiles(p).toSet
      .intersect(filesBefore) == filesBefore,
      "mor merge must not rewrite committed files")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(p).nonEmpty)
    // state: updates applied, inserts present, untouched rows intact
    val got = spark.table("mmlake.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 23, got.size)
    (0L until 5L).foreach(i => assert(got(i) == i * 10, s"id=$i"))
    (5L until 20L).foreach(i => assert(got(i) == i, s"id=$i"))
    (100L until 103L).foreach(i => assert(got(i) == i, s"id=$i"))
    // re-merging the SAME batch is a true no-op: every update lands
    // unchanged, every insert is now matched-unchanged — no new commit
    val manifests = WeatherLakeV2Sink.manifestNames(p).size
    val r2 = spark.sql("""MERGE INTO mmlake.t t USING mm_src s
      ON t.id = s.id AND t.region = s.region
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").collect().head
    assert(r2.getInt(0) == 0 && r2.getInt(1) == 0, r2)
    assert(WeatherLakeV2Sink.manifestNames(p).size == manifests,
      "idempotent mor re-merge must publish nothing")
    // DESCRIBE DETAIL surfaces the merge-on-read debt
    assert(spark.sql("CALL mmlake.system.detail('t')")
      .head.getInt(7) > 0, "detail must report live delete files")
    // reconcile folds it all back; state unchanged; vacuum-ready
    spark.sql("CALL mmlake.system.reconcile('t')")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(p).isEmpty)
    assert(spark.sql("CALL mmlake.system.detail('t')")
      .head.getInt(7) == 0)
    val after = spark.table("mmlake.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == got)
  }

  test("delete-side skipping: delete-file entry lines carry target-range " +
      "stats, and a read over a pruned data-file subset opens only the " +
      "delete files that can target it (fail-open without stats)") {
    val lake = tmp("morprune")
    seed(lake) // r0/r1 partitions
    // two mor deletes: even ids live in r0, odd in r1 — each delete's
    // targets stay within one partition's files
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 4L) // r0 file(s) only
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 5L) // r1 file(s) only
    val lines = WeatherLakeV2Sink.morDeleteLinesAsOf(lake,
      WeatherLakeV2Sink.liveManifests(lake))
    assert(lines.size == 2)
    // every delete entry line carries __target_file stats
    assert(lines.forall(l =>
      WeatherLakeV2Sink.lineStats(l).contains(TypedLake.MorTargetCol)),
      lines.mkString("\n"))
    val r0Files = WeatherLakeV2Sink.committedFiles(lake)
      .filter(_.contains("region=r0"))
    val r1Files = WeatherLakeV2Sink.committedFiles(lake)
      .filter(_.contains("region=r1"))
    val forR0 = TypedLake.pruneMorDeleteLines(lines, r0Files)
    val forR1 = TypedLake.pruneMorDeleteLines(lines, r1Files)
    assert(forR0.size == 1 && forR1.size == 1, s"r0=$forR0 r1=$forR1")
    assert(forR0 != forR1)
    // a stats-less directive line always survives (fail open)
    val bare = Seq("/tmp/nostats.parquet")
    assert(TypedLake.pruneMorDeleteLines(bare, r0Files) == bare)
    // and the resolved reads stay exact either way
    assert(ids(lake) == (0L until 40L).filterNot(i => i == 4 || i == 5).toSet)
  }

  test("delete-side PREDICATE pruning: equality delete files carry the " +
      "table's stats columns over their OLD IMAGES, a predicate-scoped " +
      "DML opens only the delete files whose deleted rows could match, " +
      "and skipped ghosts stay exact in the final view") {
    val lake = tmp("morpredprune")
    seed(lake) // ids 0..39
    // two EQUALITY mor deletes with id stats on the delete files
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") < 3L, positionDeletes = false,
      statsFields = Seq("id"))
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") >= 37L, positionDeletes = false,
      statsFields = Seq("id"))
    val lines = WeatherLakeV2Sink.morDeleteLinesAsOf(lake,
      WeatherLakeV2Sink.liveManifests(lake))
    assert(lines.size == 2)
    // the delete entry lines carry id min/max over the OLD images
    val idStats = lines.map(l => WeatherLakeV2Sink.lineStats(l).get("id"))
    assert(idStats.forall(_.isDefined), lines.mkString("\n"))
    // a predicate bounded to id <= 10 keeps only the low-range file
    val allFiles = WeatherLakeV2Sink.committedFiles(lake)
    def keepLe10(l: String): Boolean =
      WeatherLakeV2Sink.lineStats(l).get("id")
        .forall(_.overlaps(None, Some("10")))
    val kept = TypedLake.applicableDeleteLines(lines, allFiles, keepLe10)
    assert(kept.size == 1, s"kept $kept")
    // position files carry no data stats and always survive the
    // predicate leg (fail-open)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 20L) // position flavor
    val lines3 = WeatherLakeV2Sink.morDeleteLinesAsOf(lake,
      WeatherLakeV2Sink.liveManifests(lake))
    val kept3 = TypedLake.applicableDeleteLines(lines3, allFiles, keepLe10)
    assert(kept3.size == 2, s"kept $kept3") // low-range eq + the pos file
    // end-to-end: a scoped UPDATE whose domain excludes the high-range
    // delete file (its ghosts never match the predicate) stays exact
    val st = TypedLake.updateTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 10L,
      assignments = Seq("name" -> (df => lit("hit"))))
    assert(st.updatedRows == 1, st)
    val rows = TypedLake.readCommittedTyped(spark, lake, schema)
      .select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet ==
      (3L until 37L).toSet - 20L, rows.keySet.toSeq.sorted)
    assert(rows(10L) == "hit")
  }

  test("FILE-IDENTITY conflict rules: a path-rewriting commit (compact/" +
      "reconcile) and a mor publish serialize LOUDLY in both directions; " +
      "identity-preserving maintenance (checkpoint) does not conflict a " +
      "mor publish; carried-over directives never spuriously conflict " +
      "disjoint DML") {
    val lake = tmp("moridentity")
    seed(lake)
    // direction 1: a compaction whose snapshot predates a fresh mor
    // delete must conflict — committing would rewrite the delete's
    // target paths and silently resurrect its rows
    val s1 = WeatherLakeV2Sink.liveManifests(lake)
    val lines1 = WeatherLakeV2Sink.committedFiles(lake)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 7L)
    val e1 = intercept[java.util.ConcurrentModificationException] {
      WeatherLakeV2Sink.publishForTest(lake, "compact", snapshot = s1,
        supersedes = s1, lines = lines1, readDomain = Some(_ => false),
        payload = Some(TypedLake.Payload))
    }
    assert(e1.getMessage.contains("read domain"), e1.getMessage)
    // direction 2: a mor publish whose snapshot predates a fresh
    // reconcile (which rewrote its would-be targets) must conflict
    val s2 = WeatherLakeV2Sink.liveManifests(lake)
    assert(TypedLake.reconcileMor(spark, lake, schema, pc) > 0)
    val e2 = intercept[java.util.ConcurrentModificationException] {
      WeatherLakeV2Sink.publishForTest(lake, "mordelete", snapshot = s2,
        supersedes = Seq.empty,
        lines = Seq(s"${WeatherLakeV2Sink.MorDeletePrefix}/tmp/fake.parquet"),
        readDomain = Some(_ => true), payload = Some(TypedLake.Payload),
        fileIdentityDependent = true)
    }
    assert(e2.getMessage.contains("read domain"), e2.getMessage)
    // identity-preserving maintenance is exempt: a checkpoint re-lists
    // paths VERBATIM, so a mor publish across it stays valid
    seed(lake, n = 5, id = "extra") // live set > 1 so checkpoint rolls up
    val s3 = WeatherLakeV2Sink.liveManifests(lake)
    assert(WeatherLakeV2Sink.checkpointManifests(lake) > 0)
    WeatherLakeV2Sink.publishForTest(lake, "mordelete", snapshot = s3,
      supersedes = Seq.empty, lines = Seq.empty,
      readDomain = Some(_ => true), payload = Some(TypedLake.Payload),
      fileIdentityDependent = true)
    // carried-over directives are old news: a CoW delete superseding a
    // MIXED mor-merge manifest re-publishes its directives, and a
    // disjoint-domain op racing it must NOT conflict on them
    val s = spark
    import s.implicits._
    TypedLake.mergeTypedMor(spark, lake, schema, pc,
      Seq((500L, "m", "r0")).toDF("id", "name", "region"),
      keyCols = Seq("id", "region")) // mixed manifest: data + (no deletes)
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 500L) // now a live directive exists
    val stale = WeatherLakeV2Sink.liveManifests(lake)
    // CoW delete touches r0 files → supersedes + carries directives
    TypedLake.deleteTyped(spark, lake, schema, pc,
      predicate = df => df("id") === 2L)
    // the fresh 'delete' manifest carries directives but CREATED none —
    // a disjoint op (domain = nothing) publishes fine
    WeatherLakeV2Sink.publishForTest(lake, "merge", snapshot = stale,
      supersedes = Seq.empty, lines = Seq.empty,
      readDomain = Some(_ => false), payload = Some(TypedLake.Payload))
  }

  test("a mor delete racing a domain-carrying commit conflicts loudly " +
      "(publishCommit sees the fresh #mordelete directive)") {
    val lake = tmp("morconflict")
    seed(lake)
    val snapshot = WeatherLakeV2Sink.liveManifests(lake)
    // a mor delete lands AFTER the snapshot
    TypedLake.deleteTypedMor(spark, lake, schema, pc,
      predicate = df => df("id") === 1L)
    // a stale domain-carrying publish must now conflict: its decisions
    // never saw the deletion
    val e = intercept[java.util.ConcurrentModificationException] {
      WeatherLakeV2Sink.publishForTest(lake, "merge", snapshot = snapshot,
        supersedes = snapshot, lines = Seq.empty,
        readDomain = Some(_ => false)) // domain rules everything out —
        // the directive still conflicts (row-level deletes are unprunable)
    }
    assert(e.getMessage.contains("read domain"), e.getMessage)
  }
}
