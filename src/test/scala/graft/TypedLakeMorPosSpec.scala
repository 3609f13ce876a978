package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** POSITION-based merge-on-read deletes — (target file, row ordinal)
  * delete files via the engine's `_metadata.row_index`: O(16 bytes) per
  * deleted row REGARDLESS of table width, where the equality form
  * carries the full old image. Position is the default flavor; equality
  * remains the explicit fallback; readers subtract BOTH, so a table may
  * mix flavors across its history.
  */
class TypedLakeMorPosSpec extends SparkSpec {
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/lake"

  // a WIDE table: the text column dominates row bytes (the
  // documents-table shape that motivates position deletes)
  private val wide = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType),
    StructField("region", StringType)))
  private val pc = Seq("region")

  private def seedWide(lake: String, n: Int = 200): Unit = {
    val s = spark
    import s.implicits._
    TypedLake.appendTyped(spark, lake,
      (0 until n).map(i => (i.toLong, s"txt-$i-" + ("x" * 2000),
        s"r${i % 2}")).toDF("id", "text", "region"),
      wide, pc, statsFields = Seq("id"), manifestId = Some("base"))
  }

  private def ids(lake: String): Set[Long] =
    TypedLake.readCommittedTyped(spark, lake, wide)
      .select("id").collect().map(_.getLong(0)).toSet

  private def deleteFileBytes(lake: String): Long = {
    val fs = new Path(lake).getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    WeatherLakeV2Sink.committedMorDeleteFiles(lake)
      .map(f => fs.getFileStatus(new Path(f)).getLen).sum
  }

  test("position deletes cost O(bytes-per-ordinal) regardless of row " +
      "width: on a wide table the delete file is a small constant " +
      "fraction of the old-image bytes the equality form would carry — " +
      "zero data-file rewrites, read parity, morpos flavor marker") {
    val posLake = tmp("morposwide")
    val eqLake = tmp("moreqwide")
    seedWide(posLake); seedWide(eqLake)
    val filesBefore = WeatherLakeV2Sink.committedFiles(posLake).toSet

    val stPos = TypedLake.deleteTypedMor(spark, posLake, wide, pc,
      predicate = df => df("id") % 10 === 3) // 20 of 200 rows
    val stEq = TypedLake.deleteTypedMor(spark, eqLake, wide, pc,
      predicate = df => df("id") % 10 === 3, positionDeletes = false)
    assert(stPos.deletedRows == 20 && stEq.deletedRows == 20,
      s"$stPos / $stEq")

    // THE mor contract holds for the position form: identical data files
    assert(WeatherLakeV2Sink.committedFiles(posLake).toSet == filesBefore)
    // flavor is structural: op token in the file name
    val posFiles = WeatherLakeV2Sink.committedMorDeleteFiles(posLake)
    assert(posFiles.nonEmpty && posFiles.forall(TypedLake.isPosDelete),
      posFiles)
    val eqFiles = WeatherLakeV2Sink.committedMorDeleteFiles(eqLake)
    assert(eqFiles.nonEmpty && !eqFiles.exists(TypedLake.isPosDelete),
      eqFiles)

    // the wide-row pin: the position delete file must be a small
    // fraction of the equality file's old-image bytes (20 rows × ~2 KB
    // text vs 20 × 16-byte ordinals; parquet footer overhead is why the
    // bound is 5×, not 100×)
    val posBytes = deleteFileBytes(posLake)
    val eqBytes = deleteFileBytes(eqLake)
    assert(posBytes * 5 < eqBytes,
      s"position $posBytes bytes vs equality $eqBytes bytes")

    // the delete file IS the (target, ordinal) shape
    val delSchema = spark.read.parquet(posFiles: _*).schema
    assert(delSchema.fieldNames.toSeq ==
      Seq(TypedLake.MorTargetCol, TypedLake.MorPosCol), delSchema)

    // read parity: both flavors answer exactly the copy-on-write result
    val expect = (0L until 200L).filterNot(_ % 10 == 3).toSet
    assert(ids(posLake) == expect)
    assert(ids(eqLake) == expect)
  }

  test("flavors MIX on one table: equality then position deletes stack, " +
      "reads subtract both, CDF nets them, reconcile folds both and " +
      "returns the table to pure copy-on-write") {
    val lake = tmp("mormix")
    seedWide(lake, n = 60)
    val snap0 = WeatherLakeV2Sink.liveManifests(lake)
    TypedLake.deleteTypedMor(spark, lake, wide, pc,
      predicate = df => df("id") < 5L, positionDeletes = false)
    TypedLake.deleteTypedMor(spark, lake, wide, pc,
      predicate = df => df("id") >= 55L) // position (default)
    val live = WeatherLakeV2Sink.committedMorDeleteFiles(lake)
    assert(live.exists(TypedLake.isPosDelete) &&
      live.exists(f => !TypedLake.isPosDelete(f)), live)
    assert(ids(lake) == (5L until 55L).toSet)

    // CDF between the seed snapshot and now nets BOTH flavors as deletes
    val snap1 = WeatherLakeV2Sink.manifestNames(lake)
    val changes = TypedLake.changesBetweenTyped(spark, lake, wide,
      keyCols = Seq("id"), from = snap0, to = snap1)
    val deleted = changes.filter(col("_change") === "delete")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(deleted == ((0L until 5L) ++ (55L until 60L)).toSet, deleted)
    assert(changes.filter(col("_change") =!= "delete").count() == 0)

    // reconcile consumes both flavors in one commit
    val rewritten = TypedLake.reconcileMor(spark, lake, wide, pc,
      statsFields = Seq("id"))
    assert(rewritten > 0)
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).isEmpty)
    assert(ids(lake) == (5L until 55L).toSet)
  }

  test("SPLIT SCAN: files outside every delete file's target range " +
      "bypass the subtraction (plan shows Union(plain scan, anti-join)), " +
      "the targeted-file classifier is range-exact and fail-safe, and " +
      "answers stay identical") {
    val lake = tmp("morsplit")
    seedWide(lake, n = 80) // r0/r1, one file each
    // delete only from r0's file — r1's file must ride the clean leg
    TypedLake.deleteTypedMor(spark, lake, wide, pc,
      predicate = df => df("id") === 6L) // 6 is even → region r0
    val lines = WeatherLakeV2Sink.morDeleteLinesAsOf(lake,
      WeatherLakeV2Sink.liveManifests(lake))
    val files = WeatherLakeV2Sink.committedFiles(lake)
    val targeted = TypedLake.possiblyTargetedFiles(files, lines)
    val r0 = files.filter(_.contains("region=r0")).toSet
    assert(targeted == r0, s"targeted $targeted vs r0 $r0")
    // fail-safe: a stats-less delete line marks EVERYTHING targeted
    assert(TypedLake.possiblyTargetedFiles(files,
      Seq("/tmp/nostats.parquet")) == files.toSet)
    // the read plans as Union(clean scan, subtracted targeted scan)
    val df = TypedLake.readCommittedTyped(spark, lake, wide)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Union"), plan)
    assert(df.select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 80L).toSet - 6L)
  }

  test("SQL face: morDeletes defaults to position (DML over LIVE " +
      "position deletes still resolves the lake target — MERGE/UPDATE/" +
      "DELETE stack, SELECT and time travel subtract), and " +
      "morDeletes='equality' switches the written flavor") {
    val w = Files.createTempDirectory("morposwh").toString
    spark.conf.set("spark.sql.catalog.mplake", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.mplake.warehouse", w)
    spark.sql("""CREATE TABLE mplake.t (id BIGINT, text STRING,
      region STRING) USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('statsFields' = 'id', 'dmlMode' = 'mor')""")
    spark.sql("""INSERT INTO mplake.t
      SELECT id, concat('t-', id), concat('r', id % 2) FROM range(40)""")
    val p = s"$w/t"
    val filesBefore = WeatherLakeV2Sink.committedFiles(p).toSet

    spark.sql("DELETE FROM mplake.t WHERE id % 10 = 3")
    val live1 = WeatherLakeV2Sink.committedMorDeleteFiles(p)
    assert(live1.nonEmpty && live1.forall(TypedLake.isPosDelete), live1)
    assert(WeatherLakeV2Sink.committedFiles(p).toSet == filesBefore)
    assert(spark.table("mplake.t").count() == 36)

    // DML with live POSITION deletes: the analyzed target has no DSv2
    // relation (v1 data leg) — resolveTarget recognizes the tagged
    // rewrite. UPDATE stacks a second mor commit; MERGE re-arms a key.
    spark.sql("UPDATE mplake.t SET text = 'upd' WHERE id = 4")
    assert(spark.sql("SELECT text FROM mplake.t WHERE id = 4")
      .head.getString(0) == "upd")
    spark.sql("""MERGE INTO mplake.t t
      USING (SELECT CAST(3 AS BIGINT) id, 't-3' text, 'r1' region) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table("mplake.t").count() == 37)
    // still zero data-file rewrites across all three verbs
    assert(WeatherLakeV2Sink.committedFiles(p).toSet
      .intersect(filesBefore) == filesBefore)
    // time travel: the pre-delete version still answers in full
    assert(spark.sql("SELECT count(*) FROM mplake.t VERSION AS OF 0")
      .head.getLong(0) == 40)

    // aggregate pushes through the v1 mor leg correctly
    assert(spark.sql(
      "SELECT CAST(sum(id) AS BIGINT) FROM mplake.t WHERE id < 10")
      .head.getLong(0) == (0L until 10L).filterNot(_ % 10 == 3).sum + 3)

    // the equality fallback is one property away
    spark.sql("ALTER TABLE mplake.t SET TBLPROPERTIES " +
      "('morDeletes' = 'equality')")
    spark.sql("DELETE FROM mplake.t WHERE id = 7")
    val live2 = WeatherLakeV2Sink.committedMorDeleteFiles(p)
    assert(live2.exists(f => !TypedLake.isPosDelete(f)), live2)
    assert(spark.table("mplake.t").count() == 36)
    spark.sql("DROP TABLE mplake.t")
  }
}
