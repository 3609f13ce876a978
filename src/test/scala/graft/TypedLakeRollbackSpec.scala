package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** ROLLBACK — restore the live view to an earlier version or tag as ONE
  * new commit (Delta `RESTORE` / Iceberg `rollback_to_snapshot`): zero
  * data IO (as-of entry lines and mor directives re-listed verbatim),
  * history preserved (the rolled-away versions keep time-travelling
  * until vacuum), and the invariant that defines it: after
  * `rollback('t', v)` the table reads EXACTLY what `VERSION AS OF v`
  * read.
  */
class TypedLakeRollbackSpec extends SparkSpec {

  test("rollback restores any earlier version's exact view (rows, mor " +
      "deletion state, stats lines); history records it; no-op publishes " +
      "nothing; vacuum keeps the restored view and reclaims the rolled-" +
      "away generation; past-horizon targets fail loudly") {
    val w = Files.createTempDirectory("roll").toString
    spark.conf.set("spark.sql.catalog.roll", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.roll.warehouse", w)
    spark.sql("""CREATE TABLE roll.t (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("INSERT INTO roll.t SELECT id, id * 2 FROM range(30)") // v0
    spark.sql("DELETE FROM roll.t WHERE id = 3")                     // v1
    spark.sql(
      "INSERT INTO roll.t SELECT id, id * 7 FROM range(100, 110)")   // v2
    def view(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val asOf = (0 to 2).map(k =>
      k -> view(spark.sql(s"SELECT * FROM roll.t VERSION AS OF $k"))).toMap
    assert(asOf(0).size == 30 && asOf(1).size == 29 && asOf(2).size == 39)

    // restore v0: the mor delete AND the later append are both undone
    val r0 = spark.sql("CALL roll.system.rollback('t', '0')").head
    assert(view(spark.table("roll.t")) == asOf(0),
      "rollback(0) must read exactly what VERSION AS OF 0 read")
    assert(spark.sql("SELECT count(*) FROM roll.t WHERE id = 3")
      .head.getLong(0) == 1, "the mor-deleted row is restored")
    // v0's files are still live (mor delete moved no data): nothing to
    // restore; the v2 append's files drop; the delete file drops
    assert(r0.getInt(0) == 0 && r0.getInt(1) >= 1, r0.toString)
    assert(r0.getInt(2) == 0 && r0.getInt(3) == 1, r0.toString)

    // history: the rollback is a NEW live commit; old versions remain
    val hist = spark.sql("CALL roll.system.history('t')").collect()
    val live = hist.filter(_.getBoolean(4))
    assert(live.length == 1 && live.head.getString(2) == "rollback", hist.toSeq)
    assert(view(spark.sql("SELECT * FROM roll.t VERSION AS OF 2")) == asOf(2),
      "rolled-away versions still time-travel until vacuum")

    // no-op: restoring the current view publishes NOTHING
    val cur = hist.length - 1
    val noop = spark.sql(s"CALL roll.system.rollback('t', '$cur')").head
    assert((0 to 3).forall(noop.getInt(_) == 0), noop.toString)
    assert(spark.sql("CALL roll.system.history('t')").count() == hist.length,
      "a no-op rollback must not grow the history")

    // restore v1: the mor DELETION STATE comes back with the view
    val r1 = spark.sql("CALL roll.system.rollback('t', '1')").head
    assert(view(spark.table("roll.t")) == asOf(1))
    assert(r1.getInt(2) == 1, s"the delete file must be restored: $r1")

    // an aggressive vacuum keeps the restored view and reclaims the
    // rolled-away generation's files (v2's appends serve no live or
    // pinned snapshot once their manifests age out)
    val loc = spark.sql("CALL roll.system.detail('t')").head.getString(0)
    val snapPreVacuum = WeatherLakeV2Sink.snapshotAt(loc, 0)
    val reclaimed = spark.sql(
      "CALL roll.system.vacuum('t', min_age_ms => 1, force => true)")
      .head.getInt(0)
    assert(reclaimed > 0, "the rolled-away generation must be reclaimable")
    assert(view(spark.table("roll.t")) == asOf(1),
      "vacuum must never touch the restored live view")

    // past the horizon: the held pre-vacuum snapshot now fails LOUDLY
    val e = intercept[IllegalStateException](
      WeatherLakeV2Sink.rollbackTo(loc, snapPreVacuum))
    assert(e.getMessage.contains("vacuum horizon"), e.getMessage)

    // guards: out-of-range version, unknown tag name
    val e2 = intercept[Exception](
      spark.sql("CALL roll.system.rollback('t', '99')").collect())
    assert(e2.getMessage.contains("out of range"), e2.getMessage)
    val e3 = intercept[Exception](
      spark.sql("CALL roll.system.rollback('t', 'nope')").collect())
    assert(e3.getMessage.contains("unknown ref") ||
      e3.getMessage.contains("no tag"), e3.getMessage)
    spark.sql("DROP TABLE roll.t")
  }

  test("rollback to a TAG (the release-pin flow) and the WAP fence: a " +
      "session staging on a branch cannot roll back main") {
    val w = Files.createTempDirectory("rolltag").toString
    spark.conf.set("spark.sql.catalog.rtag", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.rtag.warehouse", w)
    spark.sql("CREATE TABLE rtag.t (id BIGINT, v BIGINT) USING lake")
    spark.sql("INSERT INTO rtag.t SELECT id, id FROM range(20)")
    spark.sql("CALL rtag.system.tag('t', 'release')")
    spark.sql("INSERT OVERWRITE rtag.t SELECT id, id * 9 FROM range(5)")
    assert(spark.table("rtag.t").count() == 5)

    spark.sql("CALL rtag.system.rollback('t', 'release')")
    assert(spark.table("rtag.t").count() == 20)
    assert(spark.sql(
      "SELECT CAST(sum(v) AS BIGINT) FROM rtag.t").head.getLong(0) == 190L)
    // the tag survives its own restoration (still a retention root)
    assert(spark.sql("SELECT count(*) FROM rtag.t VERSION AS OF 'release'")
      .head.getLong(0) == 20)

    // WAP fence: rollback is a main-history commit — staging refuses it
    // (target version 1, the overwrite: a view CHANGE, so the publish
    // path — where the fence lives — is actually reached)
    spark.sql("CALL rtag.system.create_branch('t', 'audit')")
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      val e = intercept[Exception](
        spark.sql("CALL rtag.system.rollback('t', '1')").collect())
      assert(e.getMessage.contains("staging on WAP branch"), e.getMessage)
    } finally spark.conf.unset("spark.graft.wap.branch")
    assert(spark.table("rtag.t").count() == 20,
      "the fenced rollback must not have moved main")
    spark.sql("CALL rtag.system.drop_branch('t', 'audit')")
    spark.sql("DROP TABLE rtag.t")
  }

  test("rollback to a TIMESTAMP (RESTORE TO TIMESTAMP AS OF): resolves " +
      "the greatest commit at-or-before the instant, UTC-read wall " +
      "forms accepted; pre-history instants and unknown refs are loud") {
    val w = Files.createTempDirectory("rollts").toString
    spark.conf.set("spark.sql.catalog.rts", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.rts.warehouse", w)
    spark.sql("CREATE TABLE rts.t (id BIGINT) USING lake")
    val t0 = System.currentTimeMillis() - 5
    spark.sql("INSERT INTO rts.t SELECT id FROM range(10)")
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql("INSERT INTO rts.t SELECT id FROM range(100, 150)")
    assert(spark.table("rts.t").count() == 60)
    // ISO instant form
    val iso = java.time.Instant.ofEpochMilli(mid).toString
    spark.sql(s"CALL rts.system.rollback('t', '$iso')")
    assert(spark.table("rts.t").count() == 10)
    // wall form (read as UTC) — resolves to the same pre-mid commit:
    // the view is already there, so this is a publish-nothing no-op
    val wall = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(mid), java.time.ZoneOffset.UTC)
      .toString.replace('T', ' ')
    val noop = spark.sql(s"CALL rts.system.rollback('t', '$wall')").head
    assert((0 to 3).forall(noop.getInt(_) == 0), noop.toString)
    // an instant BEFORE the first commit is loud (snapshotAtTimestamp)
    val e1 = intercept[Exception](spark.sql("CALL rts.system.rollback(" +
      s"'t', '${java.time.Instant.ofEpochMilli(t0 - 60000).toString}')")
      .collect())
    assert(e1.getMessage.contains("no commit"), e1.getMessage)
    // a non-version non-tag non-timestamp ref is loud, listing tags
    val e2 = intercept[Exception](
      spark.sql("CALL rts.system.rollback('t', 'not-a-ref')").collect())
    assert(e2.getMessage.contains("unknown ref") ||
      e2.getMessage.contains("no tag"), e2.getMessage)
    spark.sql("DROP TABLE rts.t")
  }

  test("typed snapshot-diff change feed across a rollback: an append " +
      "rolled back before the consumer drains nets to ZERO changes; a " +
      "drained append's rollback emits its deletes") {
    val lake = Files.createTempDirectory("rollcdf").toString
    val cursor = s"$lake/_cursor"
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false),
      StructField("region", StringType, nullable = false)))
    val pc = Seq("region")
    val s = spark
    import s.implicits._
    def mk(rows: (Long, Long)*): DataFrame =
      rows.map { case (k, v) => (k, v, s"r${k % 2}") }
        .toDF("k", "v", "region")
    def drain(): Set[(String, Long)] = {
      val (df, set) = TypedLake.readNewChangesTyped(
        spark, lake, schema, Seq("k"), cursor)
      val out = df.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      WeatherLakeV2Sink.replaceCursor(cursor, set)
      out
    }
    TypedLake.appendTyped(spark, lake, mk(1L -> 10L, 2L -> 20L),
      schema, pc, manifestId = Some("base"))
    assert(drain() == Set(("insert", 1L), ("insert", 2L)))

    // append + rollback BEFORE the consumer drains: the net delta of
    // the two commits is nothing — the feed emits nothing
    TypedLake.appendTyped(spark, lake, mk(9L -> 90L), schema, pc)
    val st = WeatherLakeV2Sink.rollbackTo(lake,
      WeatherLakeV2Sink.snapshotAt(lake, 0))
    assert(st.removedFiles == 1 && st.restoredFiles == 0, st.toString)
    assert(drain().isEmpty,
      "an un-drained append + its rollback must net to zero changes")

    // a DRAINED append's rollback is a real delta: the feed emits deletes
    TypedLake.appendTyped(spark, lake, mk(7L -> 70L), schema, pc)
    assert(drain() == Set(("insert", 7L)))
    WeatherLakeV2Sink.rollbackTo(lake, WeatherLakeV2Sink.snapshotAt(lake, 0))
    assert(drain() == Set(("delete", 7L)),
      "the feed must emit the restore's deletes for drained rows")
  }

  test("the classic commit-log change feed refuses a rollback commit " +
      "loudly (like overwrite: no row-level log to ship)") {
    val lake = Files.createTempDirectory("rollclassic").toString
    val s = spark
    import s.implicits._
    def payload(rows: Seq[(String, Long)]): DataFrame =
      rows.toDF("city", "k").select(col("city"),
        lit("2024-01-01").as("ds"), lit("00").as("hour"),
        to_json(struct(col("k"))).as("raw_json"))
    payload(Seq(("a", 1L))).coalesce(1)
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    payload(Seq(("a", 2L))).coalesce(1)
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    val st = WeatherLakeV2Sink.rollbackTo(lake,
      WeatherLakeV2Sink.snapshotAt(lake, 0))
    assert(st.removedFiles == 1, st.toString)
    val e = intercept[Exception] {
      spark.read.format("graft.sources.WeatherLakeV2StreamSource")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(lake).collect()
    }
    assert(e.getMessage.contains("not representable") &&
      e.getMessage.contains("RESTORE"), e.getMessage)
    // the restored view itself is intact (one live file, the v0 append)
    assert(WeatherLakeV2Sink.committedFiles(lake).size == 1)
  }
}
