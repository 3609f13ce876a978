package graft

import java.nio.file.Files

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** NAMED REFS — immutable snapshot TAGS (Iceberg `create_tag`):
  * `CALL lake.system.tag('t', 'v1')` pins the live manifest set under a
  * name, `VERSION AS OF 'v1'` reads it forever, and the tag is a VACUUM
  * RETENTION ROOT — the pinned snapshot's files and manifests survive
  * any retention window until the tag is dropped. This closes the
  * time-travel story: numeric versions serve debugging, tags serve
  * contracts (a training-data release, an audit snapshot).
  */
class TypedLakeRefsSpec extends SparkSpec {

  test("tag → mutate → VERSION AS OF '<tag>' reads the pinned state; " +
      "vacuum(force) cannot break a tagged read; drop_tag releases it " +
      "and the next vacuum reclaims; guards are loud") {
    val w = Files.createTempDirectory("refs").toString
    spark.conf.set("spark.sql.catalog.refs", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.refs.warehouse", w)
    spark.sql("""CREATE TABLE refs.t (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("INSERT INTO refs.t SELECT id, id * 2 FROM range(30)")
    // a mor deletion BEFORE the tag: the tag pins delete files too
    spark.sql("DELETE FROM refs.t WHERE id = 3")
    val pinned = spark.sql("CALL refs.system.tag('t', 'v1')").head.getInt(0)
    assert(pinned >= 1)
    assert(spark.sql("CALL refs.system.tags('t')").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("v1", pinned)))

    // mutate past the tag: overwrite + another delete
    spark.sql("INSERT OVERWRITE refs.t SELECT id, id * 5 FROM range(10)")
    assert(spark.table("refs.t").count() == 10)
    // the tag still answers the OLD state (29 rows, id=3 dead)
    val tagged = spark.sql("SELECT * FROM refs.t VERSION AS OF 'v1'")
    assert(tagged.count() == 29)
    assert(spark.sql(
      "SELECT count(*) FROM refs.t VERSION AS OF 'v1' WHERE id = 3")
      .head.getLong(0) == 0, "the tag pins the delete files too")
    assert(spark.sql(
      "SELECT CAST(sum(v) AS BIGINT) FROM refs.t VERSION AS OF 'v1'")
      .head.getLong(0) == (0L until 30L).filterNot(_ == 3).map(_ * 2).sum)

    // an aggressive vacuum reclaims nothing the tag needs
    spark.sql("CALL refs.system.vacuum('t', min_age_ms => 1, " +
      "force => true)")
    assert(spark.sql("SELECT count(*) FROM refs.t VERSION AS OF 'v1'")
      .head.getLong(0) == 29, "vacuum must not break a tagged read")
    assert(spark.table("refs.t").count() == 10)

    // numeric versions still work alongside tags
    assert(spark.sql("SELECT count(*) FROM refs.t VERSION AS OF 0")
      .head.getLong(0) == 30)

    // guards: unknown tag (listing existing ones), duplicate create
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM refs.t VERSION AS OF 'nope'").collect())
    assert(e1.getMessage.contains("unknown ref") &&
      e1.getMessage.contains("v1"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("CALL refs.system.tag('t', 'v1')").collect())
    assert(e2.getMessage.contains("IMMUTABLE"), e2.getMessage)

    // drop the tag: the snapshot stops being a retention root; a fresh
    // aggressive vacuum reclaims the superseded generation and the
    // replay now fails LOUDLY at the vacuum horizon (never silently)
    assert(spark.sql("CALL refs.system.drop_tag('t', 'v1')")
      .head.getBoolean(0))
    assert(spark.sql("CALL refs.system.tags('t')").collect().isEmpty)
    val reclaimed = spark.sql("CALL refs.system.vacuum('t', " +
      "min_age_ms => 1, force => true)").head.getInt(0)
    assert(reclaimed > 0, "dropping the tag must free its files")
    val e3 = intercept[Exception](
      spark.sql("SELECT * FROM refs.t VERSION AS OF 'v1'").collect())
    assert(e3.getMessage.contains("unknown ref"), e3.getMessage)
    // the LIVE table is untouched by all of it
    assert(spark.table("refs.t").count() == 10)
    spark.sql("DROP TABLE refs.t")
  }

  test("a tag hold retains its SUPERSEDER chain's manifests: tag → " +
      "reconcile (supersedes the tagged manifests) → zero-age vacuum " +
      "must not resurrect the superseded state into the live view") {
    val w = Files.createTempDirectory("refsr").toString
    spark.conf.set("spark.sql.catalog.refsr", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.refsr.warehouse", w)
    spark.sql("""CREATE TABLE refsr.t (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("INSERT INTO refsr.t SELECT id, id FROM range(20)")
    spark.sql("DELETE FROM refsr.t WHERE id = 5")
    spark.sql("CALL refsr.system.tag('t', 'pin')")
    // reconcile SUPERSEDES the tagged manifests (its tombstones keep
    // them out of the live set); a vacuum that deleted the reconcile
    // manifest while the tag retained its targets would resurrect the
    // pre-reconcile lines — the live view would double every row the
    // reconcile re-listed and re-show id=5
    spark.sql("CALL refsr.system.reconcile('t')")
    spark.sql("DELETE FROM refsr.t WHERE id = 6")
    spark.sql("CALL refsr.system.vacuum('t', min_age_ms => 0, " +
      "force => true)")
    assert(spark.table("refsr.t").count() == 18,
      "superseded state resurrected into the live view")
    assert(spark.sql("SELECT count(*) FROM refsr.t WHERE id IN (5, 6)")
      .head.getLong(0) == 0)
    // and the tag still answers its pinned state exactly
    assert(spark.sql("SELECT count(*) FROM refsr.t VERSION AS OF 'pin'")
      .head.getLong(0) == 19)
    assert(spark.sql(
      "SELECT count(*) FROM refsr.t VERSION AS OF 'pin' WHERE id = 5")
      .head.getLong(0) == 0)
    // dropping the tag releases the whole chain; the next vacuum
    // reclaims it and the live view is unchanged
    spark.sql("CALL refsr.system.drop_tag('t', 'pin')")
    spark.sql("CALL refsr.system.vacuum('t', min_age_ms => 0, " +
      "force => true)")
    assert(spark.table("refsr.t").count() == 18)
    spark.sql("DROP TABLE refsr.t")
  }

  test("function face: tags survive sweep_orphans, tag names validate, " +
      "and an empty table refuses to tag") {
    val lake = Files.createTempDirectory("refsf").toString + "/lake"
    val s = spark
    import s.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    intercept[IllegalArgumentException](
      WeatherLakeV2Sink.createTag(lake, "v1"))
    TypedLake.appendTyped(spark, lake, Seq(1L, 2L).toDF("id"), schema,
      Seq.empty, manifestId = Some("base"))
    intercept[IllegalArgumentException](
      WeatherLakeV2Sink.createTag(lake, "bad name!"))
    // all-digit names shadow VERSION AS OF's numeric resolution — a tag
    // named '123' could be created but never read back; refuse loudly
    val digits = intercept[IllegalArgumentException](
      WeatherLakeV2Sink.createTag(lake, "123"))
    assert(digits.getMessage.contains("all digits"))
    WeatherLakeV2Sink.createTag(lake, "rel-1.0")
    // immutability holds even on filesystems whose rename overwrites:
    // the tag file is created fail-if-exists, so a duplicate create
    // refuses and the ORIGINAL pinned snapshot survives byte-identical
    val pinned = WeatherLakeV2Sink.readTag(lake, "rel-1.0")
    intercept[IllegalArgumentException](
      WeatherLakeV2Sink.createTag(lake, "rel-1.0"))
    assert(WeatherLakeV2Sink.readTag(lake, "rel-1.0") == pinned)
    assert(WeatherLakeV2Sink.tagNames(lake) == Seq("rel-1.0"))
    // the refs dir is metadata, not data: the orphan sweep skips it
    WeatherLakeV2Sink.sweepOrphans(lake, minAgeMs = 1L)
    assert(WeatherLakeV2Sink.tagNames(lake) == Seq("rel-1.0"))
    assert(WeatherLakeV2Sink.readTag(lake, "rel-1.0").nonEmpty)
    assert(WeatherLakeV2Sink.dropTag(lake, "rel-1.0"))
    assert(!WeatherLakeV2Sink.dropTag(lake, "rel-1.0"))
  }
}
