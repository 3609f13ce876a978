package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{LakeCatalog, WeatherLakeV2Sink}

/** Atomic CTAS/RTAS through the StagingTableCatalog face: the name is
  * claimed by a staged marker (invisible to readers), the SELECT's write
  * lands before the table appears, and failure paths leave no
  * intermediate state.
  */
class LakeCtasSpec extends SparkSpec {
  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("ctaswh").toString
    spark.conf.set("spark.sql.catalog.ctas", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.ctas.warehouse", w)
    w
  }

  test("typed CTAS: one statement creates, populates, and atomically " +
      "publishes a typed table — the data is already committed when the " +
      "table first becomes visible") {
    warehouse
    spark.sql("""CREATE TABLE ctas.t1 USING lake PARTITIONED BY (region) AS
      SELECT id, concat('n-', id) AS name, concat('r', id % 2) AS region
      FROM range(10)""")
    val back = spark.table("ctas.t1")
    assert(back.count() == 10)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "region"))
    assert(WeatherLakeV2Sink.payloadFormat(s"$warehouse/t1") == "parquet")
    // the published marker is un-staged; the data was committed first
    assert(!LakeCatalog.markerStaged(
      new org.apache.hadoop.conf.Configuration(), s"$warehouse/t1"))
    // CTAS of an existing name is loud
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE ctas.t1 USING lake AS SELECT 1 AS a"))
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
  }

  test("a FAILING CTAS leaves NO table and no claimed directory — and " +
      "a crashed stage (claim with no commit) is reclaimed by the next " +
      "CREATE of the name") {
    warehouse
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE ctas.t2 USING lake AS
        SELECT id, raise_error('boom') AS b FROM range(3)"""))
    assert(e.getMessage != null)
    assert(!spark.catalog.tableExists("ctas.t2"))
    // simulate a CRASH mid-stage: write the staged claim by hand
    val conf = new org.apache.hadoop.conf.Configuration()
    val props = new java.util.HashMap[String, String]()
    props.put("location", s"$warehouse/t3")
    LakeCatalog.writeMarker(conf, s"$warehouse/t3", props, staged = true,
      stageId = Some("dead-stage"))
    // invisible to existence checks and listings
    assert(!spark.catalog.tableExists("ctas.t3"))
    assert(!spark.sql("SHOW TABLES IN ctas").collect()
      .map(_.getString(1)).contains("t3"))
    // a YOUNG staged claim still reserves the name: the next CREATE of it
    // loses loudly on the create-only marker rename rather than
    // destroying a possibly-live stage's claim mid-write
    val eYoung = intercept[Exception](spark.sql(
      "CREATE TABLE ctas.t3 USING lake AS SELECT 7 AS x"))
    assert(eYoung.getMessage.contains("concurrent table creation"),
      eYoung.getMessage)
    // once the claim is older than the reclaim window it is a dead stage:
    // the next CREATE of the name reclaims it and succeeds
    val fs = new org.apache.hadoop.fs.Path(warehouse).getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(
      s"$warehouse/t3", LakeCatalog.MarkerFile)
    val old = System.currentTimeMillis() -
      LakeCatalog.StageReclaimDefaultMs - 60000L
    fs.setTimes(marker, old, old)
    spark.sql("CREATE TABLE ctas.t3 USING lake AS SELECT 7 AS x")
    assert(spark.table("ctas.t3").collect().map(_.getInt(0)).toSeq == Seq(7))
  }

  test("a stage whose claim was replaced underneath it fails LOUDLY at " +
      "commit instead of clobbering the winner's marker") {
    warehouse
    val conf = new org.apache.hadoop.conf.Configuration()
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty[String], "t8")
    val cat = spark.sessionState.catalogManager.catalog("ctas")
      .asInstanceOf[LakeCatalog]
    val staged = cat.stageCreate(ident,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.IntegerType))),
      Array.empty, new java.util.HashMap[String, String]())
    // an interloper replaces the claim (what an unconditional reclaim +
    // re-stage used to produce)
    val props = new java.util.HashMap[String, String]()
    props.put("location", s"$warehouse/t8")
    LakeCatalog.writeMarker(conf, s"$warehouse/t8", props, overwrite = true,
      staged = true, stageId = Some("interloper"))
    val e = intercept[IllegalStateException](staged.commitStagedChanges())
    assert(e.getMessage.contains("lost its staged claim"), e.getMessage)
    // abort must NOT delete the interloper's claim either
    staged.abortStagedChanges()
    assert(LakeCatalog.markerStageId(conf, s"$warehouse/t8")
      .contains("interloper"))
  }

  test("RTAS: REPLACE TABLE AS SELECT swaps data and schema in one " +
      "statement; an aborted RTAS leaves the table byte-identical; the " +
      "payload kind may not change") {
    warehouse
    spark.sql("""CREATE TABLE ctas.t4 USING lake AS
      SELECT id AS a, id * 2 AS b FROM range(5)""")
    assert(spark.table("ctas.t4").count() == 5)
    spark.sql("""REPLACE TABLE ctas.t4 USING lake AS
      SELECT id AS a, concat('v-', id) AS v FROM range(3)""")
    val back = spark.table("ctas.t4")
    assert(back.schema.fieldNames.toSeq == Seq("a", "v"))
    assert(back.count() == 3)
    // old generation superseded, ONE overwrite manifest live
    assert(WeatherLakeV2Sink.liveManifests(s"$warehouse/t4").size == 1)
    // failing RTAS: table untouched (write buffered, nothing published)
    val before = WeatherLakeV2Sink.manifestNames(s"$warehouse/t4")
    intercept[Exception](spark.sql(
      """REPLACE TABLE ctas.t4 USING lake AS
        SELECT id AS a, raise_error('kaboom') AS v FROM range(2)"""))
    assert(WeatherLakeV2Sink.manifestNames(s"$warehouse/t4") == before)
    assert(spark.table("ctas.t4").count() == 3)
    assert(spark.table("ctas.t4").schema.fieldNames.toSeq == Seq("a", "v"))
    // classic → typed payload change is refused loudly
    spark.sql("""CREATE TABLE ctas.t5
      (city STRING, ds STRING, hour STRING, value STRING) USING lake""")
    val e = intercept[Exception](spark.sql(
      "REPLACE TABLE ctas.t5 USING lake AS SELECT 1 AS a"))
    assert(e.getMessage.contains("payload kind"), e.getMessage)
  }

  test("CREATE OR REPLACE routes to create when absent and replace when " +
      "present; a managed CREATE over a foreign data directory refuses") {
    warehouse
    spark.sql("""CREATE OR REPLACE TABLE ctas.t6 USING lake AS
      SELECT id AS k FROM range(4)""")
    assert(spark.table("ctas.t6").count() == 4)
    spark.sql("""CREATE OR REPLACE TABLE ctas.t6 USING lake AS
      SELECT id AS k FROM range(2)""")
    assert(spark.table("ctas.t6").count() == 2)
    // a renamed table's original directory holds _manifests without a
    // marker: a managed CREATE there must not silently adopt the data
    spark.sql("CREATE TABLE ctas.t7 (a INT) USING lake")
    spark.sql("INSERT INTO ctas.t7 VALUES (1)")
    spark.sql("ALTER TABLE ctas.t7 RENAME TO t7moved")
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE ctas.t7 (a INT) USING lake"))
    assert(e.getMessage.contains("_manifests"), e.getMessage)
    assert(spark.table("ctas.t7moved").count() == 1)
  }
}
