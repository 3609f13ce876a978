package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{LakeCatalog, WeatherLakeV2Sink}

/** The DSv2 TableCatalog face of the manifest lake: identifier-addressed
  * tables (CREATE/INSERT/SELECT/DML), time travel via the engine's
  * VERSION/TIMESTAMP AS OF, maintenance via CALL procedures, and the
  * catalog metadata lifecycle (drop/rename/external adoption).
  */
class LakeCatalogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("lakecat_wh").toString
    spark.conf.set("spark.sql.catalog.lakecat",
      classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakecat.warehouse", w)
    w
  }

  private def createTable(name: String, tblProps: String = ""): Unit = {
    warehouse
    spark.sql(s"""CREATE TABLE lakecat.$name
      (city STRING, ds STRING, hour STRING, value STRING)
      USING lake $tblProps""")
  }

  private def insert(name: String, rows: (String, Long, Long)*): Unit =
    spark.sql(s"INSERT INTO lakecat.$name VALUES " + rows.map {
      case (c, k, v) =>
        s"""('$c', '2024-01-01', '00', '{"k": $k, "v": $v}')"""
    }.mkString(", "))

  private def state(name: String): Map[Long, Long] =
    spark.sql(s"""SELECT CAST(get_json_object(value, '$$.k') AS BIGINT) AS k,
        CAST(get_json_object(value, '$$.v') AS BIGINT) AS v
        FROM lakecat.$name""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("CREATE TABLE + INSERT INTO + SELECT roundtrip; partition columns " +
      "are recovered from the file paths; SHOW TABLES lists it") {
    createTable("t1")
    insert("t1", ("a", 1L, 10L), ("b", 2L, 20L))
    val rows = spark.sql(
      "SELECT city, ds, hour, value FROM lakecat.t1 ORDER BY city").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows.forall(r => r.getString(1) == "2024-01-01" &&
      r.getString(2) == "00"))
    assert(state("t1") == Map(1L -> 10L, 2L -> 20L))
    val listed = spark.sql("SHOW TABLES IN lakecat")
      .collect().map(_.getString(1)).toSet
    assert(listed.contains("t1"))
  }

  test("a non-classic schema creates a TYPED (Parquet-payload) table — " +
      "the classic fixed-shape path is unchanged, and the typed-table " +
      "shape rules still refuse loudly") {
    warehouse
    // round 12 on: arbitrary schemas are the TYPED table face
    spark.sql("CREATE TABLE lakecat.typed_ok (x INT, y STRING) USING lake")
    assert(spark.table("lakecat.typed_ok").schema.fieldNames.toSeq ==
      Seq("x", "y"))
    // typed shape rules are still loud: partition cols must be a suffix
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE lakecat.bad (x INT, y STRING) USING lake
        PARTITIONED BY (x)"""))
    assert(e.getMessage.contains("LAST columns"), e.getMessage)
  }

  test("partition-equality filters prune the planned FILE LIST; every " +
      "filter stays residual so survivors are still row-filtered") {
    createTable("t2")
    insert("t2", ("a", 1L, 10L))
    insert("t2", ("b", 2L, 20L))
    insert("t2", ("b", 3L, 30L))
    // unit-level: the scan builder plans fewer partitions under the
    // pushed equality (2 files under city=b, 1 under city=a)
    val path = s"$warehouse/t2"
    val builder = new LakeCatalog.LakeTableScanBuilder(path, None,
      CaseInsensitiveStringMap.empty())
    val all = builder.build().toBatch.planInputPartitions().length
    val pruned = new LakeCatalog.LakeTableScanBuilder(path, None,
      CaseInsensitiveStringMap.empty()) {
        pushFilters(Array(org.apache.spark.sql.sources.EqualTo("city", "b")))
      }.build().toBatch.planInputPartitions().length
    assert(all == 3 && pruned == 2)
    // end-to-end row parity through SQL
    assert(spark.sql(
      "SELECT count(*) FROM lakecat.t2 WHERE city = 'b'").head.getLong(0) == 2)
  }

  test("VERSION AS OF / TIMESTAMP AS OF time-travel through the engine's " +
      "own clause; DML on a pinned read refuses") {
    createTable("t3")
    insert("t3", ("a", 1L, 10L))
    Thread.sleep(1100) // distinct manifest mtimes for the timestamp probe
    val betweenMs = System.currentTimeMillis()
    insert("t3", ("a", 2L, 20L))
    assert(spark.sql("SELECT count(*) FROM lakecat.t3 VERSION AS OF 0")
      .head.getLong(0) == 1)
    assert(spark.sql("SELECT count(*) FROM lakecat.t3 VERSION AS OF 1")
      .head.getLong(0) == 2)
    val ts = java.time.Instant.ofEpochMilli(betweenMs)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
      s"SELECT count(*) FROM lakecat.t3 TIMESTAMP AS OF '$ts'")
      .head.getLong(0) == 1)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM lakecat.t3 TIMESTAMP AS OF '1999-01-01 00:00:00'")
        .collect()
    }
    assert(e.getMessage.contains("no commit"))
  }

  test("statsFields table property feeds the data-skipping layer on " +
      "every INSERT (manifest entries carry per-file min/max)") {
    createTable("t4", "TBLPROPERTIES ('statsFields' = 'k')")
    insert("t4", ("a", 5L, 50L))
    val lines = WeatherLakeV2Sink.committedEntryLines(s"$warehouse/t4")
    assert(lines.nonEmpty && lines.forall(l =>
      WeatherLakeV2Sink.lineStats(l).contains("k")))
  }

  test("MERGE INTO / DELETE FROM / UPDATE dispatch against catalog " +
      "identifiers, parameterized by table properties") {
    createTable("t5", "TBLPROPERTIES ('statsFields' = 'k')")
    insert("t5", ("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
    val s = spark
    import s.implicits._
    Seq(("a", "2024-01-01", "00", """{"k": 2, "v": 200}"""),
        ("c", "2024-01-02", "01", """{"k": 9, "v": 90}"""))
      .toDF("city", "ds", "hour", "raw_json")
      .createOrReplaceTempView("t5_delta")
    spark.sql("""MERGE INTO lakecat.t5 t USING t5_delta s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED THEN UPDATE SET value = s.raw_json
      WHEN NOT MATCHED THEN
        INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    assert(state("t5") == Map(1L -> 10L, 2L -> 200L, 3L -> 30L, 9L -> 90L))
    spark.sql("DELETE FROM lakecat.t5 " +
      "WHERE CAST(get_json_object(value, '$.k') AS BIGINT) = 1")
    spark.sql("""UPDATE lakecat.t5 SET value = to_json(named_struct(
        'k', CAST(get_json_object(value, '$.k') AS BIGINT),
        'v', CAST(get_json_object(value, '$.v') AS BIGINT) + 1))
      WHERE CAST(get_json_object(value, '$.k') AS BIGINT) = 3""")
    assert(state("t5") == Map(2L -> 200L, 3L -> 31L, 9L -> 90L))
  }

  test("CALL lakecat.system.history is DESCRIBE HISTORY: version-ordered " +
      "commits with their #op and liveness") {
    createTable("t6")
    insert("t6", ("a", 1L, 10L))
    spark.sql("DELETE FROM lakecat.t6 " +
      "WHERE CAST(get_json_object(value, '$.k') AS BIGINT) = 99")
    insert("t6", ("a", 2L, 20L))
    val h = spark.sql("CALL lakecat.system.history('t6')").collect()
    assert(h.map(_.getInt(0)).toSeq == h.indices.toSeq)
    assert(h.map(_.getString(2)).toSet.subsetOf(Set("append", "delete")))
    assert(h.forall(_.getBoolean(4))) // no-op delete publishes nothing
    assert(h.length == 2)
  }

  test("CALL compact / checkpoint / vacuum / sweep_orphans run the " +
      "maintenance ops and return their counts") {
    createTable("t7")
    insert("t7", ("a", 1L, 10L))
    insert("t7", ("a", 2L, 20L)) // two small files in one directory
    val compacted = spark.sql(
      "CALL lakecat.system.compact('t7')").head.getInt(0)
    assert(compacted == 1)
    insert("t7", ("a", 3L, 30L)) // a second live manifest to collapse
    val collapsed = spark.sql(
      "CALL lakecat.system.checkpoint('t7')").head.getInt(0)
    assert(collapsed == 2)
    val reclaimed = spark.sql(
      "CALL lakecat.system.vacuum('t7', min_age_ms => 0, force => true)").head.getInt(0)
    assert(reclaimed >= 1)
    // the op's own mandatory positive age guard rides through the CALL
    intercept[Exception](spark.sql("CALL lakecat.system.sweep_orphans('t7', 0)"))
    val swept = spark.sql(
      "CALL lakecat.system.sweep_orphans('t7', 3600000)").head.getInt(0)
    assert(swept == 0)
    assert(state("t7") == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
  }

  test("CALL compact with cluster_expr ZORDER-sorts the rewrite and " +
      "re-measures stats") {
    createTable("t8", "TBLPROPERTIES ('statsFields' = 'k')")
    insert("t8", ("a", 1L, 10L), ("a", 4L, 40L))
    insert("t8", ("a", 2L, 20L), ("a", 3L, 30L))
    val n = spark.sql("""CALL lakecat.system.compact('t8',
      cluster_expr => "CAST(get_json_object(value, '$.k') AS BIGINT)",
      stats_fields => 'k')""").head.getInt(0)
    assert(n == 1)
    assert(state("t8") == Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L))
    val lines = WeatherLakeV2Sink.committedEntryLines(s"$warehouse/t8")
    assert(lines.forall(l => WeatherLakeV2Sink.lineStats(l).contains("k")))
  }

  test("an unknown procedure refuses with the available list") {
    warehouse
    val e = intercept[Exception] {
      spark.sql("CALL lakecat.system.frobnicate('t1')")
    }
    assert(e.getMessage.contains("unknown procedure") ||
      e.getMessage.contains("frobnicate"))
  }

  test("DROP TABLE deletes a managed table's data but only un-registers " +
      "an external one; LOCATION adopts a pre-catalog lake") {
    warehouse
    // a pre-catalog lake written through the plain V2 sink
    val external = Files.createTempDirectory("lakecat_ext").toString
    val s = spark
    import s.implicits._
    Seq(("x", 1L)).toDF("city", "k").select(col("city"),
        lit("2024-01-01").as("ds"), lit("00").as("hour"),
        to_json(struct(col("k"))).as("raw_json"))
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append")
      .save(external)
    spark.sql(s"""CREATE TABLE lakecat.adopted
      (city STRING, ds STRING, hour STRING, value STRING)
      USING lake LOCATION '$external'""")
    assert(spark.sql("SELECT count(*) FROM lakecat.adopted").head.getLong(0) == 1)
    spark.sql("DROP TABLE lakecat.adopted")
    // data survives an external drop; the registration does not
    assert(WeatherLakeV2Sink.committedFiles(external).nonEmpty)
    assert(intercept[Exception](
      spark.sql("SELECT * FROM lakecat.adopted").collect()) != null)
    // managed: the directory goes with the table
    createTable("doomed")
    insert("doomed", ("a", 1L, 1L))
    spark.sql("DROP TABLE lakecat.doomed")
    assert(!new java.io.File(s"$warehouse/doomed").exists())
  }

  test("ALTER TABLE SET TBLPROPERTIES mutates properties; schema changes " +
      "refuse; RENAME re-points the registration (data never moves — " +
      "manifest paths are absolute)") {
    createTable("t9")
    spark.sql("ALTER TABLE lakecat.t9 SET TBLPROPERTIES ('statsFields' = 'k')")
    insert("t9", ("a", 7L, 70L))
    assert(WeatherLakeV2Sink.committedEntryLines(s"$warehouse/t9")
      .forall(l => WeatherLakeV2Sink.lineStats(l).contains("k")))
    // ADD COLUMN is typed-table schema evolution; the classic fixed
    // shape refuses it (TypedLakeCatalogSpec pins the typed behavior)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakecat.t9 ADD COLUMN extra STRING")
    }
    assert(e.getMessage.contains("typed tables only"), e.getMessage)
    spark.sql("ALTER TABLE lakecat.t9 RENAME TO t9_renamed")
    assert(state("t9_renamed") == Map(7L -> 70L))
    // old name is gone; the data directory stays where the manifests
    // point (absolute paths) and keeps serving the new registration
    intercept[Exception](spark.sql("SELECT * FROM lakecat.t9").collect())
    assert(new java.io.File(s"$warehouse/t9").exists())
    assert(WeatherLakeV2Sink.committedFiles(s"$warehouse/t9").nonEmpty)
  }

  test("readStream.table honors the stream options through the " +
      "CaseInsensitiveStringMap plumbing: startingAt='latest' skips the " +
      "backlog, maxManifestsPerTrigger caps admission, and scan-prune " +
      "options reach the file selection — the view-face contract, " +
      "identifier-addressed") {
    createTable("t20")
    insert("t20", ("a", 1L, 10L)) // backlog commit, skipped by latest
    val out = Files.createTempDirectory("lakecat_opt_out").toString
    val cp = Files.createTempDirectory("lakecat_opt_cp").toString
    def drain(): Unit = {
      val q = spark.readStream
        .option("startingAt", "latest")
        .option("maxManifestsPerTrigger", "1")
        .option("prunePartition", "city=a") // scan-prune: only city=a opens
        .table("lakecat.t20")
        .writeStream.format("parquet")
        .option("checkpointLocation", cp)
        .option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    drain() // latest: the backlog commit is NOT replayed
    assert(spark.read.schema("city STRING, ds STRING, hour STRING, " +
      "value STRING").parquet(out).count() == 0)
    insert("t20", ("a", 2L, 20L))
    insert("t20", ("b", 3L, 30L)) // pruned out by pruneCity=a
    drain()
    val got = spark.read.parquet(out)
    assert(got.count() == 1 && got.head.getString(0) == "a")
    // a malformed option is loud, not ignored
    val bad = intercept[Exception] {
      spark.readStream.option("maxManifestsPerTrigger", "zero")
        .table("lakecat.t20").writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("lakecat_bad_cp").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    val chain = Iterator.iterate(bad: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("maxManifestsPerTrigger"), chain)
  }

  test("readChangeFeed through table() reads is refused LOUDLY (batch " +
      "and streaming) — the feed's schema differs from the table's; the " +
      "message names the view-face alternative") {
    createTable("t21", "TBLPROPERTIES ('changeLog' = 'true')")
    insert("t21", ("a", 1L, 10L))
    val eb = intercept[Exception] {
      spark.read.option("readChangeFeed", "true")
        .option("startingVersion", "0").table("lakecat.t21").collect()
    }
    assert(eb.getMessage.contains("view face"), eb.getMessage)
    val es = intercept[Exception] {
      spark.readStream.option("readChangeFeed", "true")
        .table("lakecat.t21").writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("lakecat_cdc_cp").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    val chain = Iterator.iterate(es: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("view face"), chain)
  }

  test("readStream.table streams the four-column shape from the " +
      "manifest-set micro-batch source") {
    createTable("t10")
    insert("t10", ("a", 1L, 10L))
    val out = Files.createTempDirectory("lakecat_strm_out").toString
    val cp = Files.createTempDirectory("lakecat_strm_cp").toString
    val q = spark.readStream.table("lakecat.t10")
      .writeStream.format("parquet")
      .option("checkpointLocation", cp)
      .option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("city", "ds", "hour", "value"))
    assert(got.count() == 1 && got.head.getString(0) == "a")
  }

  test("INSERT OVERWRITE replaces the committed view in one superseding " +
      "commit; the pre-overwrite version still time-travels") {
    createTable("t12")
    insert("t12", ("a", 1L, 10L), ("b", 2L, 20L))
    spark.sql("""INSERT OVERWRITE lakecat.t12
      VALUES ('c', '2024-02-01', '01', '{"k": 9, "v": 90}')""")
    assert(state("t12") == Map(9L -> 90L))
    val live = WeatherLakeV2Sink.liveManifests(s"$warehouse/t12")
    assert(live.size == 1 && live.head.startsWith("manifest-overwrite-"))
    assert(spark.sql("SELECT count(*) FROM lakecat.t12 VERSION AS OF 0")
      .head.getLong(0) == 2)
    // history procedure shows the overwrite op
    val ops = spark.sql("CALL lakecat.system.history('t12')")
      .collect().map(_.getString(2)).toSeq
    assert(ops == Seq("append", "overwrite"))
  }

  test("partition-scoped overwrite: INSERT OVERWRITE ... PARTITION " +
      "replaces only the named region, dynamic mode replaces the written " +
      "partitions, and writing outside a replaceWhere region refuses") {
    createTable("t13")
    insert("t13", ("a", 1L, 10L), ("b", 2L, 20L))
    // static partition overwrite: city=a replaced, city=b re-listed
    spark.sql("""INSERT OVERWRITE lakecat.t13 PARTITION (city = 'a')
      SELECT '2024-01-01', '00', '{"k": 5, "v": 50}'""")
    assert(state("t13") == Map(5L -> 50L, 2L -> 20L))
    // dynamic: only the partitions the batch writes are replaced
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql("""INSERT OVERWRITE lakecat.t13
      SELECT 'b', '2024-01-01', '00', '{"k": 7, "v": 70}'""")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(state("t13") == Map(5L -> 50L, 7L -> 70L))
    // replaceWhere validation: the batch must stay inside the region
    val s = spark
    import s.implicits._
    val foreign = Seq(("b", "2024-01-01", "00", """{"k": 9, "v": 90}"""))
      .toDF("city", "ds", "hour", "value")
    val e = intercept[Exception] {
      foreign.writeTo("lakecat.t13").overwrite(col("city") === "a")
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(t => Option(t.getMessage).exists(
      _.contains("OUTSIDE"))), s"got: $e")
    assert(state("t13") == Map(5L -> 50L, 7L -> 70L))
    // history shows the overwrite commits, and version 0 still reads
    val ops = spark.sql("CALL lakecat.system.history('t13')")
      .collect().map(_.getString(2)).toSeq
    assert(ops == Seq("append", "overwrite", "overwrite"))
    assert(spark.sql("SELECT count(*) FROM lakecat.t13 VERSION AS OF 0")
      .head.getLong(0) == 2)
  }

  test("CALL measure_stats backfills the skipping layer through the " +
      "catalog; CTAS creates and seeds a table in one statement") {
    createTable("t14") // no statsFields property — pre-stats data
    insert("t14", ("a", 1L, 10L))
    val n = spark.sql(
      "CALL lakecat.system.measure_stats('t14', 'k')").head.getInt(0)
    assert(n == 1)
    assert(WeatherLakeV2Sink.committedEntryLines(s"$warehouse/t14")
      .forall(l => WeatherLakeV2Sink.lineStats(l).contains("k")))
    assert(state("t14") == Map(1L -> 10L))
    // CTAS with the classic shape lands on the classic JSON-line face
    // (atomic via the staged marker, LakeCtasSpec pins the protocol)
    spark.sql("""CREATE TABLE lakecat.t15 USING lake AS
      SELECT city, ds, hour, value FROM lakecat.t14""")
    assert(state("t15") == Map(1L -> 10L))
    assert(WeatherLakeV2Sink.payloadFormat(s"$warehouse/t15") == "json")
    // a non-classic CTAS shape is a TYPED table
    spark.sql("CREATE TABLE lakecat.t16 USING lake AS SELECT 1 AS x")
    assert(WeatherLakeV2Sink.payloadFormat(s"$warehouse/t16") == "parquet")
    assert(spark.table("lakecat.t16").count() == 1)
  }

  test("guard rails: nested-namespace DROP refuses without CASCADE, a " +
      "data directory is never a namespace, NULL partition values refuse " +
      "at write, and the location property is immutable both ways") {
    warehouse
    // nested namespace holds a table invisible to a direct-child scan —
    // a non-cascade drop must refuse, not recursively destroy it
    spark.sql("CREATE NAMESPACE lakecat.outer.inner")
    spark.sql("""CREATE TABLE lakecat.outer.inner.nested
      (city STRING, ds STRING, hour STRING, value STRING) USING lake""")
    spark.sql("""INSERT INTO lakecat.outer.inner.nested
      VALUES ('a', '2024-01-01', '00', '{"k":1}')""")
    val e1 = intercept[Exception](spark.sql("DROP NAMESPACE lakecat.outer"))
    assert(e1.getMessage.contains("not empty"), e1.getMessage)
    assert(spark.sql("SELECT count(*) FROM lakecat.outer.inner.nested")
      .head.getLong(0) == 1)
    // a renamed managed table's original DATA directory must not surface
    // as a namespace (nor be droppable as one)
    createTable("t17")
    insert("t17", ("a", 1L, 10L))
    spark.sql("ALTER TABLE lakecat.t17 RENAME TO t17_new")
    val namespaces = spark.sql("SHOW NAMESPACES IN lakecat")
      .collect().map(_.getString(0)).toSet
    assert(!namespaces.contains("t17"), namespaces.toString)
    val e2 = intercept[Exception](spark.sql("DROP NAMESPACE lakecat.t17"))
    assert(e2.getMessage.contains("holds table data"), e2.getMessage)
    assert(state("t17_new") == Map(1L -> 10L))
    // NULL partition values refuse at the writer instead of becoming the
    // literal string "null" in the path
    val e3 = intercept[Exception] {
      spark.sql("""INSERT INTO lakecat.t17_new
        VALUES (NULL, '2024-01-01', '00', '{"k":9}')""")
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e3).exists(t => Option(t.getMessage).exists(
      _.contains("NULL in write column"))), s"got: $e3")
    // location is immutable via REMOVE as well as SET
    val cat = spark.sessionState.catalogManager.catalog("lakecat")
      .asInstanceOf[LakeCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "t17_new")
    val e4 = intercept[Exception] {
      cat.alterTable(ident, org.apache.spark.sql.connector.catalog
        .TableChange.removeProperty("location"))
    }
    assert(e4.getMessage.contains("immutable"), e4.getMessage)
  }

  test("DROP NAMESPACE CASCADE refuses when the subtree holds a renamed " +
      "table's original data directory — the still-live registration " +
      "elsewhere would be left pointing at deleted data") {
    warehouse
    spark.sql("CREATE NAMESPACE lakecat.ns18")
    spark.sql("""CREATE TABLE lakecat.ns18.src
      (city STRING, ds STRING, hour STRING, value STRING) USING lake""")
    spark.sql("""INSERT INTO lakecat.ns18.src
      VALUES ('a', '2024-01-01', '00', '{"k":1,"v":10}')""")
    // registration moves out of the namespace; the DATA stays at
    // warehouse/ns18/src (manifest entry lines carry absolute paths)
    spark.sql("CREATE NAMESPACE lakecat.kept18")
    spark.sql("ALTER TABLE lakecat.ns18.src RENAME TO kept18.t18")
    val e = intercept[Exception](
      spark.sql("DROP NAMESPACE lakecat.ns18 CASCADE"))
    assert(e.getMessage.contains("registration"), e.getMessage)
    assert(state("kept18.t18") == Map(1L -> 10L)) // data survived the refusal
    // a namespace whose tables are all its OWN still cascades away
    spark.sql("CREATE NAMESPACE lakecat.ns19")
    spark.sql("""CREATE TABLE lakecat.ns19.own
      (city STRING, ds STRING, hour STRING, value STRING) USING lake""")
    spark.sql("""INSERT INTO lakecat.ns19.own
      VALUES ('a', '2024-01-01', '00', '{"k":2,"v":20}')""")
    spark.sql("DROP NAMESPACE lakecat.ns19 CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN lakecat")
      .collect().map(_.getString(0)).contains("ns19"))
  }

  test("CALL detail reports table health in one row") {
    createTable("t18", "TBLPROPERTIES ('statsFields' = 'k')")
    insert("t18", ("a", 1L, 10L))
    insert("t18", ("b", 2L, 20L))
    val d = spark.sql("CALL lakecat.system.detail('t18')").head
    assert(d.getString(0) == s"$warehouse/t18")
    assert(d.getInt(1) == 2)       // num_files
    assert(d.getLong(2) > 0)       // size_bytes
    assert(d.getInt(3) == 2)       // num_partitions (city=a, city=b)
    assert(d.getInt(4) == 2 && d.getInt(5) == 2) // live == total (no GC yet)
    assert(d.getInt(6) == 2)       // statsFields covered every file
  }

  test("full medallion lifecycle through the CATALOG face: bronze DML " +
      "feeds a capped CDC stream into silver, and CALL maintenance " +
      "keeps both healthy without disturbing the caught-up feed") {
    createTable("bronze", "TBLPROPERTIES ('changeLog' = 'true')")
    createTable("silver")
    insert("bronze", ("a", 1L, 10L), ("b", 2L, 20L))
    insert("bronze", ("a", 3L, 30L))
    // CDC apply: the change feed of the CATALOG-created bronze lake
    // drains into silver exactly-once (the APPLY CHANGES INTO consumer)
    val cp = Files.createTempDirectory("lakecat_medallion_cp").toString
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.sources.WeatherLakeV2StreamSource")
        .option("readChangeFeed", "true")
        .option("maxManifestsPerTrigger", "1") // capped, multi-batch drain
        .load(s"$warehouse/bronze")
        .writeStream
        .foreachBatch(WeatherLakeV2Sink.applyChangesWriter(
          s"$warehouse/silver", "catalog-medallion",
          key = f => get_json_object(f("raw_json"), "$.k"),
          route = v => (lit("s"), lit("2024-01-01"), lit("00"))))
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()
    assert(state("silver") == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // bronze DML (delete + merge via identifiers) flows through the feed
    spark.sql("DELETE FROM lakecat.bronze " +
      "WHERE CAST(get_json_object(value, '$.k') AS BIGINT) = 2")
    val s = spark
    import s.implicits._
    Seq(("a", "2024-01-01", "00", """{"k": 1, "v": 100}"""))
      .toDF("city", "ds", "hour", "raw_json")
      .createOrReplaceTempView("bronze_delta")
    spark.sql("""MERGE INTO lakecat.bronze t USING bronze_delta s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED THEN UPDATE SET value = s.raw_json
      WHEN NOT MATCHED THEN
        INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    drain()
    assert(state("silver") == Map(1L -> 100L, 3L -> 30L))
    // CALL maintenance on both tables; the caught-up feed survives it
    spark.sql("CALL lakecat.system.checkpoint('bronze')")
    spark.sql("CALL lakecat.system.vacuum('bronze', min_age_ms => 0, force => true)")
    spark.sql("CALL lakecat.system.checkpoint('silver')")
    drain() // nothing new, nothing replayed
    assert(state("silver") == Map(1L -> 100L, 3L -> 30L))
    assert(spark.sql("CALL lakecat.system.detail('silver')")
      .head.getInt(1) > 0)
  }

  test("a second CREATE TABLE of the same name refuses; IF NOT EXISTS " +
      "is silent") {
    createTable("t11")
    intercept[Exception](createTable("t11"))
    spark.sql("""CREATE TABLE IF NOT EXISTS lakecat.t11
      (city STRING, ds STRING, hour STRING, value STRING) USING lake""")
  }
}
