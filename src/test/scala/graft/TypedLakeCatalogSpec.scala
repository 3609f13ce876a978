package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{LakeCatalog, WeatherLakeV2Sink}

/** The typed lake behind the CATALOG face: CREATE TABLE with an arbitrary
  * schema, INSERT/SELECT through the engine's own Parquet scan (column
  * pruning + filter pushdown reach the data files), full SQL DML
  * (MERGE incl. WHEN NOT MATCHED BY SOURCE, DELETE, UPDATE with
  * multi-column SET), time travel, and the maintenance CALLs.
  */
class TypedLakeCatalogSpec extends SparkSpec {
  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("typedcatwh").toString
    spark.conf.set("spark.sql.catalog.tlake", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.tlake.warehouse", w)
    w
  }

  private def createEvents(t: String): Unit = {
    warehouse
    spark.sql(s"""CREATE TABLE tlake.$t (
      id BIGINT, name STRING, score DOUBLE, ts TIMESTAMP,
      region STRING, day DATE)
      USING lake PARTITIONED BY (region, day)
      TBLPROPERTIES ('statsFields' = 'id,score')""")
  }

  private def seed(t: String, n: Int): Unit =
    spark.sql(s"""INSERT INTO tlake.$t
      SELECT id, concat('n-', id) AS name, id * 1.5 AS score,
        timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts,
        concat('r', id % 3) AS region,
        date_add(date'2024-01-01', CAST(id % 2 AS INT)) AS day
      FROM range($n)""")

  test("CREATE a typed table, INSERT, SELECT: every typed column round-" +
      "trips, files are Parquet, stats ride the manifest, and the classic " +
      "shape still creates classic tables") {
    createEvents("t1")
    seed("t1", 30)
    val back = spark.table("tlake.t1")
    assert(back.schema.fieldNames.toSeq ==
      Seq("id", "name", "score", "ts", "region", "day"))
    assert(back.count() == 30)
    val r7 = back.filter(col("id") === 7).collect().head
    assert(r7.getString(1) == "n-7" && r7.getDouble(2) == 10.5)
    assert(r7.getTimestamp(3).toInstant.toString == "2024-01-01T00:00:07Z")
    assert(r7.getString(4) == "r1" &&
      r7.getDate(5) == java.sql.Date.valueOf("2024-01-02"))
    val p = s"$warehouse/t1"
    assert(WeatherLakeV2Sink.payloadFormat(p) == "parquet")
    assert(WeatherLakeV2Sink.committedFiles(p).forall(f =>
      f.endsWith(".parquet") && f.contains("region=") && f.contains("day=")))
    assert(WeatherLakeV2Sink.committedEntryLines(p).forall(l =>
      WeatherLakeV2Sink.lineStats(l).contains("id")))
    // aggregate over typed columns, no JSON parsing anywhere
    val agg = spark.sql(
      "SELECT region, sum(score) AS s FROM tlake.t1 GROUP BY region")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(agg.keySet == Set("r0", "r1", "r2"))
    // classic shape still routes to the classic table
    spark.sql("""CREATE TABLE tlake.classic1
      (city STRING, ds STRING, hour STRING, value STRING) USING lake""")
    spark.sql("""INSERT INTO tlake.classic1
      VALUES ('a', '2024-01-01', '00', '{"k":1}')""")
    assert(WeatherLakeV2Sink.payloadFormat(s"$warehouse/classic1") == "json")
  }

  test("column pruning and partition+data filter pushdown reach the " +
      "Parquet scan; partition filters prune at the file-index level") {
    createEvents("t2")
    seed("t2", 30)
    val q = spark.sql(
      "SELECT name FROM tlake.t2 WHERE region = 'r1' AND id > 10")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(id)"),
      plan)
    assert(plan.contains("GreaterThan(id,10)"), plan)
    // read schema pruned to the referenced data columns only
    assert(plan.contains("ReadSchema") && !plan.contains("score"), plan)
    assert(q.collect().map(_.getString(0)).toSet ==
      (11 until 30).filter(_ % 3 == 1).map(i => s"n-$i").toSet)
    // partition filter prunes partitions (no r0/r2 files scanned): the
    // scan description lists the partition filters it planned with
    assert(plan.contains("region"), plan)
  }

  test("typed MERGE INTO: conditional matched DELETE + UPDATE SET *, " +
      "guarded INSERT (real SQL three-valued semantics, no negated-guard " +
      "contract), and WHEN NOT MATCHED BY SOURCE THEN DELETE") {
    createEvents("t3")
    seed("t3", 20)
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW t3_cdc AS
      SELECT id, concat('upd-', id) AS name, id * 10.0 AS score,
        timestamp'2024-02-01 00:00:00' AS ts,
        concat('r', id % 3) AS region,
        date_add(date'2024-01-01', CAST(id % 2 AS INT)) AS day,
        CASE WHEN id < 3 THEN 'd' ELSE 'u' END AS op
      FROM range(25) WHERE id < 5 OR id >= 20""")
    val st = spark.sql("""MERGE INTO tlake.t3 t USING t3_cdc s
      ON t.id = s.id AND t.region = s.region AND t.day = s.day
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND s.op != 'd' THEN INSERT *""").collect().head
    assert(st.getInt(0) > 0)
    val m = spark.table("tlake.t3").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!m.contains(0L) && !m.contains(2L)) // deleted
    assert(m(3L) == "upd-3" && m(4L) == "upd-4") // updated
    assert(m(22L) == "upd-22" && m.size == 20 - 3 + 5)
    assert(m(10L) == "n-10") // untouched
    // full-sync: WHEN NOT MATCHED BY SOURCE THEN DELETE with a condition
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW t3_sync AS
      SELECT id, concat('s-', id) AS name, 0.0 AS score,
        timestamp'2024-03-01 00:00:00' AS ts, concat('r', id % 3) AS region,
        date_add(date'2024-01-01', CAST(id % 2 AS INT)) AS day
      FROM range(5)""")
    spark.sql("""MERGE INTO tlake.t3 t USING t3_sync s
      ON t.id = s.id AND t.region = s.region AND t.day = s.day
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.id < 100 THEN DELETE""")
    val after = spark.table("tlake.t3").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.keySet == Set(1L, 3L, 4L, 0L, 2L)
      .filter(_ < 5), after.keySet.toSeq.sorted.mkString(","))
    assert(after(1L) == "s-1" && after(0L) == "s-0")
  }

  test("typed DELETE and multi-column UPDATE through SQL, with partition-" +
      "equality prune derived from the typed WHERE clause") {
    createEvents("t4")
    seed("t4", 24)
    val del = spark.sql(
      "DELETE FROM tlake.t4 WHERE region = 'r2' AND id % 2 = 0")
      .collect().head
    assert(del.getLong(2) == 4, del) // ids 2,8,14,20
    assert(spark.table("tlake.t4").count() == 20)
    val upd = spark.sql("""UPDATE tlake.t4
      SET score = score * 100, name = concat(name, '!')
      WHERE day = date'2024-01-01' AND id >= 10""").collect().head
    assert(upd.getLong(2) == 5, upd) // even ids >= 10 minus deleted r2 evens
    val m = spark.table("tlake.t4").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(m(12L) == ("n-12!", 1800.0) && m(10L) == ("n-10!", 1500.0))
    assert(m(11L) == ("n-11", 16.5))
    // SET on an unknown column is loud
    val e = intercept[Exception](spark.sql(
      "UPDATE tlake.t4 SET nope = 1 WHERE id = 0"))
    assert(e.getMessage.contains("unknown column"), e.getMessage)
  }

  test("INSERT OVERWRITE (full and PARTITION-scoped) and VERSION AS OF " +
      "time travel on a typed table") {
    createEvents("t5")
    seed("t5", 12)
    // full overwrite supersedes the snapshot in one manifest
    spark.sql("""INSERT OVERWRITE tlake.t5
      SELECT id, concat('ow-', id) AS name, 1.0 AS score,
        timestamp'2024-05-01 00:00:00' AS ts, 'r0' AS region,
        date'2024-01-01' AS day
      FROM range(4)""")
    assert(spark.table("tlake.t5").count() == 4)
    assert(spark.table("tlake.t5").collect()
      .forall(_.getString(1).startsWith("ow-")))
    // version 0 still reads the seed through the pinned snapshot
    assert(spark.sql("SELECT * FROM tlake.t5 VERSION AS OF 0").count() == 12)
    // partition-scoped overwrite replaces ONE region, keeps the rest
    spark.sql("""INSERT OVERWRITE tlake.t5
      PARTITION (region = 'r0', day = date'2024-01-01')
      SELECT id + 100, concat('rw-', id) AS name, 2.0 AS score,
        timestamp'2024-06-01 00:00:00' AS ts
      FROM range(2)""")
    val names = spark.table("tlake.t5").collect().map(_.getString(1)).toSet
    assert(names == Set("rw-0", "rw-1"))
  }

  test("typed DYNAMIC partition overwrite replaces exactly the written " +
      "partitions (the batch's own tuples), keeps the rest, and an " +
      "append racing into a replaced partition would conflict (read " +
      "domain = the written region)") {
    createEvents("t5d")
    seed("t5d", 12)
    val s = spark
    import s.implicits._
    // rows land only in (r0, 2024-01-01): dynamic overwrite must replace
    // exactly that partition and keep every other one
    val batch = Seq((500L, "dyn", 1.0,
        java.sql.Timestamp.valueOf("2024-07-01 00:00:00"), "r0",
        java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "name", "score", "ts", "region", "day")
    batch.writeTo("tlake.t5d").overwritePartitions()
    val m = spark.table("tlake.t5d").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(500L) == "dyn")
    // seeds in (r0, 2024-01-01) are gone; everything else survives
    val gone = (0 until 12).filter(i => i % 3 == 0 && i % 2 == 0)
    assert(gone.forall(i => !m.contains(i.toLong)), m.keySet.toSeq.sorted)
    assert(m.size == 12 - gone.size + 1)
    // the overwrite commit is one superseding manifest
    assert(WeatherLakeV2Sink.manifestHistory(s"$warehouse/t5d")
      .exists(_.startsWith("manifest-overwrite-")))
  }

  test("maintenance CALLs on a typed table: checkpoint preserves the " +
      "payload declaration, vacuum reclaims, history and detail report; " +
      "ALTER cannot touch schema/partitioning properties") {
    createEvents("t6")
    seed("t6", 6)
    seed("t6", 6) // second commit (different manifestId via queryId)
    spark.sql("""INSERT INTO tlake.t6
      SELECT id + 50, 'x' AS name, 0.0 AS score,
        timestamp'2024-01-01 00:00:00' AS ts, 'r0' AS region,
        date'2024-01-01' AS day FROM range(3)""")
    val hist = spark.sql("CALL tlake.system.history('t6')").collect()
    assert(hist.length >= 2)
    val collapsed = spark.sql("CALL tlake.system.checkpoint('t6')")
      .collect().head.getInt(0)
    assert(collapsed >= 2)
    assert(WeatherLakeV2Sink.payloadFormat(s"$warehouse/t6") == "parquet")
    // a pure checkpoint re-lists every data file (all stay live), so
    // vacuum reclaims the superseded MANIFESTS, not data — the history
    // collapses to one manifest and the table is intact
    spark.sql("CALL tlake.system.vacuum('t6', min_age_ms => 0, force => true)")
    assert(WeatherLakeV2Sink.manifestNames(s"$warehouse/t6").size == 1)
    assert(spark.table("tlake.t6").count() == 15)
    val detail = spark.sql("CALL tlake.system.detail('t6')").collect().head
    assert(detail.getInt(1) > 0 && detail.getInt(4) == 1)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE tlake.t6 SET TBLPROPERTIES ('schemaJson' = '{}')"))
    assert(e.getMessage.contains("immutable"), e.getMessage)
    // property ALTER still works and the marker stays typed (format 2)
    spark.sql("ALTER TABLE tlake.t6 SET TBLPROPERTIES ('statsFields' = 'id')")
    assert(spark.table("tlake.t6").schema.fieldNames.length == 6)
  }

  test("CALL compact and measure_stats route to the typed (Parquet) " +
      "twins: ZORDER-clustered compaction over three key fields rewrites " +
      "small files, and the stats backfill measures typed column values " +
      "with type-decided numeric comparison") {
    createEvents("t8")
    seed("t8", 10); seed("t8", 10); seed("t8", 10) // small files pile up
    val before = WeatherLakeV2Sink.committedFiles(s"$warehouse/t8").size
    val dirs = spark.sql("""CALL tlake.system.compact('t8',
      cluster_expr => 'graft_zorder(id, CAST(score AS BIGINT), unix_micros(ts))',
      stats_fields => 'id')""").collect().head.getInt(0)
    assert(dirs > 0)
    assert(WeatherLakeV2Sink.committedFiles(s"$warehouse/t8").size < before)
    assert(spark.table("tlake.t8").count() == 30)
    // backfill stats for a column the writes never measured
    val measured = spark.sql(
      "CALL tlake.system.measure_stats('t8', 'name,score')")
      .collect().head.getInt(0)
    assert(measured > 0)
    val stats = WeatherLakeV2Sink.committedEntryLines(s"$warehouse/t8")
      .map(WeatherLakeV2Sink.lineStats)
    assert(stats.forall(st => st.contains("name") && st.contains("score")))
    assert(stats.forall(_.apply("score").numeric)) // type-decided
    assert(stats.forall(!_.apply("name").numeric))
    // the skipping layer stays queryable and correct after both verbs
    assert(spark.sql("SELECT sum(id) FROM tlake.t8").head.getLong(0) ==
      3 * (0 until 10).sum)
  }

  test("writeStream.toTable on a typed table: per-epoch manifests, " +
      "exactly-once named, typed Parquet files with stats") {
    warehouse
    spark.sql("""CREATE TABLE tlake.strm (id BIGINT, v DOUBLE, region STRING)
      USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('statsFields' = 'id')""")
    val src = Files.createTempDirectory("tstrm_src").toString
    val cp = Files.createTempDirectory("tstrm_cp").toString
    val s = spark
    import s.implicits._
    (0 until 8).map(i => (i.toLong, i * 0.5, s"r${i % 2}"))
      .toDF("id", "v", "region").write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema("id BIGINT, v DOUBLE, region STRING")
      .parquet(src)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("tlake.strm")
    q.awaitTermination(60000)
    assert(spark.table("tlake.strm").count() == 8)
    val p = s"$warehouse/strm"
    assert(WeatherLakeV2Sink.payloadFormat(p) == "parquet")
    assert(WeatherLakeV2Sink.committedEntryLines(p).forall(l =>
      WeatherLakeV2Sink.lineStats(l).contains("id")))
    // epoch manifests carry the checkpoint-stable -<epochId> suffix
    assert(WeatherLakeV2Sink.manifestNames(p).exists(_.contains("-0.txt")))
  }

  test("typed ALTER TABLE ADD/DROP COLUMN is metadata-only: old files " +
      "null-fill an added column, a dropped column stops being read " +
      "without touching a byte of data, and the guard rails are loud") {
    warehouse
    spark.sql("""CREATE TABLE tlake.evo (id BIGINT, v DOUBLE, region STRING)
      USING lake PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO tlake.evo
      SELECT id, id * 1.0 AS v, concat('r', id % 2) AS region FROM range(4)""")
    val filesBefore = WeatherLakeV2Sink.committedFiles(s"$warehouse/evo")
    spark.sql("ALTER TABLE tlake.evo ADD COLUMN note STRING")
    // the new column lands BEFORE the partition suffix; old rows null
    assert(spark.table("tlake.evo").schema.fieldNames.toSeq ==
      Seq("id", "v", "note", "region"))
    assert(spark.table("tlake.evo").filter(col("note").isNull).count() == 4)
    // no data was rewritten
    assert(WeatherLakeV2Sink.committedFiles(s"$warehouse/evo") == filesBefore)
    // new writes carry the column; old and new rows coexist
    spark.sql("""INSERT INTO tlake.evo VALUES
      (100, 9.0, 'hello', 'r0')""")
    val m = spark.table("tlake.evo").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(m(100L).contains("hello") && m(1L).isEmpty)
    // DROP: the v column disappears from reads, files untouched
    spark.sql("ALTER TABLE tlake.evo DROP COLUMN v")
    assert(spark.table("tlake.evo").schema.fieldNames.toSeq ==
      Seq("id", "note", "region"))
    assert(spark.table("tlake.evo").count() == 5)
    // rails: NOT NULL add, partition drop, rename, positioned add
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE tlake.evo ADD COLUMN bad STRING NOT NULL"))
    assert(e1.getMessage.contains("nullable"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE tlake.evo DROP COLUMN region"))
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
    // RENAME is now supported via name mapping (TypedLakeRenameSpec
    // pins the full contract) — here just the metadata-only flip
    spark.sql("ALTER TABLE tlake.evo RENAME COLUMN note TO note2")
    assert(spark.table("tlake.evo").schema.fieldNames.toSeq ==
      Seq("id", "note2", "region"))
    assert(spark.table("tlake.evo").count() == 5)
    val e4 = intercept[Exception](spark.sql(
      "ALTER TABLE tlake.evo ADD COLUMN early STRING FIRST"))
    assert(e4.getMessage.contains("FIRST/AFTER"), e4.getMessage)
    // IF EXISTS drop of an absent column is a no-op
    spark.sql("ALTER TABLE tlake.evo DROP COLUMN IF EXISTS ghost")
    assert(spark.table("tlake.evo").count() == 5)
  }

  test("MANIFEST-STATS file pruning on typed scans: a range predicate " +
      "over a measured column prunes the file LIST before any footer IO " +
      "(fail-open on unmeasured files), and answers stay correct") {
    warehouse
    spark.sql("""CREATE TABLE tlake.sp (id BIGINT, v DOUBLE, tag STRING)
      USING lake TBLPROPERTIES ('statsFields' = 'id,tag')""")
    // four disjoint-id commits, one task each → four files with tight
    // id ranges (range(start, end, step, numPartitions))
    (0 until 4).foreach { k =>
      spark.sql(s"""INSERT INTO tlake.sp
        SELECT id + ${k * 100}, id * 1.0, concat('t', $k)
        FROM range(0, 10, 1, 1)""")
    }
    val p = s"$warehouse/sp"
    val all = WeatherLakeV2Sink.committedFiles(p)
    assert(all.size == 4)
    // build the scan the engine would: push the catalyst filter, count
    // planned files through the test seam
    def splitConj(e: org.apache.spark.sql.catalyst.expressions.Expression):
        Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        splitConj(l) ++ splitConj(r)
      case other => Seq(other)
    }
    def planned(cond: String): Seq[String] = {
      // the RESOLVED conjuncts the engine would push, extracted from the
      // optimized plan of the same filter
      val df = spark.table("tlake.sp").filter(cond)
      val filters = df.queryExecution.optimizedPlan.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          splitConj(f.condition)
      }.getOrElse(Seq.empty)
      val lines = WeatherLakeV2Sink.committedEntryLines(p)
      val statsOf = lines.map(l => l.split('\t').head ->
        WeatherLakeV2Sink.lineStats(l)).toMap
      new LakeCatalog.StatsPrunedParquetScanBuilder("tlake.sp", spark, p,
        spark.table("tlake.sp").schema, all.sorted, statsOf,
        new CaseInsensitiveStringMap(
          java.util.Map.of("basePath", p)))
        .plannedFiles(filters)
    }
    // id >= 300 lives in ONE file; id BETWEEN 100 AND 150 in one;
    // equality on the lexical tag column prunes to one
    assert(planned("id >= 300").size == 1)
    assert(planned("id >= 100 and id <= 150").size == 1)
    assert(planned("tag = 't2'").size == 1)
    // an unmeasured column never prunes (fail-open)
    assert(planned("v > 1000.0").size == 4)
    // and the full query through SQL still answers correctly
    assert(spark.sql("SELECT count(*) FROM tlake.sp WHERE id >= 300")
      .head.getLong(0) == 10)
    assert(spark.sql(
      "SELECT sum(id) FROM tlake.sp WHERE id >= 100 AND id <= 109")
      .head.getLong(0) == (100L to 109L).sum)
    // the DML candidate prune uses the SAME stats bounds: a range DELETE
    // touches only the file whose stats overlap (1 of 4), and the prune
    // logic itself is pinned on synthetic stats
    val del = spark.sql(
      "DELETE FROM tlake.sp WHERE id >= 300 AND id <= 305").collect().head
    assert(del.getInt(0) == 1 && del.getLong(2) == 6, del)
    assert(spark.table("tlake.sp").count() == 34)
    import graft.plans.LakeDmlSql
    import graft.sources.WeatherLakeV2Sink.FieldStats
    val spSchema = spark.table("tlake.sp").schema
    val cond = spark.sessionState.sqlParser.parseExpression(
      "id >= 100 AND id < 200 AND tag = 't1'")
    val prune = LakeDmlSql.typedPruneFor(Map.empty,
      LakeDmlSql.typedStatsBounds(cond, spSchema))
    val inRange = Map("id" -> FieldStats("100", "150", numeric = true),
      "tag" -> FieldStats("t1", "t1", numeric = false))
    // min 201, not 200: the strict `id < 200` bound widens to <= 200
    // (sound fail-open), so a file whose min is exactly 200 survives
    val outRange = Map("id" -> FieldStats("201", "300", numeric = true),
      "tag" -> FieldStats("t1", "t1", numeric = false))
    val wrongTag = Map("id" -> FieldStats("100", "150", numeric = true),
      "tag" -> FieldStats("t2", "t9", numeric = false))
    assert(prune(Map.empty, inRange))
    assert(!prune(Map.empty, outRange))
    assert(!prune(Map.empty, wrongTag))
    assert(prune(Map.empty, Map.empty)) // no stats → fail open
    // non-ASCII lexical stats never prune (order-divergence guard)
    assert(prune(Map.empty, Map("tag" ->
      FieldStats("𐀀", "𐀁", numeric = false))))
    // IMPLICIT-COERCION guards (fail open, never a wrong prune): a
    // numeric literal against the STRING column carries the NUMERIC
    // domain (the runtime coerces both sides to double), so it never
    // applies to the string column's lexical stats — min=max='0150' vs
    // tag > 100 used to prune lexically yet CAST('0150' AS DOUBLE) > 100
    val coerced = spark.sessionState.sqlParser.parseExpression("tag > 100")
    val coercedBounds = LakeDmlSql.typedStatsBounds(coerced, spSchema)
    assert(coercedBounds == Seq(("tag", Some("100"), None, true)))
    assert(LakeDmlSql.typedPruneFor(Map.empty, coercedBounds)(Map.empty,
      Map("tag" -> FieldStats("0150", "0150", numeric = false))))
    // a non-numeric string literal against the NUMERIC column emits no
    // bound either (and stats overlap itself no longer throws on an
    // unparsable numeric bound — fail open)
    val junk = spark.sessionState.sqlParser.parseExpression("id = 'abc'")
    assert(LakeDmlSql.typedStatsBounds(junk, spSchema).isEmpty)
    assert(FieldStats("100", "200", numeric = true)
      .overlaps(Some("abc"), Some("abc")))
    // a LOSSLESSLY-castable literal still emits its bound, rendered in
    // the column's own domain: id = '150' → bound "150"; id = 150.0 →
    // "150" (not "150.0"); id = 150.5 is lossy → no bound
    val s150 = spark.sessionState.sqlParser.parseExpression("id = '150'")
    assert(LakeDmlSql.typedStatsBounds(s150, spSchema) ==
      Seq(("id", Some("150"), Some("150"), true)))
    val d150 = spark.sessionState.sqlParser.parseExpression("id = 150.0")
    assert(LakeDmlSql.typedStatsBounds(d150, spSchema) ==
      Seq(("id", Some("150"), Some("150"), true)))
    // a STRING column whose values all parse as numbers carries LEXICAL
    // stats under the typed writer, and a lexical bound never applies to
    // numeric-domain stats: tag > '150' against numeric stats fails open
    // (file values {9} are lexically > '150' though numerically below)
    val lex = spark.sessionState.sqlParser.parseExpression("tag > '150'")
    val lexBounds = LakeDmlSql.typedStatsBounds(lex, spSchema)
    assert(lexBounds == Seq(("tag", Some("150"), None, false)))
    assert(LakeDmlSql.typedPruneFor(Map.empty, lexBounds)(Map.empty,
      Map("tag" -> FieldStats("9.0", "9.0", numeric = true))))
    val lossy = spark.sessionState.sqlParser.parseExpression("id = 150.5")
    assert(LakeDmlSql.typedStatsBounds(lossy, spSchema).isEmpty)
    // same gate on the partition leg: a wrong-domain literal never
    // produces a partition-equality prune conjunct
    val pCond = spark.sessionState.sqlParser.parseExpression("tag = 100")
    assert(LakeDmlSql.typedPartitionEqs(pCond, Seq("tag"), spSchema).isEmpty)
    val pOk = spark.sessionState.sqlParser.parseExpression("tag = 't1'")
    assert(LakeDmlSql.typedPartitionEqs(pOk, Seq("tag"), spSchema) ==
      Map("tag" -> "t1"))
  }

  test("CALL convert adopts a plain Parquet directory IN PLACE: no data " +
      "rewrite, read parity with the plain read, DML and stats work on " +
      "the adopted table, and the guards are loud") {
    warehouse
    // a pre-lake world: plain partitioned Parquet written by anyone
    val plain = Files.createTempDirectory("plainpq").toString + "/events"
    spark.range(100).selectExpr("id", "concat('n-', id) AS name",
        "concat('r', id % 2) AS region")
      .write.partitionBy("region").parquet(plain)
    val before = spark.read.parquet(plain)
      .select("id", "name", "region").orderBy("id")
      .collect().toSeq
    val fsConf = new org.apache.hadoop.conf.Configuration()
    val fs = new org.apache.hadoop.fs.Path(plain).getFileSystem(fsConf)
    def dataFiles: Set[String] = {
      def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
        fs.listStatus(p).toSeq.flatMap { st =>
          if (st.getPath.getName.startsWith("_") ||
              st.getPath.getName.startsWith(".")) Seq.empty
          else if (st.isDirectory) walk(st.getPath)
          else Seq(st.getPath.toUri.getPath)
        }
      walk(new org.apache.hadoop.fs.Path(plain)).toSet
    }
    val filesBefore = dataFiles
    val res = spark.sql(s"""CALL tlake.system.convert('adopted',
      path => '$plain',
      schema_ddl => 'id BIGINT, name STRING, region STRING',
      partition_cols => 'region', stats_fields => 'id')""").collect().head
    assert(res.getInt(0) == filesBefore.size, res)
    assert(res.getInt(1) == filesBefore.size, res) // all measured
    // IN PLACE: the very same data files, now manifest-listed
    assert(dataFiles == filesBefore)
    assert(WeatherLakeV2Sink.payloadFormat(plain) == "parquet")
    // read parity through the catalog
    val after = spark.table("tlake.adopted")
      .select("id", "name", "region").orderBy("id").collect().toSeq
    assert(after == before)
    // stats populated → the skipping layer works from day one
    assert(WeatherLakeV2Sink.committedEntryLines(plain)
      .forall(l => WeatherLakeV2Sink.lineStats(l).contains("id")))
    // DML works on the adopted table
    spark.sql("DELETE FROM tlake.adopted WHERE id >= 90")
    assert(spark.table("tlake.adopted").count() == 90)
    spark.sql("UPDATE tlake.adopted SET name = 'renamed' WHERE id = 0")
    assert(spark.table("tlake.adopted")
      .filter(col("name") === "renamed").count() == 1)
    // DROP leaves the adopted data in place (external-table semantics)
    spark.sql("DROP TABLE tlake.adopted")
    assert(fs.exists(new org.apache.hadoop.fs.Path(plain)))
    assert(spark.read.parquet(plain).count() > 0)
    // guards: re-converting an existing lake refuses; a wrong schema
    // (column absent from the footers) refuses instead of null-filling
    val e1 = intercept[Exception](spark.sql(
      s"""CALL tlake.system.convert('again', path => '$plain',
        schema_ddl => 'id BIGINT, name STRING, region STRING',
        partition_cols => 'region')"""))
    assert(e1.getMessage.contains("already a lake"), e1.getMessage)
    val plain2 = Files.createTempDirectory("plainpq2").toString + "/d2"
    spark.range(5).selectExpr("id").write.parquet(plain2)
    val e2 = intercept[Exception](spark.sql(
      s"""CALL tlake.system.convert('wrongschema', path => '$plain2',
        schema_ddl => 'id BIGINT, nosuch STRING')"""))
    assert(e2.getMessage.contains("absent from"), e2.getMessage)
  }

  test("an empty typed table SELECTs as zero rows with the declared " +
      "schema, and a typed table refuses the classic DML payload-column " +
      "contract errors cleanly") {
    warehouse
    spark.sql("""CREATE TABLE tlake.t7 (a INT, b STRING)
      USING lake""")
    val empty = spark.table("tlake.t7")
    assert(empty.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(empty.count() == 0)
    spark.sql("INSERT INTO tlake.t7 VALUES (1, 'x'), (2, 'y')")
    assert(spark.table("tlake.t7").count() == 2)
    // unpartitioned typed table: files land at the root
    assert(WeatherLakeV2Sink.committedFiles(s"$warehouse/t7")
      .forall(_.endsWith(".parquet")))
    // changeLog property is refused at CREATE for typed tables
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE tlake.t7cl (a INT, b STRING) USING lake
        TBLPROPERTIES ('changeLog' = 'true')"""))
    assert(e.getMessage.contains("changeLog"), e.getMessage)
  }
}
