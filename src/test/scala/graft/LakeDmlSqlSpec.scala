package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL DML over the manifest lake (LakeDmlParser): MERGE INTO / DELETE
  * FROM / UPDATE statements dispatch to the native copy-on-write ops;
  * unsupported shapes and non-lake targets fail loudly.
  */
class LakeDmlSqlSpec extends SparkSpec {

  private def freshLake(rows: Seq[(String, Long, Long)]): String = {
    val lake = Files.createTempDirectory("lakedml").toString
    val s = spark
    import s.implicits._
    rows.toDF("city", "k", "v").select(col("city"),
        lit("2024-01-01").as("ds"), lit("00").as("hour"),
        to_json(struct(col("k"), col("v"))).as("raw_json"))
      .coalesce(1)
      .write.format("graft.sources.WeatherLakeV2Sink")
      .mode("append").save(lake)
    lake
  }

  private def view(lake: String, name: String, extra: String = ""): Unit =
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW $name
      USING graft.sources.WeatherLakeV2StreamSource
      OPTIONS (path '$lake'$extra)""")

  private def state(name: String): Map[Long, Long] =
    spark.sql(s"""SELECT CAST(get_json_object(value, '$$.k') AS BIGINT) AS k,
        CAST(get_json_object(value, '$$.v') AS BIGINT) AS v FROM $name""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("DELETE FROM removes matching rows copy-on-write and returns the " +
      "operation stats; NULL predicates keep rows") {
    val lake = freshLake(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L)))
    view(lake, "dml_del")
    val stats = spark.sql(
      "DELETE FROM dml_del WHERE CAST(get_json_object(value, '$.k') AS BIGINT) = 2")
    assert(stats.columns.toSeq == Seq("touched_files", "new_files", "deleted_rows"))
    assert(stats.collect().head.getLong(2) == 1L)
    assert(state("dml_del") == Map(1L -> 10L, 3L -> 30L))
    // a predicate NULL on some rows (absent field) keeps them — SQL
    // DELETE null semantics ride through the binding
    spark.sql(
      "DELETE FROM dml_del WHERE CAST(get_json_object(value, '$.absent') AS BIGINT) > 0")
    assert(state("dml_del") == Map(1L -> 10L, 3L -> 30L))
  }

  test("UPDATE SET value = <expr> WHERE <pred> transforms matching rows " +
      "in place; only the payload column is assignable") {
    val lake = freshLake(Seq(("a", 1L, 10L), ("a", 2L, 20L)))
    view(lake, "dml_upd")
    val stats = spark.sql("""UPDATE dml_upd
      SET value = to_json(named_struct(
        'k', CAST(get_json_object(value, '$.k') AS BIGINT),
        'v', CAST(get_json_object(value, '$.v') AS BIGINT) * 100))
      WHERE CAST(get_json_object(value, '$.k') AS BIGINT) = 1""")
    assert(stats.collect().head.getLong(2) == 1L)
    assert(state("dml_upd") == Map(1L -> 1000L, 2L -> 20L))
    // assigning anything but the payload column is a loud error
    val e = intercept[IllegalArgumentException] {
      spark.sql("UPDATE dml_upd SET city = 'x'")
    }
    assert(e.getMessage.contains("payload column"), e.getMessage)
  }

  test("MERGE INTO upserts a source batch through one SQL statement " +
      "(the reference's ON CONFLICT DO UPDATE idiom)") {
    val lake = freshLake(Seq(("a", 1L, 10L), ("a", 2L, 20L)))
    view(lake, "dml_merge")
    val s = spark
    import s.implicits._
    Seq(("a", 2L, 999L), ("c", 9L, 90L)).toDF("city", "k", "v")
      .select(col("city"), lit("2024-01-01").as("ds"), lit("00").as("hour"),
        to_json(struct(col("k"), col("v"))).as("raw_json"))
      .createOrReplaceTempView("dml_merge_src")
    val stats = spark.sql("""MERGE INTO dml_merge t USING dml_merge_src s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED THEN UPDATE SET value = s.raw_json
      WHEN NOT MATCHED THEN
        INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    assert(stats.columns.toSeq == Seq("touched_files", "new_files"))
    assert(stats.collect().head.getInt(0) == 1)
    assert(state("dml_merge") == Map(1L -> 10L, 2L -> 999L, 9L -> 90L))
    // idempotent: re-merging the same source converges
    spark.sql("""MERGE INTO dml_merge t USING dml_merge_src s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED THEN UPDATE SET value = s.raw_json
      WHEN NOT MATCHED THEN
        INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    assert(state("dml_merge") == Map(1L -> 10L, 2L -> 999L, 9L -> 90L))
  }

  test("view options (changeLog, statsFields) parameterize the SQL DML " +
      "operation — a SQL DELETE can feed the change-data stream") {
    import graft.sources.WeatherLakeV2Sink
    val lake = freshLake(Seq(("a", 1L, 10L), ("a", 2L, 20L)))
    view(lake, "dml_opt", ", changeLog 'true', statsFields 'v'")
    spark.sql(
      "DELETE FROM dml_opt WHERE CAST(get_json_object(value, '$.k') AS BIGINT) = 1")
    // the delete commit carries a change log (the #changes directive)
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val mdir = new org.apache.hadoop.fs.Path(lake, WeatherLakeV2Sink.ManifestDir)
    val deleteManifest = WeatherLakeV2Sink.liveManifests(lake)
      .find(_.startsWith("manifest-delete-"))
    assert(deleteManifest.isDefined, WeatherLakeV2Sink.liveManifests(lake))
    val lines = {
      val in = fs.open(new org.apache.hadoop.fs.Path(mdir, deleteManifest.get))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    assert(WeatherLakeV2Sink.changePaths(lines).nonEmpty,
      "changeLog 'true' on the view must carry into the operation")
    // and statsFields refreshed per-file stats on the survivor rewrite
    assert(WeatherLakeV2Sink.committedEntryLines(lake).exists(_.contains("\t")),
      "statsFields 'v' on the view must measure the rewritten files")
  }

  test("unsupported shapes and non-lake targets fail LOUDLY") {
    val lake = freshLake(Seq(("a", 1L, 10L), ("a", 2L, 20L)))
    view(lake, "dml_loud")
    val s = spark
    import s.implicits._
    // a non-lake target
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("plain_view")
    val e1 = intercept[IllegalArgumentException] {
      spark.sql("DELETE FROM plain_view WHERE id = 1")
    }
    assert(e1.getMessage.contains("not a lake view"), e1.getMessage)
    // a column outside the frame
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("DELETE FROM dml_loud WHERE nosuch = 1")
    }
    assert(e2.getMessage.contains("may reference only"), e2.getMessage)
    // subqueries
    val e3 = intercept[IllegalArgumentException] {
      spark.sql("DELETE FROM dml_loud WHERE value IN (SELECT v FROM plain_view)")
    }
    assert(e3.getMessage.contains("subquer"), e3.getMessage)
    // time travel is immutable
    view(lake, "dml_tt", ", snapshotVersion '0'")
    val e4 = intercept[IllegalArgumentException] {
      spark.sql("DELETE FROM dml_tt WHERE value IS NOT NULL")
    }
    assert(e4.getMessage.contains("time-travel"), e4.getMessage)
    // the change feed is not a DML target
    view(lake, "dml_cdf", ", readChangeFeed 'true', startingVersion '0'")
    val e5 = intercept[IllegalArgumentException] {
      spark.sql("DELETE FROM dml_cdf WHERE value IS NOT NULL")
    }
    assert(e5.getMessage.contains("change-feed"), e5.getMessage)
    // MERGE: mismatched ON sides (source keyed by a non-payload column)
    Seq(("a", "2024-01-01", "00", """{"k":1,"v":1}""", 1L))
      .toDF("city", "ds", "hour", "raw_json", "k")
      .createOrReplaceTempView("dml_badsrc")
    val e6 = intercept[IllegalArgumentException] {
      spark.sql("""MERGE INTO dml_loud t USING dml_badsrc s
        ON get_json_object(t.value, '$.k') = s.k
        WHEN MATCHED THEN UPDATE SET value = s.raw_json
        WHEN NOT MATCHED THEN
          INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    }
    assert(e6.getMessage.contains("same function"), e6.getMessage)
    // MERGE: NOT MATCHED BY SOURCE supports DELETE only (full-sync);
    // an UPDATE of unmatched survivors is refused with the workaround
    val e7 = intercept[IllegalArgumentException] {
      spark.sql("""MERGE INTO dml_loud t USING dml_badsrc s
        ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
        WHEN MATCHED THEN UPDATE SET value = s.raw_json
        WHEN NOT MATCHED THEN
          INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET value = t.value""")
    }
    assert(e7.getMessage.contains("NOT MATCHED BY SOURCE"), e7.getMessage)
    // MERGE: a conditional UPDATE is not the full-row replacement
    val e8 = intercept[IllegalArgumentException] {
      spark.sql("""MERGE INTO dml_loud t USING dml_badsrc s
        ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
        WHEN MATCHED AND s.k > 0 THEN UPDATE SET value = s.raw_json""")
    }
    assert(e8.getMessage.contains("WHEN MATCHED AND"), e8.getMessage)
  }

  test("MERGE matched-side DELETE: pure erasure, and the Delta CDC idiom " +
      "(conditional DELETE + unconditional UPDATE + guarded INSERT); " +
      "divergent shapes refuse loudly") {
    val s = spark
    import s.implicits._
    def src(name: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("k", "v", "op")
        .select(lit("a").as("city"), lit("2024-01-01").as("ds"),
          lit("00").as("hour"),
          to_json(struct(col("k"), col("v"))).as("raw_json"), col("op"))
        .createOrReplaceTempView(name)

    // pure delete: matched keys erased, unmatched delete rows no-op
    val lake1 = freshLake(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L)))
    view(lake1, "dml_mdel")
    src("dml_mdel_src", Seq((2L, 0L, "d"), (7L, 0L, "d")))
    val stats = spark.sql("""MERGE INTO dml_mdel t USING dml_mdel_src s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED THEN DELETE""")
    assert(stats.columns.toSeq == Seq("touched_files", "new_files"))
    assert(state("dml_mdel") == Map(1L -> 10L, 3L -> 30L))

    // the CDC idiom: op='d' deletes, others upsert; unmatched 'd' no-ops
    val lake2 = freshLake(Seq(("a", 1L, 10L), ("a", 2L, 20L)))
    view(lake2, "dml_cdc")
    src("dml_cdc_src",
      Seq((1L, 0L, "d"), (2L, 222L, "u"), (9L, 90L, "u"), (7L, 0L, "d")))
    spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_src s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET value = s.raw_json
      WHEN NOT MATCHED AND s.op != 'd' THEN
        INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    assert(state("dml_cdc") == Map(2L -> 222L, 9L -> 90L))

    // unguarded INSERT with a conditional DELETE would silently diverge
    // from SQL semantics on unmatched delete-marked rows — refused
    val e1 = intercept[IllegalArgumentException] {
      spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_src s
        ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET value = s.raw_json
        WHEN NOT MATCHED THEN
          INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    }
    assert(e1.getMessage.contains("negated guard"), e1.getMessage)

    // a DELETE condition that is NULL on some row would make the keyed
    // dispatch diverge from SQL three-valued semantics — refused. The
    // guard rides the marker column inside the merge's own jobs
    // (raise_error), not a separate probe pass, so it surfaces as a
    // runtime failure on the offending row and nothing publishes.
    src("dml_cdc_null",
      Seq((2L, 0L, null.asInstanceOf[String]), (9L, 91L, "u")))
    val e0 = intercept[Exception] {
      spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_null s
        ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET value = s.raw_json
        WHEN NOT MATCHED AND s.op != 'd' THEN
          INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    }
    val chain0 = Iterator.iterate(e0: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain0.contains("NULL"), chain0)
    assert(state("dml_cdc") == Map(2L -> 222L, 9L -> 90L)) // unchanged

    // WHEN NOT MATCHED BY SOURCE THEN DELETE (full-sync): survivors
    // absent from the batch go away where the target-bound condition
    // holds; a conditional clause spares the rest
    src("dml_cdc_sync", Seq((2L, 222L, "u"), (9L, 90L, "u")))
    spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_sync s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED THEN UPDATE SET value = s.raw_json
      WHEN NOT MATCHED THEN
        INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)
      WHEN NOT MATCHED BY SOURCE
        AND CAST(get_json_object(t.value, '$.k') AS BIGINT) > 1000
      THEN DELETE""")
    // nothing above k=1000 existed; state unchanged by the guard
    assert(state("dml_cdc") == Map(2L -> 222L, 9L -> 90L))
    // seed an extra row, then unconditional full-sync removes it
    src("dml_cdc_extra", Seq((777L, 7L, "u")))
    spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_extra s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED THEN UPDATE SET value = s.raw_json
      WHEN NOT MATCHED THEN
        INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    assert(state("dml_cdc") == Map(2L -> 222L, 9L -> 90L, 777L -> 7L))
    spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_sync s
      ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
      WHEN MATCHED THEN UPDATE SET value = s.raw_json
      WHEN NOT MATCHED THEN
        INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(state("dml_cdc") == Map(2L -> 222L, 9L -> 90L))
    // NMBS UPDATE stays refused with the workaround named
    val e9 = intercept[IllegalArgumentException] {
      spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_sync s
        ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
        WHEN MATCHED THEN UPDATE SET value = s.raw_json
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET value = t.value""")
    }
    assert(e9.getMessage.contains("separate UPDATE"), e9.getMessage)

    // pure DELETE + INSERT needs per-row matchedness as the marker
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_src s
        ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN
          INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    }
    assert(e2.getMessage.contains("matchedness"), e2.getMessage)

    // dead conditional DELETE after the unconditional UPDATE: Spark's own
    // grammar refuses it at parse (only the LAST matched clause may omit
    // its condition), so the shape never reaches the dispatch — the
    // command's own ordering check is defense in depth
    val e3 = intercept[Exception] {
      spark.sql("""MERGE INTO dml_cdc t USING dml_cdc_src s
        ON get_json_object(t.value, '$.k') = get_json_object(s.raw_json, '$.k')
        WHEN MATCHED THEN UPDATE SET value = s.raw_json
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN NOT MATCHED AND s.op != 'd' THEN
          INSERT (city, ds, hour, value) VALUES (s.city, s.ds, s.hour, s.raw_json)""")
    }
    assert(e3.getMessage.toUpperCase.contains("MATCHED"), e3.getMessage)
  }
}
