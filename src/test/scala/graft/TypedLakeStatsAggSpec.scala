package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}

/** MANIFEST-STATS aggregate answering (round 16): an unfiltered,
  * ungrouped, debt-free MIN/MAX over columns whose per-file stats cover
  * every live entry line is answered from the manifest ALONE — O(files)
  * driver metadata, zero file IO (the plan is a LocalTableScan, not a
  * BatchScan). Values reduce in the column's own internal ordering
  * (never the pruning layer's double-compare), and every unknown —
  * missing stats, domain mismatch, non-ASCII lexical endpoints, mor
  * debt, filters, grouping, unsupported aggregates — REFUSES back to
  * the ordinary scan. Gated by spark.sql.parquet.aggregatePushdown,
  * like the footer path it leapfrogs.
  */
class TypedLakeStatsAggSpec extends SparkSpec {

  private def freshCat(tag: String): Unit = {
    val w = Files.createTempDirectory(s"statsagg$tag").toString
    spark.conf.set(s"spark.sql.catalog.sa$tag", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.sa$tag.warehouse", w)
  }

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children.flatMap(walk) ++ (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case _ => Seq.empty
    }))

  private def isManifestAnswered(df: DataFrame): Boolean = {
    df.collect()
    val plans = walk(df.queryExecution.executedPlan)
    plans.exists(_.isInstanceOf[LocalTableScanExec]) &&
      !plans.exists(_.isInstanceOf[BatchScanExec])
  }

  private def withAggPushdown[T](body: => T): T = {
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try body finally spark.conf.unset("spark.sql.parquet.aggregatePushdown")
  }

  test("MIN/MAX over stats-covered columns answer from the manifest: " +
      "LocalTableScan, no BatchScan, exact values for mixed min/max " +
      "lists — and integral stats past 2^53 REFUSE (the accumulator is " +
      "double-quantized) with the footer path answering exactly instead") {
    freshCat("a")
    spark.sql("""CREATE TABLE saa.t (id BIGINT, name STRING, v DOUBLE)
      USING lake TBLPROPERTIES ('statsFields' = 'id,name,v')""")
    spark.sql("""INSERT INTO saa.t VALUES
      (40000000, 'alpha', 1.5), (12, 'omega', -3.25)""")
    spark.sql("""INSERT INTO saa.t VALUES
      (7, 'beta', 0.125), (-4, 'mid', 99.75)""")
    withAggPushdown {
      val q = spark.sql(
        "SELECT min(id), max(id), min(name), max(name), max(v) FROM saa.t")
      assert(isManifestAnswered(q),
        s"expected a manifest-answered plan:\n${q.queryExecution.executedPlan}")
      val r = q.head
      assert(r.getLong(0) == -4L && r.getLong(1) == 40000000L)
      assert(r.getString(2) == "alpha" && r.getString(3) == "omega")
      assert(r.getDouble(4) == 99.75)
    }
    // conf off: the ordinary path answers identically
    val plain = spark.sql("SELECT min(id), max(id) FROM saa.t")
    assert(!isManifestAnswered(plain))
    assert(plain.head.getLong(0) == -4L &&
      plain.head.getLong(1) == 40000000L)

    // past 2^53 the stored endpoints are double-quantized: the manifest
    // REFUSES (an answer could collapse 2^53+1 onto 2^53) and the
    // parquet FOOTER path — exact typed values — answers instead
    spark.sql("""CREATE TABLE saa.big (id BIGINT) USING lake
      TBLPROPERTIES ('statsFields' = 'id')""")
    spark.sql("INSERT INTO saa.big VALUES (9007199254740993), (12)")
    withAggPushdown {
      val b = spark.sql("SELECT max(id) FROM saa.big")
      assert(!isManifestAnswered(b),
        "quantized integral stats must refuse the manifest answer")
      assert(b.head.getLong(0) == 9007199254740993L)
    }
    spark.sql("DROP TABLE saa.t")
    spark.sql("DROP TABLE saa.big")
  }

  test("every unknown REFUSES back to the scan: filters, grouping, " +
      "uncovered columns, non-ASCII lexical endpoints, count mixes, " +
      "and mor debt (where the deleted row WAS the extremum)") {
    freshCat("b")
    spark.sql("""CREATE TABLE sab.t (id BIGINT, name STRING, w BIGINT)
      USING lake TBLPROPERTIES ('statsFields' = 'id,name',
      'dmlMode' = 'mor')""")
    spark.sql("""INSERT INTO sab.t
      SELECT id, concat('n', id), id * 2 FROM range(50)""")
    withAggPushdown {
      // a filter refuses (stats answer would ignore it)
      val f = spark.sql("SELECT max(id) FROM sab.t WHERE id < 10")
      assert(!isManifestAnswered(f) && f.head.getLong(0) == 9)
      // grouping refuses
      val g = spark.sql(
        "SELECT id % 2, max(id) FROM sab.t GROUP BY id % 2")
      assert(!isManifestAnswered(g))
      assert(g.collect().map(_.getLong(1)).sorted.toSeq == Seq(48L, 49L))
      // an uncovered column refuses (w has no stats)
      val u = spark.sql("SELECT max(w) FROM sab.t")
      assert(!isManifestAnswered(u) && u.head.getLong(0) == 98)
      // a COUNT in the mix refuses the manifest path (row counts are
      // not in the stats) — the footer path answers instead
      val c = spark.sql("SELECT count(*), max(id) FROM sab.t")
      assert(!isManifestAnswered(c))
      assert(c.head.getLong(0) == 50 && c.head.getLong(1) == 49)
      // mor debt refuses — and the deleted row IS the current maximum,
      // so a stale stats answer would be visibly wrong
      spark.sql("DELETE FROM sab.t WHERE id = 49")
      val m = spark.sql("SELECT max(id) FROM sab.t")
      assert(!isManifestAnswered(m) && m.head.getLong(0) == 48)
    }
    // non-ASCII lexical endpoints refuse (Java vs UTF8-binary order)
    spark.sql("""CREATE TABLE sab.u (s STRING) USING lake
      TBLPROPERTIES ('statsFields' = 's')""")
    spark.sql("INSERT INTO sab.u VALUES ('aa'), ('éclair'), ('zz')")
    withAggPushdown {
      val q = spark.sql("SELECT min(s), max(s) FROM sab.u")
      assert(!isManifestAnswered(q))
      assert(q.head.getString(0) == "aa")
    }
    spark.sql("DROP TABLE sab.t")
    spark.sql("DROP TABLE sab.u")
  }

  test("timestamps and dates answer chronologically from their ISO " +
      "renderings, and evolution keeps honesty: a column added later " +
      "refuses until every live file carries its stats") {
    freshCat("c")
    spark.sql("""CREATE TABLE sac.t (id BIGINT, ts TIMESTAMP, d DATE)
      USING lake TBLPROPERTIES ('statsFields' = 'id,ts,d')""")
    spark.sql("""INSERT INTO sac.t VALUES
      (1, timestamp'2024-03-01 10:30:00.5', date'2024-03-01'),
      (2, timestamp'2024-03-01 10:30:00.45', date'2023-12-31')""")
    spark.sql("""INSERT INTO sac.t VALUES
      (3, timestamp'2025-01-01 00:00:00', date'2024-01-15')""")
    withAggPushdown {
      val q = spark.sql("SELECT min(ts), max(ts), min(d), max(d) FROM sac.t")
      assert(isManifestAnswered(q),
        s"${q.queryExecution.executedPlan}")
      val r = q.head
      assert(r.getTimestamp(0).toString.startsWith("2024-03-01 10:30:00.45"))
      assert(r.getTimestamp(1).toString.startsWith("2025-01-01 00:00:00"))
      assert(r.getDate(2).toString == "2023-12-31")
      assert(r.getDate(3).toString == "2024-03-01")
      // evolution: the new column's stats exist only on files written
      // after the ALTER — refuse until coverage is complete
      spark.sql("ALTER TABLE sac.t ADD COLUMN score BIGINT")
      spark.sql("ALTER TABLE sac.t SET TBLPROPERTIES " +
        "('statsFields' = 'id,ts,d,score')")
      spark.sql("""INSERT INTO sac.t VALUES
        (4, timestamp'2020-01-01 00:00:00', date'2020-01-01', 7)""")
      val s = spark.sql("SELECT max(score) FROM sac.t")
      assert(!isManifestAnswered(s) && s.head.getLong(0) == 7)
      // after measure_stats backfills... the old files have NO value
      // for score (null-filled), so they still carry no score stats —
      // the refusal is permanent until a rewrite, and that is correct
      val ts2 = spark.sql("SELECT min(ts) FROM sac.t")
      assert(isManifestAnswered(ts2),
        "ts stats cover every file (old and new) — still answerable")
      assert(ts2.head.getTimestamp(0).toString
        .startsWith("2020-01-01 00:00:00"))
    }
    spark.sql("DROP TABLE sac.t")
  }

  test("ANALYZE under a non-UTC session re-renders the writer's UTC-" +
      "pinned canonical endpoints — measure_stats and write-time stats " +
      "agree byte-for-byte, and the manifest answer stays exact") {
    freshCat("tz")
    spark.sql("""CREATE TABLE satz.t (id BIGINT, ts TIMESTAMP)
      USING lake TBLPROPERTIES ('statsFields' = 'id,ts')""")
    spark.sql("""INSERT INTO satz.t VALUES
      (1, timestamp'2024-03-01 10:30:00.5'),
      (2, timestamp'2025-01-01 00:00:00')""")
    val loc = spark.sql("CALL satz.system.detail('t')").head.getString(0)
    def tsStats: Seq[(String, String)] =
      graft.sources.WeatherLakeV2Sink.committedEntryLines(loc)
        .flatMap(l => graft.sources.WeatherLakeV2Sink.lineStats(l).get("ts"))
        .map(st => (st.min, st.max)).sorted
    val atWrite = tsStats
    assert(atWrite.nonEmpty)
    // +8:45, no DST — any session-zone leak in the rendering shows up
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla")
    try {
      spark.sql("CALL satz.system.measure_stats('t', 'ts')")
      assert(tsStats == atWrite,
        s"a non-UTC session's ANALYZE must re-render the writer's " +
          s"canonical (UTC) endpoints: $tsStats vs $atWrite")
      withAggPushdown {
        val q = spark.sql("SELECT max(ts) FROM satz.t")
        assert(isManifestAnswered(q), s"${q.queryExecution.executedPlan}")
        assert(q.head.getTimestamp(0).toString
          .startsWith("2025-01-01 00:00:00"))
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    spark.sql("DROP TABLE satz.t")
  }
}
