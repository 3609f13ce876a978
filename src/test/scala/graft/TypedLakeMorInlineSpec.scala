package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** INLINE MOR SUBTRACTION — position-only delete debt applies INSIDE
  * the DSv2 scan (per-file sorted-ordinal skip sets in the partition
  * readers, the Iceberg position-delete / Delta deletion-vector read
  * path) instead of demoting the read to the v1 anti-join rewrite. The
  * point is composition: the scan keeps `SupportsReportStatistics`
  * (auto-broadcast of a mor dim), manifest-stats pruning, and — in the
  * bucketed twin spec — `KeyGroupedPartitioning`, all of which the v1
  * rewrite drops while deletes are live.
  */
class TypedLakeMorInlineSpec extends SparkSpec {

  private def freshCat(tag: String): String = {
    val w = Files.createTempDirectory(s"morin$tag").toString
    spark.conf.set(s"spark.sql.catalog.mi$tag", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.mi$tag.warehouse", w)
    w
  }

  /** Physical scan nodes of a finalized plan (through AQE). */
  private def scans(df: DataFrame): Seq[BatchScanExec] = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[BatchScanExec] =
      (p match {
        case b: BatchScanExec => Seq(b)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => Seq.empty
      })
    walk(df.queryExecution.executedPlan)
  }

  private def antiLegs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }.size

  test("position-only debt keeps the DSv2 scan: no anti-join leg in the " +
      "plan, reads/filters/aggregates correct, partition dirs intact, " +
      "and a pushed count(*) cannot see deleted rows") {
    val w = freshCat("a")
    spark.sql("""CREATE TABLE mia.t (id BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('statsFields' = 'id', 'dmlMode' = 'mor')""")
    spark.sql("""INSERT INTO mia.t
      SELECT id, id * 10, concat('r', id % 2) FROM range(100)""")
    spark.sql("DELETE FROM mia.t WHERE id IN (3, 7, 90)")
    val live = WeatherLakeV2Sink.committedMorDeleteFiles(s"$w/t")
    assert(live.nonEmpty && live.forall(TypedLake.isPosDelete), live)

    val q = spark.table("mia.t")
    // the read is the DSv2 scan itself — NOT the v1 Union + anti-join
    assert(antiLegs(q) == 0, q.queryExecution.optimizedPlan.toString)
    assert(scans(q).nonEmpty, q.queryExecution.executedPlan.toString)
    assert(q.count() == 97)
    assert(spark.sql("SELECT count(*) FROM mia.t").head.getLong(0) == 97,
      "a raw footer count(*) would say 100 — with aggregate pushdown off " +
        "the subtracting scan answers; with it on, the COMPENSATED " +
        "pushed count does (TypedLakeMorScanPhysicsSpec)")
    assert(spark.sql("SELECT count(*) FROM mia.t WHERE id IN (3, 7, 90)")
      .head.getLong(0) == 0)
    // data filters re-evaluate above the scan: a filter overlapping a
    // TARGETED file (its filterless whole-file read) stays exact
    assert(spark.sql("SELECT CAST(sum(v) AS BIGINT) FROM mia.t WHERE id < 10")
      .head.getLong(0) == (0L until 10L).filterNot(Set(3L, 7L)).map(_ * 10).sum)
    // partition-dir recovery unaffected
    assert(spark.sql("SELECT count(*) FROM mia.t WHERE region = 'r1'")
      .head.getLong(0) == 50 - 2) // ids 3, 7 are r1; 90 is r0
    // a second DELETE stacks (two skip files, same inline path)
    spark.sql("DELETE FROM mia.t WHERE id = 50")
    assert(spark.table("mia.t").count() == 96)
    // reconcile folds the debt; the scan is plain again
    spark.sql("CALL mia.system.reconcile('t')")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(s"$w/t").isEmpty)
    assert(spark.table("mia.t").count() == 96)
    spark.sql("DROP TABLE mia.t")
  }

  test("a mor dim with live position deletes still ELECTS auto-broadcast " +
      "with no hint — SupportsReportStatistics survives the debt") {
    val w = freshCat("b")
    spark.sql("""CREATE TABLE mib.dim (k BIGINT, name STRING) USING lake
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("""CREATE TABLE mib.fact (k BIGINT, v BIGINT) USING lake""")
    spark.sql("INSERT INTO mib.dim SELECT id, concat('d', id) FROM range(50)")
    spark.sql("INSERT INTO mib.fact SELECT id % 50, id FROM range(2000)")
    spark.sql("DELETE FROM mib.dim WHERE k = 49")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(s"$w/dim")
      .forall(TypedLake.isPosDelete))
    val j = spark.sql("""SELECT f.k, count(*) AS n, max(d.name) AS dn
      FROM mib.fact f JOIN mib.dim d ON f.k = d.k GROUP BY f.k""")
    j.collect()
    def hasBhj(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[BroadcastHashJoinExec] || p.children.exists(hasBhj) ||
        (p match {
          case a: AdaptiveSparkPlanExec => hasBhj(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            hasBhj(q.plan)
          case _ => false
        })
    assert(hasBhj(j.queryExecution.executedPlan),
      s"mor dim must still auto-broadcast:\n${j.queryExecution.executedPlan}")
    assert(j.count() == 49)
    // the DEMOTED (equality-flavor) rewrite keeps broadcastability too:
    // its v1 legs carry file-index size stats and anti-join/union stats
    // compose, so a small dim under the threshold still elects BHJ
    spark.sql("ALTER TABLE mib.dim SET TBLPROPERTIES " +
      "('morDeletes' = 'equality')")
    spark.sql("DELETE FROM mib.dim WHERE k = 48")
    val j2 = spark.sql("""SELECT f.k, count(*) AS n, max(d.name) AS dn
      FROM mib.fact f JOIN mib.dim d ON f.k = d.k GROUP BY f.k""")
    j2.collect()
    assert(hasBhj(j2.queryExecution.executedPlan),
      s"demoted mor dim must still auto-broadcast:\n" +
        j2.queryExecution.executedPlan)
    assert(j2.count() == 48)
    spark.sql("DROP TABLE mib.dim")
    spark.sql("DROP TABLE mib.fact")
  }

  test("demotion stays fail-safe: equality flavor, mixed flavors, and a " +
      "renamed schema all fall back to the v1 anti-join rewrite and " +
      "answer correctly") {
    val w = freshCat("c")
    spark.sql("""CREATE TABLE mic.t (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('dmlMode' = 'mor', 'morDeletes' = 'equality')""")
    spark.sql("INSERT INTO mic.t SELECT id, id * 2 FROM range(40)")
    spark.sql("DELETE FROM mic.t WHERE id = 5")
    val q1 = spark.table("mic.t")
    assert(antiLegs(q1) == 1, q1.queryExecution.optimizedPlan.toString)
    assert(q1.count() == 39)
    // mixed flavors: still the v1 path (two legs), still correct
    spark.sql("ALTER TABLE mic.t SET TBLPROPERTIES " +
      "('morDeletes' = 'position')")
    spark.sql("DELETE FROM mic.t WHERE id = 6")
    val q2 = spark.table("mic.t")
    assert(antiLegs(q2) == 2, q2.queryExecution.optimizedPlan.toString)
    assert(q2.count() == 38)
    // renamed schema: position-only debt but the DATA read needs the
    // widened mapping — demote
    spark.sql("CALL mic.system.compact_deletes('t')") // → position-only
    spark.sql("ALTER TABLE mic.t RENAME COLUMN v TO val")
    val q3 = spark.table("mic.t")
    assert(antiLegs(q3) == 1, q3.queryExecution.optimizedPlan.toString)
    assert(q3.count() == 38)
    assert(spark.sql("SELECT CAST(sum(val) AS BIGINT) FROM mic.t")
      .head.getLong(0) == (0L until 40L).filterNot(Set(5L, 6L)).map(_ * 2).sum)
    spark.sql("DROP TABLE mic.t")
  }

  test("ESCAPED partition values: inline subtraction keys planned splits " +
      "back to delete targets across the engine's URL encoding — a " +
      "literal-% partition dir neither resurrects nor over-deletes") {
    val w = freshCat("e")
    spark.sql("""CREATE TABLE mie.t (id BIGINT, region STRING) USING lake
      PARTITIONED BY (region) TBLPROPERTIES ('dmlMode' = 'mor')""")
    // 'a%20b' needs escaping on disk (literal percent), 'a b' too (space)
    spark.sql("""INSERT INTO mie.t SELECT id,
      CASE WHEN id % 2 = 0 THEN 'a%20b' ELSE 'a b' END FROM range(20)""")
    spark.sql("DELETE FROM mie.t WHERE id IN (2, 3)")
    val live = WeatherLakeV2Sink.committedMorDeleteFiles(s"$w/t")
    assert(live.nonEmpty && live.forall(TypedLake.isPosDelete), live)
    val q = spark.table("mie.t")
    assert(antiLegs(q) == 0, q.queryExecution.optimizedPlan.toString)
    assert(q.count() == 18)
    assert(spark.sql("SELECT count(*) FROM mie.t WHERE id IN (2, 3)")
      .head.getLong(0) == 0, "escaped-dir targets must still subtract")
    assert(spark.sql("SELECT count(*) FROM mie.t WHERE region = 'a%20b'")
      .head.getLong(0) == 9)
    assert(spark.sql("SELECT count(*) FROM mie.t WHERE region = 'a b'")
      .head.getLong(0) == 9)
    spark.sql("DROP TABLE mie.t")
  }

  test("time travel composes: a VERSION AS OF read with live position " +
      "deletes subtracts the PINNED snapshot's debt inline") {
    val w = freshCat("d")
    spark.sql("""CREATE TABLE mid.t (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("INSERT INTO mid.t SELECT id, id FROM range(30)") // v0
    spark.sql("DELETE FROM mid.t WHERE id = 1")                 // v1
    spark.sql("DELETE FROM mid.t WHERE id = 2")                 // v2
    assert(spark.table("mid.t").count() == 28)
    val pinned = spark.sql("SELECT * FROM mid.t VERSION AS OF 1")
    assert(antiLegs(pinned) == 0, pinned.queryExecution.optimizedPlan.toString)
    assert(pinned.count() == 29, "the pinned snapshot has ONE deletion")
    spark.sql("DROP TABLE mid.t")
  }
}
