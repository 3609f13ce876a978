package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.sources.{LakeCatalog, TypedLake, WeatherLakeV2Sink}

/** RUNTIME FILE PRUNING (`SupportsRuntimeV2Filtering`, round 16): the
  * engine evaluates the selective side of a join first and hands the
  * lake scan IN/equality predicates on any advertised attribute —
  * partition columns (classic dynamic partition pruning) AND
  * stats-covered fields (dynamic FILE pruning: a dim-driven value set
  * skips fact files whose manifest min/max range can't contain it,
  * before a single footer is opened). Every unknown fails open; the
  * join re-evaluates, so pruning is IO-only, never correctness.
  * Bucketed scans advertise nothing (SPJ alignment outweighs the
  * prune).
  */
class TypedLakeRuntimePruningSpec extends SparkSpec {

  private def freshCat(tag: String): String = {
    val w = Files.createTempDirectory(s"rtp$tag").toString
    spark.conf.set(s"spark.sql.catalog.rp$tag", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.rp$tag.warehouse", w)
    w
  }

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children.flatMap(walk) ++ p.subqueries.flatMap(walk) ++ (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case _ => Seq.empty
    }))

  /** (kept, total) of the lake scans a runtime filter actually fired
    * on, after execution.
    */
  private def keptFiles(df: DataFrame): Seq[(Int, Int)] = {
    df.collect()
    walk(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan
    }.collect {
      case s: LakeCatalog.TypedLakeStreamableScan => s.runtimeKeptFiles
    }.flatten
  }

  // NOTE on (kept, total) assertions: under AQE the materialized dim
  // values may ALSO re-push into a fresh scan as a literal IN at
  // re-optimization, pre-pruning the delegate — kept == planned-total
  // is then correct. The robust invariant compares kept against the
  // table's COMMITTED file count.
  private def committedCount(cat: String, table: String): Int =
    WeatherLakeV2Sink.committedFiles(
      s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/$table").size

  test("dynamic PARTITION pruning: a selective dim filter prunes the " +
      "fact's partition directories at runtime — whole files skipped, " +
      "answers exact") {
    freshCat("a")
    spark.sql("""CREATE TABLE rpa.fact (id BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)""")
    // several commits → several files per region
    (0 until 3).foreach { i =>
      spark.sql(s"""INSERT INTO rpa.fact
        SELECT id + ${i * 100}, id, concat('r', id % 8) FROM range(100)""")
    }
    spark.sql("CREATE TABLE rpa.dim (region STRING, tag STRING) USING lake")
    spark.sql("""INSERT INTO rpa.dim
      SELECT concat('r', id), concat('t', id) FROM range(8)""")

    val q = spark.sql("""SELECT f.region, count(*) AS n
      FROM rpa.fact f JOIN rpa.dim d ON f.region = d.region
      WHERE d.tag = 't3' GROUP BY f.region""")
    val kept = keptFiles(q)
    assert(q.queryExecution.executedPlan.toString
      .toLowerCase.contains("dynamicpruning"),
      s"expected a runtime filter on the fact scan:\n" +
        q.queryExecution.executedPlan)
    val total = committedCount("rpa", "fact")
    assert(kept.nonEmpty && kept.forall { case (k, _) =>
      k > 0 && k < total },
      s"runtime filter must drop whole partition files " +
        s"(committed=$total), got $kept")
    // ids ≡ 3 (mod 8) within each insert's range(100): 13 per insert × 3
    assert(q.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("r3", 39)))
  }

  test("dynamic FILE pruning on a STATS column: a dim-driven id set " +
      "skips fact files whose manifest min/max range cannot contain it " +
      "(no partition layout involved)") {
    freshCat("b")
    spark.sql("""CREATE TABLE rpb.fact (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('statsFields' = 'id')""")
    // four disjoint id-range files (one partition each → one file each)
    (0 until 4).foreach { i =>
      spark.sql(s"""INSERT INTO rpb.fact
        SELECT id, id * 10 FROM range(${i * 1000}, ${i * 1000 + 500}, 1, 1)""")
    }
    assert(WeatherLakeV2Sink.committedFiles(
      s"${spark.conf.get("spark.sql.catalog.rpb.warehouse")}/fact").size == 4)
    spark.sql("CREATE TABLE rpb.dim (id BIGINT, grp STRING) USING lake")
    spark.sql("""INSERT INTO rpb.dim
      SELECT id * 1000 + 17, concat('g', id % 2) FROM range(4)""")

    val q = spark.sql("""SELECT CAST(sum(f.v) AS BIGINT) AS s
      FROM rpb.fact f JOIN rpb.dim d ON f.id = d.id WHERE d.grp = 'g1'""")
    val kept = keptFiles(q)
    // dim g1 rows: ids 1017 and 3017 → exactly 2 of the 4 range-files
    // can contain them
    assert(kept.nonEmpty && kept.forall(_._1 == 2),
      s"stats ranges must prune to the 2 covering files, got $kept")
    assert(q.head.getLong(0) == (1017L + 3017L) * 10)
  }

  test("runtime pruning composes with INLINE MOR: pruned targeted files " +
      "skip their delete-file subtraction entirely, surviving ones still " +
      "subtract — answers exact") {
    freshCat("c")
    spark.sql("""CREATE TABLE rpc.fact (id BIGINT, v BIGINT, region STRING)
      USING lake PARTITIONED BY (region)
      TBLPROPERTIES ('dmlMode' = 'mor', 'statsFields' = 'id')""")
    spark.sql("""INSERT INTO rpc.fact
      SELECT id, id * 10, concat('r', id % 4) FROM range(200)""")
    spark.sql("DELETE FROM rpc.fact WHERE id IN (7, 11, 102)")
    spark.sql("CREATE TABLE rpc.dim (region STRING, tag STRING) USING lake")
    spark.sql("""INSERT INTO rpc.dim
      SELECT concat('r', id), concat('t', id) FROM range(4)""")

    val q = spark.sql("""SELECT count(*) AS n
      FROM rpc.fact f JOIN rpc.dim d ON f.region = d.region
      WHERE d.tag = 't3'""")
    val kept = keptFiles(q)
    val total = committedCount("rpc", "fact")
    assert(kept.nonEmpty && kept.forall { case (k, _) => k < total },
      s"mor runtime pruning must drop files (committed=$total), got $kept")
    // region r3: ids ≡ 3 (mod 4) → 50, minus deleted ids 7 and 11
    assert(q.head.getLong(0) == 48)
  }

  test("bucketed scans advertise NO runtime-filter attributes — the " +
      "storage-partitioned join's alignment outweighs the prune") {
    freshCat("d")
    spark.sql("""CREATE TABLE rpd.b (k BIGINT, v BIGINT) USING lake
      PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('statsFields' = 'k')""")
    spark.sql("INSERT INTO rpd.b SELECT id, id FROM range(100)")
    val q = spark.table("rpd.b")
    q.collect()
    val attrs = walk(q.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan
    }.collect {
      case s: LakeCatalog.TypedLakeStreamableScan => s.filterAttributes()
    }
    assert(attrs.nonEmpty && attrs.forall(_.isEmpty), attrs.toSeq)
  }
}
