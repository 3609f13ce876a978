package graft

import scala.jdk.CollectionConverters._

/** Plan-shape regression gate: the properties that make the catalog scale
  * (pushdowns, pruning, partitioned windows, no cartesian products) are
  * asserted on the ACTUAL physical plans, so losing one fails loudly in CI
  * instead of silently costing 2× at the bench. Complemented by the
  * committable `runMain graft.Explain --all` snapshots under plans/.
  */
class PlanInvariantsSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  test("q01: shipdate filter is pushed to the parquet scan") {
    val f = formatted("q01_pricing_summary")
    assert(f.contains("PushedFilters:"), "no pushdown section in scan")
    assert(f.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\].*"),
      "l_shipdate not in PushedFilters")
  }

  test("q01: scan prunes to the referenced columns only") {
    val f = formatted("q01_pricing_summary")
    val readSchema = f.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(readSchema.nonEmpty)
    assert(!readSchema.contains("l_orderkey"),
      s"unpruned column in scan: $readSchema")
    assert(!readSchema.contains("l_partkey"),
      s"unpruned column in scan: $readSchema")
  }

  test("q22: the gap-numbering window is partitioned, not a global sort") {
    val p = plan("q22_batching")
    assert(p.contains("hashpartitioning(__coarse"),
      "two-stage row numbering lost its coarse partitioning")
  }

  test("t10: the vocabulary rank window is partitioned, not a global sort") {
    // the only unpartitioned window allowed in this plan is the offset
    // stitch over the per-bucket COUNT frame (one row per coarse bucket);
    // the vocabulary itself must rank inside hash-partitioned buckets
    val p = plan("t10_vocabulary")
    assert(p.contains("hashpartitioning(__coarse"),
      "vocabulary rank lost its two-stage coarse partitioning")
  }

  test("q02: bounded dims join via broadcast") {
    val p = plan("q02_region_revenue")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "nation/region no longer broadcast")
  }

  test("q74: bucketed join plans ZERO exchanges on either join side") {
    // both inputs are bucketed 32 ways on the order key, so the sort-merge
    // join must consume the bucket layout directly; the only exchange
    // allowed in the plan is the 5-row priority aggregate's
    val p = plan("q74_bucketed_join")
    assert(p.contains("SortMergeJoin"), "bucketed join lost its SMJ shape")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
      "lineitem side re-shuffled despite bucketing")
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"),
      "orders side re-shuffled despite bucketing")
  }

  test("q74: bucket-sorted layout also elides the per-bucket sorts") {
    // the table is bucket-sorted on the join key with one file per
    // bucket, and the single-file opt-in conf is set at write time, so
    // the SMJ consumes the scan's reported ordering directly
    val p = plan("q74_bucketed_join")
    assert(!p.contains("Sort ["),
      "bucketed join re-sorted despite the bucket-sorted single-file layout")
  }

  test("q80: as-of over the bucketed layout plans ZERO exchanges and ZERO sorts") {
    // events bucketed 32 ways on user_id and bucket-sorted by
    // (user_id, ts, event_id) — exactly AsOfJoinExec's required
    // distribution and ordering, so both children plan bare:
    // scan → filter → project → AsOfJoin
    val p = plan("q80_asof_bucketed")
    assert(p.contains("AsOfJoin"), "q80 lost the native as-of operator")
    assert(!p.contains("Exchange"),
      s"as-of over bucketed events must not shuffle:\n$p")
    assert(!p.contains("Sort ["),
      s"as-of over bucket-sorted events must not re-sort:\n$p")
  }

  test("q81: broadcast as-of plans NO shuffle and NO sort on either side") {
    // the small reference side broadcasts; the event-scale left side
    // reads straight from its scan — the whole point of the form
    val p = plan("q81_asof_broadcast")
    assert(p.contains("BroadcastAsOfJoin"), "q81 lost the broadcast form")
    assert(p.contains("BroadcastExchange"), "right side must broadcast")
    assert(!p.contains("Exchange hashpartitioning"),
      s"broadcast as-of must not shuffle:\n$p")
    assert(!p.contains("Sort ["),
      s"broadcast as-of must not sort:\n$p")
  }

  test("q75: both box predicates push to the parquet scan under the " +
    "native z-order projection") {
    val f = formatted("q75_zorder_scan")
    assert(f.matches("(?s).*PushedFilters: \\[[^\\]]*l_orderkey[^\\]]*\\].*"),
      "l_orderkey box not in PushedFilters")
    assert(f.matches("(?s).*PushedFilters: \\[[^\\]]*l_partkey[^\\]]*\\].*"),
      "l_partkey box not in PushedFilters")
  }

  test("t25/t26/m03: linear text/binary operators keep at most the final " +
    "aggregate exchange") {
    // these are scan→project(+explode)→agg shapes; a second exchange means
    // an accidental shuffle crept into a linear operator
    for (q <- Seq("t25_gopher_rules", "m03_header_fields", "t26_bpe_tokenize")) {
      val exchanges = plan(q).linesIterator
        .count(l => l.contains("Exchange ") && !l.contains("BroadcastExchange"))
      val allowed = if (q == "t25_gopher_rules" || q == "m03_header_fields") 0 else 1
      assert(exchanges <= allowed,
        s"$q plans $exchanges shuffle exchanges (allowed $allowed)")
    }
  }

  test("q92: BOTH SQL ASOF occurrences plan to the native operator") {
    val p = plan("q92_asof_sql_multi")
    val n = "(?i)asofjoin".r.findAllIn(p).size
    assert(n >= 2, s"expected two native as-of nodes in the plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "the chained ASOF statement must not fall back to a generic join")
  }

  test("q36: IN subqueries decorrelate to semi-joins") {
    val p = plan("q36_nested_in_subqueries")
    assert(p.contains("LeftSemi"), "predicate subquery not rewritten to semi-join")
  }

  test("q37: single-scan rewrite reads lineitem ONCE, windows stay partitioned") {
    // The Q21 shape is written as the single-scan window rewrite: both
    // EXISTS self-joins collapse into per-order collect_set windows. The
    // properties that make it scale: exactly one lineitem scan (the naive
    // decorrelated form needs three) and windows partitioned on l_orderkey
    // (never a global sort).
    val f = formatted("q37_semi_anti_self_join")
    val lineitemScans = f.linesIterator.count(l =>
      l.contains("ReadSchema:") && l.contains("l_suppkey"))
    assert(lineitemScans == 1, s"expected 1 lineitem scan, saw $lineitemScans")
    val p = plan("q37_semi_anti_self_join")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      "rewrite regressed to decorrelated self-joins")
    assert(p.contains("windowspecdefinition(l_orderkey"),
      "window lost its l_orderkey partitioning")
  }

  test("q05/q41: NOT EXISTS / NOT IN decorrelate to anti-joins") {
    // q37 no longer exercises anti-join decorrelation (its Spark side is
    // the single-scan rewrite); these two still must.
    assert(plan("q05_customers_no_orders").contains("LeftAnti"),
      "q05 anti-join lost")
    assert(plan("q41_global_avg_anti").contains("LeftAnti"),
      "q41 NOT IN not rewritten to anti-join")
  }

  test("lake scans report statistics: a SMALL catalog table (classic AND " +
      "typed) joined to a big frame elects BroadcastHashJoin WITHOUT a " +
      "hint") {
    val w = java.nio.file.Files.createTempDirectory("statswh").toString
    spark.conf.set("spark.sql.catalog.statlake", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.statlake.warehouse", w)
    // typed dim: 25 rows of parquet — FileScan-inherited stats
    spark.sql("""CREATE TABLE statlake.dim_t (k BIGINT, name STRING)
      USING lake""")
    spark.sql("""INSERT INTO statlake.dim_t
      SELECT id AS k, concat('n-', id) AS name FROM range(25)""")
    // classic dim: 25 JSON lines — LakeTableScan's own estimateStatistics
    spark.sql("""CREATE TABLE statlake.dim_c
      (city STRING, ds STRING, hour STRING, value STRING) USING lake""")
    spark.sql("""INSERT INTO statlake.dim_c
      SELECT concat('c', id % 5), '2024-01-01', '00',
        concat('line-', id) FROM range(25)""")
    val big = spark.range(500000).selectExpr("id % 25 AS k",
      "concat('c', id % 5) AS city", "id AS v")
    val pt = big.join(spark.table("statlake.dim_t"), "k")
      .groupBy("name").count()
      .queryExecution.executedPlan.toString
    assert(pt.contains("BroadcastHashJoin"),
      s"typed lake dim not auto-broadcast:\n$pt")
    val pc = big.join(spark.table("statlake.dim_c"), "city")
      .groupBy("ds").count()
      .queryExecution.executedPlan.toString
    assert(pc.contains("BroadcastHashJoin"),
      s"classic lake dim not auto-broadcast:\n$pc")
    // and the reported size is the real on-disk footprint, not a default
    val scan = spark.table("statlake.dim_c").queryExecution.executedPlan
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }.get
    val sz = scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().sizeInBytes()
    assert(sz.isPresent && sz.getAsLong > 0 && sz.getAsLong < 1024 * 1024,
      s"classic scan size estimate off: $sz")
  }

  test("sweep: no CartesianProduct, and plans/ snapshots are FRESH") {
    // iterative queries (d06) run their loop during plan construction at
    // sf0.001 — acceptable here; this sweep is the whole point of the gate.
    // Freshness: the committed plans/<name>.txt snapshots must byte-match
    // the scrubbed formatted plan of the CURRENT code — a plan regression
    // can no longer hide behind a stale snapshot. Regenerate with
    // `sbt "runMain graft.Explain --all"` after any intentional change.
    val dir = java.nio.file.Paths.get("plans")
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val qe = SparkEntry.queries(name)(spark, sf0001).queryExecution
      assert(!qe.executedPlan.toString.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      val actual = Explain.scrub(qe.explainString(
        org.apache.spark.sql.execution.FormattedMode), sf0001)
      val snap = dir.resolve(s"$name.txt")
      assert(java.nio.file.Files.exists(snap),
        s"missing snapshot plans/$name.txt — run `sbt \"runMain graft.Explain --all\"`")
      val committed = java.nio.file.Files.readString(snap)
      if (committed != actual) {
        val firstDiff = committed.linesIterator.zipAll(
          actual.linesIterator, "<EOF>", "<EOF>")
          .zipWithIndex.collectFirst { case ((a, b), i) if a != b =>
            s"line ${i + 1}: committed '$a' vs actual '$b'" }
        fail(s"STALE snapshot plans/$name.txt (${firstDiff.getOrElse("?")}) — " +
          "regenerate with `sbt \"runMain graft.Explain --all\"`")
      }
    }
    // and no ORPHANS: every committed snapshot must belong to a registered
    // query, so a renamed/deleted query can't leave a stale file that
    // still looks like coverage
    val orphans = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".txt"))
      .map(_.stripSuffix(".txt"))
      .filterNot(SparkEntry.queries.keySet)
      .toSeq.sorted
    assert(orphans.isEmpty, s"orphan snapshots with no registered query: $orphans")
  }
}
