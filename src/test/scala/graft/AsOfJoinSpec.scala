package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.{AsOfBroadcast, AsOfDirection, AsOfJoinExec, AsOfJoinPlan, AsOfJoinStrategy, GraftExtensions}

/** The native backward as-of join (custom LogicalPlan + Strategy + Exec):
  * semantics pinned to the composed window formulation q18 uses, plus the
  * plan-shape and null/tie edge cases a physical operator must own.
  */
class AsOfJoinSpec extends SparkSpec {

  private def trades = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L),
      ("B", 15L, 4L), ("C", 5L, 5L)
    ).toDF("sym", "t", "trade_id")
  }

  private def quotes = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", 5L, 100L), ("A", 10L, 101L), ("A", 25L, 102L),
      ("B", 99L, 103L), ("D", 1L, 104L)
    ).toDF("sym", "t", "px")
  }


  /** The SEMANTIC tests below pin the MERGE exec's tie/boundary/tolerance
    * behavior explicitly (broadcast = Never): under the Auto default the
    * tiny fixtures always satisfy the broadcast threshold, which would
    * silently re-point every targeted case at BroadcastAsOfJoinExec. The
    * broadcast form's parity is pinned separately (the dedicated
    * broadcast tests + the PropertySpec sweep across both forms).
    */
  private def mergeAsof(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame,
      keys: Seq[(String, String)], order: Seq[(String, String)],
      strict: Boolean = false, tolerance: Option[Long] = None,
      direction: AsOfDirection = AsOfDirection.Backward): org.apache.spark.sql.DataFrame =
    AsOfJoinPlan.asofJoin(l, r, keys, order, strict = strict,
      tolerance = tolerance, direction = direction,
      broadcast = AsOfBroadcast.Never)

  test("asofJoin backward non-strict: last quote at-or-before each trade") {
    val got = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"), strict = false)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set(
      ("A", 10L, 101L), // exact-time quote matches when non-strict
      ("A", 20L, 101L),
      ("A", 30L, 102L),
      ("B", 15L, -1L),  // only future quote for B
      ("C", 5L, -1L)))  // no quotes at all for C
  }

  test("asofJoin strict: an equal-time right row no longer matches") {
    val got = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"), strict = true)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got(("A", 10L, 100L))) // t=10 now takes the t=5 quote
  }

  test("asofJoin: null keys never match, null order rows are skipped") {
    val s = spark
    import s.implicits._
    val l = Seq((Option("A"), Option(10L), 1L), (Option.empty[String], Option(10L), 2L))
      .toDF("k", "t", "id")
    val r = Seq((Option("A"), Option(5L), 7L), (Option("A"), Option.empty[Long], 8L),
        (Option.empty[String], Option(1L), 9L))
      .toDF("k", "t", "v")
    val got = mergeAsof(l, r,
        keys = Seq("k" -> "k"), order = Seq("t" -> "t"))
      .select(col("id"), col("v_r"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got == Map(1L -> 7L, 2L -> -1L))
  }

  test("asofJoin matches the q18 window formulation on the events fixture") {
    val ev = Tables.events(spark, sf0001)
    // window formulation (q18's exact shape)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = ev.filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("last_click_ts")).as("click_us"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Long.MinValue else r.getLong(1))).toMap
    // native operator, composite strict ordering (ts, event_id)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val got = mergeAsof(purchases, clicks,
        keys = Seq("user_id" -> "user_id"),
        order = Seq("ts" -> "ts", "event_id" -> "event_id"), strict = true)
      .select(col("event_id"), unix_micros(col("ts_r")).as("click_us"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Long.MinValue else r.getLong(1))).toMap
    assert(got.nonEmpty && got == expected)
  }

  test("asofJoin tolerance: buffered matches age out of the window") {
    // quotes at t=5,10,25 for A; tolerance 6 units of t
    val got = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = false, tolerance = Some(6L))
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set(
      ("A", 10L, 101L), // exact-time quote, diff 0
      ("A", 20L, -1L),  // last quote t=10 is 10 units stale → aged out
      ("A", 30L, 102L), // t=25 quote, diff 5 ≤ 6
      ("B", 15L, -1L),
      ("C", 5L, -1L)))
    // boundary: diff == tolerance still matches (c.ts >= p.ts - tol)
    val boundary = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = false, tolerance = Some(10L))
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(boundary(("A", 20L, 101L)), "diff-equals-tolerance must match")
    // tolerance on a non-integral head ordering column is rejected
    val s = spark
    import s.implicits._
    val dbl = Seq(("A", 1.5, 1L)).toDF("sym", "t", "id")
    intercept[IllegalArgumentException] {
      mergeAsof(dbl, dbl, keys = Seq("sym" -> "sym"),
        order = Seq("t" -> "t"), tolerance = Some(1L))
    }
  }

  test("asofJoin forward: first quote at-or-after each trade") {
    val got = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = false, direction = AsOfDirection.Forward)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set(
      ("A", 10L, 101L), // exact-time quote matches when non-strict
      ("A", 20L, 102L),
      ("A", 30L, -1L),  // no quote after t=30
      ("B", 15L, 103L), // B's only quote is in the future
      ("C", 5L, -1L)))
    // strict: the t=10 trade skips the equal-time quote
    val strict = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = true, direction = AsOfDirection.Forward)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(strict(("A", 10L, 102L)), "strict forward must skip the equal-time quote")
    // tolerance bounds the lookAHEAD window
    val tol = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = false, tolerance = Some(6L),
        direction = AsOfDirection.Forward)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(tol == Set(
      ("A", 10L, 101L), // diff 0
      ("A", 20L, 102L), // t=25 quote, diff 5 <= 6
      ("A", 30L, -1L),
      ("B", 15L, -1L),  // t=99 quote is 84 units ahead → out of window
      ("C", 5L, -1L)))
  }

  test("asofJoin nearest: closer of the two candidates, ties go backward") {
    val got = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = false, direction = AsOfDirection.Nearest)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set(
      ("A", 10L, 101L), // exact match, distance 0
      ("A", 20L, 102L), // backward t=10 (d=10) vs forward t=25 (d=5) → forward
      ("A", 30L, 102L), // only a backward candidate
      ("B", 15L, 103L), // only a forward candidate
      ("C", 5L, -1L)))
    // equidistant candidates: backward wins (pandas tie rule)
    val s = spark
    import s.implicits._
    val l = Seq(("A", 10L, 1L)).toDF("sym", "t", "id")
    val r = Seq(("A", 5L, 100L), ("A", 15L, 200L)).toDF("sym", "t", "px")
    val tie = mergeAsof(l, r,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        direction = AsOfDirection.Nearest)
      .select(col("px_r")).collect().map(_.getLong(0)).toSeq
    assert(tie == Seq(100L), "equidistant nearest must prefer the backward row")
    // strict nearest excludes the equal-time quote from BOTH sides
    val strict = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = true, direction = AsOfDirection.Nearest)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(strict(("A", 10L, 100L)), // t=5 (d=5) beats t=25 (d=15)
      s"strict nearest must take the t=5 quote, got $strict")
    // tolerance prunes candidates on both sides before the distance pick
    val tol = mergeAsof(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = false, tolerance = Some(6L),
        direction = AsOfDirection.Nearest)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(tol(("B", 15L, -1L)), "nearest candidate outside tolerance must drop")
    assert(tol(("A", 20L, 102L)), "in-window forward candidate must survive")
    // nearest needs an integral/timestamp head ordering column
    val dbl = Seq(("A", 1.5, 1L)).toDF("sym", "t", "id")
    intercept[IllegalArgumentException] {
      mergeAsof(dbl, dbl, keys = Seq("sym" -> "sym"),
        order = Seq("t" -> "t"), direction = AsOfDirection.Nearest)
    }
  }

  test("broadcast as-of: identical results with the left side planned bare") {
    // semantics: byte-for-byte the merge form's answers
    def results(bcast: Boolean): Set[(String, Long, Long)] =
      AsOfJoinPlan.asofJoin(trades, quotes,
          keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
          strict = false,
          broadcast = if (bcast) AsOfBroadcast.Force else AsOfBroadcast.Never)
        .select(col("sym"), col("t"), col("px_r"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(results(bcast = true) == results(bcast = false))
    // and for nearest with tolerance (exercises choose() via binary search)
    def nearest(bcast: Boolean): Set[(String, Long, Long)] =
      AsOfJoinPlan.asofJoin(trades, quotes,
          keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
          strict = true, tolerance = Some(6L),
          direction = AsOfDirection.Nearest,
          broadcast = if (bcast) AsOfBroadcast.Force else AsOfBroadcast.Never)
        .select(col("sym"), col("t"), col("px_r"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(nearest(bcast = true) == nearest(bcast = false))
    // plan: right broadcasts, the LEFT needs no exchange and no sort
    val df = AsOfJoinPlan.asofJoin(trades, quotes,
      keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
      broadcast = AsOfBroadcast.Force)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"broadcast as-of must not shuffle either side:\n$plan")
    assert(!plan.contains("Sort ["),
      s"broadcast as-of must not sort the left side:\n$plan")
  }

  test("downstream operators reuse the as-of join's partitioning AND ordering") {
    // the exec declares outputPartitioning/outputOrdering = the left
    // child's, so a per-key consumer after the join must not re-exchange
    // and a (key, ts)-windowed consumer must not re-sort — the plan pays
    // the clustering once for the whole chain
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val joinedDf = AsOfJoinPlan.asofJoin(purchases, clicks,
      keys = Seq("user_id" -> "user_id"),
      order = Seq("ts" -> "ts", "event_id" -> "event_id"), strict = true,
      broadcast = AsOfBroadcast.Never) // the merge form's properties are under test
    // consumer 1: per-user aggregate — only the join's two child
    // exchanges may appear (none between join and aggregate). Exchanges
    // materialize in the executed plan (EnsureRequirements), whose string
    // rendering includes the full initial plan under AQE.
    val agg = joinedDf.groupBy(col("user_id"))
      .agg(count(col("ts_r")).as("n_attributed"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(aggPlan).size == 2,
      s"per-user agg must reuse the join's clustering:\n$aggPlan")
    assert(agg.count() > 0)
    // consumer 2: a (user_id, ts, event_id)-ordered window — its frame is
    // satisfied by the join's declared output ordering, so only the
    // join's two child sorts may appear
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val win = joinedDf.withColumn("rn", row_number().over(w))
    val winPlan = win.queryExecution.executedPlan.toString
    assert("- Sort \\[".r.findAllIn(winPlan).size == 2,
      s"window must consume the join's output ordering:\n$winPlan")
    assert("Exchange hashpartitioning".r.findAllIn(winPlan).size == 2,
      s"window must reuse the join's clustering:\n$winPlan")
    assert(win.count() > 0)
  }

  test("asofJoin rejects mismatched key/order dataTypes at construction") {
    val s = spark
    import s.implicits._
    val l = Seq(("A", 10L, 1L)).toDF("sym", "t", "id")
    val rIntKey = Seq((1, 5L, 100L)).toDF("sym", "t", "px")
    intercept[IllegalArgumentException] {
      AsOfJoinPlan.asofJoin(l, rIntKey,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"))
    }
    val rIntOrd = Seq(("A", 5, 100L)).toDF("sym", "t", "px")
    intercept[IllegalArgumentException] {
      AsOfJoinPlan.asofJoin(l, rIntOrd,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"))
    }
  }

  test("asofJoin plans as AsOfJoinExec: no window, no union, merge on clustered sides") {
    val df = AsOfJoinPlan.asofJoin(trades, quotes,
      keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
      broadcast = AsOfBroadcast.Never) // pin the merge form; Auto would broadcast these tiny frames
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "native as-of must not fall back to a window")
    assert(!plan.contains("Union"), "native as-of must not union its inputs")
    // sanity: the physical node really is ours (sparkPlan, because the
    // AdaptiveSparkPlanExec wrapper hides its input from collect)
    val execs = df.queryExecution.sparkPlan.collect { case e: AsOfJoinExec => e }
    assert(execs.nonEmpty)
  }

  test("optimizer rule: left-only filters push through AsOfJoin into the scan") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val df = AsOfJoinPlan.asofJoin(purchases, clicks,
        keys = Seq("user_id" -> "user_id"), order = Seq("ts" -> "ts"))
      .filter(col("event_id") > 500L)
    // semantic check: same rows as filtering AFTER the join without the rule
    val expected = AsOfJoinPlan.asofJoin(purchases, clicks,
        keys = Seq("user_id" -> "user_id"), order = Seq("ts" -> "ts"))
      .collect().filter(r => r.getLong(1) > 500L).length
    assert(df.count() == expected)
    // plan check: the predicate reached the LEFT parquet scan's pushdown,
    // and no Filter remains above the as-of join
    val physical = df.queryExecution.executedPlan.toString
    // (the plan printer truncates long PushedFilters lists, so match the
    // predicate's prefix)
    assert(physical.contains("GreaterThan(event_id,5"),
      s"left-only predicate must reach PushedFilters:\n$physical")
    val optimized = df.queryExecution.optimizedPlan
    val filterAboveJoin = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[graft.plans.AsOfJoin] => f
    }
    assert(filterAboveJoin.isEmpty, s"filter stayed above the join:\n$optimized")
  }

  test("optimizer rule: projection prunes both children down to needed + key/order columns") {
    val ev = Tables.events(spark, sf0001)
    // carry a WIDE extra column on each side; project it away above the join
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("props"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("props"))
    val df = AsOfJoinPlan.asofJoin(purchases, clicks,
        keys = Seq("user_id" -> "user_id"),
        order = Seq("ts" -> "ts", "event_id" -> "event_id"))
      .select(col("user_id"), col("ts_r"))
    // props never needs to leave either scan
    val schemas = "ReadSchema: [^\\n]*".r
      .findAllIn(df.queryExecution.executedPlan.toString).toList
    assert(schemas.nonEmpty && schemas.forall(!_.contains("props")),
      s"props must be pruned from every scan, got $schemas")
    assert(df.count() > 0)
  }

  test("optimizer rule: pushdown and pruning hold for the forward direction too") {
    // the rule rests on the operator's 1:1-per-left-row contract, which is
    // direction-independent — prove it on a non-backward plan
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("props"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("props"))
    val df = AsOfJoinPlan.asofJoin(purchases, clicks,
        keys = Seq("user_id" -> "user_id"),
        order = Seq("ts" -> "ts", "event_id" -> "event_id"),
        direction = AsOfDirection.Forward)
      .filter(col("event_id") > 500L)
      .select(col("user_id"), col("ts_r"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThan(event_id,5"),
      s"left-only predicate must reach PushedFilters under Forward:\n$physical")
    val schemas = "ReadSchema: [^\\n]*".r.findAllIn(physical).toList
    assert(schemas.nonEmpty && schemas.forall(!_.contains("props")),
      s"props must be pruned from every scan under Forward, got $schemas")
    assert(df.count() > 0)
  }

  test("strategy picks the physical form from right-side stats, like BHJ-vs-SMJ") {
    def form(broadcast: AsOfBroadcast): String = {
      val df = AsOfJoinPlan.asofJoin(trades, quotes,
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        broadcast = broadcast)
      val sp = df.queryExecution.sparkPlan
      if (sp.collectFirst { case e: graft.plans.BroadcastAsOfJoinExec => e }.isDefined)
        "broadcast"
      else if (sp.collectFirst { case e: AsOfJoinExec => e }.isDefined) "merge"
      else "neither"
    }
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // small right side under the default threshold → Auto broadcasts
      assert(form(AsOfBroadcast.Auto) == "broadcast")
      // threshold disabled (the 100 TB posture) → Auto merges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(form(AsOfBroadcast.Auto) == "merge")
      // the manual flags override the stats in BOTH directions
      assert(form(AsOfBroadcast.Force) == "broadcast",
        "Force must broadcast even with the threshold disabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      assert(form(AsOfBroadcast.Never) == "merge",
        "Never must merge even when stats are under the threshold")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("broadcast as-of builds its index once per executor, not once per partition") {
    val s = spark
    import s.implicits._
    // many left partitions sharing one executor JVM (local mode): every
    // task must reuse the first build
    val l = (1 to 400).map(i => ("k" + (i % 3), i.toLong, i.toLong))
      .toDF("sym", "t", "id").repartition(8)
    val r = (1 to 30).map(i => ("k" + (i % 3), i.toLong, i * 100L))
      .toDF("sym", "t", "px")
    val before = graft.plans.BroadcastAsOfJoinExec.indexBuildCount.get()
    val joined = AsOfJoinPlan.asofJoin(l, r,
      keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
      broadcast = AsOfBroadcast.Force)
    assert(joined.count() == 400)
    val builds = graft.plans.BroadcastAsOfJoinExec.indexBuildCount.get() - before
    assert(builds == 1L,
      s"expected ONE index build shared by all 8 partitions, got $builds")
  }

  test("left rows with a null ordering value never match, in any direction") {
    val s = spark
    import s.implicits._
    // nulls-first child ordering puts the null-ordered left at the head of
    // its group — exactly where an unguarded forward lookahead would
    // attach the group's first right row
    val l = Seq(("A", Option(10L), 1L), ("A", Option.empty[Long], 2L))
      .toDF("sym", "t", "id")
    val r = Seq(("A", 5L, 100L), ("A", 15L, 200L)).toDF("sym", "t", "px")
    for (dir <- Seq(AsOfDirection.Backward, AsOfDirection.Forward,
        AsOfDirection.Nearest);
        bc <- Seq(AsOfBroadcast.Never, AsOfBroadcast.Force)) {
      val got = AsOfJoinPlan.asofJoin(l, r,
          keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
          direction = dir, broadcast = bc)
        .select(col("id"), col("px_r"))
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      assert(got(2L) == -1L,
        s"null-ordered left must be unmatched under $dir/$bc, got $got")
      assert(got(1L) != -1L, s"non-null left must still match under $dir/$bc")
    }
  }

  test("merge form stays correct under a single dominating hot key") {
    // one bot user owns 90% of both sides — the whole group lands on one
    // task (AQE's skew split does NOT apply to a custom node; the escape
    // hatches are the broadcast form or a composite key, see PLANS.md) —
    // correctness must hold regardless
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val ls = (0 until 300).map { i =>
      val k = if (i < 270) "hot" else "k" + (i % 7)
      (k, rnd.nextInt(50).toLong, i.toLong)
    }
    val rs = (0 until 300).map { i =>
      val k = if (i < 270) "hot" else "k" + (i % 7)
      (k, rnd.nextInt(50).toLong, (1000 + i).toLong)
    }
    val got = AsOfJoinPlan.asofJoin(
        ls.toDF("k", "t", "id").repartition(8),
        rs.toDF("k", "t", "id").repartition(8),
        keys = Seq("k" -> "k"), order = Seq("t" -> "t", "id" -> "id"),
        strict = true, broadcast = AsOfBroadcast.Never)
      .select(col("id"), col("id_r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val expected = ls.map { case (lk, lt, lid) =>
      val m = rs.filter { case (rk, rt, rid) =>
        rk == lk && (rt < lt || (rt == lt && rid < lid))
      }.sortBy { case (_, rt, rid) => (rt, rid) }.lastOption
      lid -> m.map(_._3).getOrElse(-1L)
    }.toMap
    assert(got == expected)
  }

  test("time-sliced as-of spreads a hot key across reduce tasks") {
    // one bot user owns 95% of both sides, spanning 40 slices: the plain
    // merge lands the whole key on ONE task; the sliced form clusters on
    // (key, slice) and must spread it. AQE coalescing off so partition
    // occupancy reflects the hash clustering, not post-hoc merging.
    val s = spark
    import s.implicits._
    val oldAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ls = (0 until 800).map { i =>
        val k = if (i < 760) "hot" else "k" + (i % 5)
        (k, (i * 7L) % 4000L, i.toLong)
      }
      val rs = (0 until 800).map { i =>
        val k = if (i < 760) "hot" else "k" + (i % 5)
        (k, (i * 11L) % 4000L, (10000 + i).toLong)
      }
      def spread(df: org.apache.spark.sql.DataFrame): Double = {
        val counts = df.groupBy(spark_partition_id().as("p")).count()
          .collect().map(_.getLong(1))
        counts.max.toDouble / counts.sum
      }
      val plain = AsOfJoinPlan.asofJoin(
        ls.toDF("k", "t", "id"), rs.toDF("k", "t", "id"),
        keys = Seq("k" -> "k"), order = Seq("t" -> "t", "id" -> "id"),
        strict = true, tolerance = Some(100L),
        broadcast = AsOfBroadcast.Never)
      val sliced = AsOfJoinPlan.asofJoinTimeSliced(
        ls.toDF("k", "t", "id"), rs.toDF("k", "t", "id"),
        keys = Seq("k" -> "k"), order = Seq("t" -> "t", "id" -> "id"),
        toleranceUs = 100L, sliceUs = 100L,
        strict = true, broadcast = AsOfBroadcast.Never)
      // identical answers...
      def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.select(col("id"), col("id_r")).collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(toMap(sliced) == toMap(plain))
      // ...but the hot key no longer serializes
      assert(spread(plain) >= 0.9,
        "fixture is not skewed enough to demonstrate anything")
      assert(spread(sliced) <= 0.5,
        "sliced as-of failed to spread the hot key across reduce tasks")
    } finally s.conf.set("spark.sql.adaptive.enabled", oldAqe)
  }

  test("time-sliced as-of refuses inputs that carry its reserved " +
      "internal column names instead of silently replacing them") {
    val s = spark
    import s.implicits._
    val l = Seq(("a", 1L, 9L)).toDF("k", "t", "__asof_slice")
    val r = Seq(("a", 1L, 9L)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asofJoinTimeSliced(l, r,
        keys = Seq("k" -> "k"), order = Seq("t" -> "t"),
        toleranceUs = 10L, sliceUs = 10L)
    }
    assert(e.getMessage.contains("__asof_slice"), e.getMessage)
    val r2 = Seq(("a", 1L, 9L)).toDF("k", "t", "__asof_shift")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asofJoinTimeSliced(Seq(("a", 1L)).toDF("k", "t"), r2,
        keys = Seq("k" -> "k"), order = Seq("t" -> "t"),
        toleranceUs = 10L, sliceUs = 10L)
    }
    assert(e2.getMessage.contains("__asof_shift"), e2.getMessage)
  }

  test("GraftExtensions injects the strategy AND the optimizer rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.GraftPlanBridge.plannerStrategies(ext, spark)
    assert(strategies.contains(AsOfJoinStrategy))
    val rules = org.apache.spark.sql.GraftPlanBridge.optimizerRules(ext, spark)
    assert(rules.contains(graft.plans.AsOfJoinOptimizations))
  }
}
