package graft

import org.apache.spark.sql.functions._
import graft.plans.{AsOfBroadcast, AsOfDirection, AsOfJoinPlan}

/** The SQL surface of the native as-of join (plans.AsOfSql): DuckDB's
  * `ASOF [LEFT] JOIN` syntax parsed through the injected parser, converted
  * by the analyzer rule, planned to the same physical operators as the
  * DataFrame API — plus the injected `epoch_us` oracle-dialect scalar.
  */
class AsOfSqlSpec extends SparkSpec {

  private def views(): Unit = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L),
      ("B", 15L, 4L), ("C", 5L, 5L)
    ).toDF("sym", "t", "trade_id").createOrReplaceTempView("sql_trades")
    Seq(
      ("A", 5L, 100L), ("A", 10L, 101L), ("A", 25L, 102L),
      ("B", 99L, 103L), ("D", 1L, 104L)
    ).toDF("sym", "t", "px").createOrReplaceTempView("sql_quotes")
  }

  private def rows(sql: String): Set[(String, Long, Long)] =
    spark.sql(sql).collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

  test("ASOF LEFT JOIN parses, converts, and matches the DataFrame API") {
    views()
    val got = rows("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t""")
    // DataFrame twin: backward non-strict on t
    val s = spark
    val expected = AsOfJoinPlan.asofJoin(
        s.table("sql_trades"), s.table("sql_quotes"),
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"), strict = false)
      .select(col("sym"), col("t"), col("px_r"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == expected)
    assert(got(("C", 5L, -1L)), "LEFT form must keep unmatched lefts")
    // and the plan really is the native operator, not some composed form
    val plan = spark.sql("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t""")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }

  test("plain ASOF JOIN is inner: unmatched lefts drop (DuckDB semantics)") {
    views()
    val got = rows("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t""")
    assert(!got.exists(_._1 == "C"), s"inner ASOF must drop C, got $got")
    assert(!got.exists(_._1 == "B"), s"B's only quote is in the future: $got")
    assert(got(("A", 20L, 101L)))
  }

  test("the four inequality forms map to direction and strictness like DuckDB") {
    views()
    // l > r: backward strict — the t=10 trade takes the t=5 quote
    assert(rows("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t > q.t""")(
      ("A", 10L, 100L)))
    // l <= r: forward non-strict — t=10 keeps its equal-time quote
    val fwd = rows("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t <= q.t""")
    assert(fwd(("A", 10L, 101L)) && fwd(("A", 20L, 102L)) &&
      fwd(("B", 15L, 103L)) && fwd(("A", 30L, -1L)), fwd.toString)
    // l < r: forward strict — t=10 skips the equal-time quote
    assert(rows("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t < q.t""")(
      ("A", 10L, 102L)))
    // flipped operands normalize: q.t <= t.t IS t.t >= q.t (backward)
    val flipped = rows("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND q.t <= t.t""")
    val straight = rows("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t""")
    assert(flipped == straight)
  }

  test("ASOF JOIN composes under aggregation and WHERE like any join") {
    views()
    val df = spark.sql("""SELECT sym, CAST(COUNT(px) AS BIGINT) AS n
      FROM (SELECT t.sym, q.px FROM sql_trades t
            ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t
            WHERE t.t > 6) sub
      GROUP BY sym""")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> 3L, "B" -> 0L))
  }

  test("epoch_us is registered and equals unix_micros") {
    val s = spark
    import s.implicits._
    Seq("2024-03-01 12:00:00.123456")
      .toDF("raw").select(col("raw").cast("timestamp").as("ts"))
      .createOrReplaceTempView("sql_ts")
    val r = spark.sql(
      "SELECT epoch_us(ts) AS a, unix_micros(ts) AS b FROM sql_ts").head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("unsupported shapes fail loudly, not silently as a plain join") {
    views()
    // no inequality in the ON clause: not an as-of shape
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("""SELECT * FROM sql_trades t
        ASOF JOIN sql_quotes q ON t.sym = q.sym""").collect()
    }
    assert(e2.getMessage.contains("as-of ON shape"))
  }

  test("two ASOF joins in one statement resolve independently by anchor") {
    views()
    val s = spark
    import s.implicits._
    Seq(("A", 8L, 7L), ("A", 28L, 8L), ("B", 1L, 9L))
      .toDF("sym", "t", "ref_id").createOrReplaceTempView("sql_refs")
    val got = spark.sql("""SELECT t.sym, t.t, q.px, r.ref_id
      FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t
      ASOF LEFT JOIN sql_refs r ON t.sym = r.sym AND t.t >= r.t""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // DataFrame twin: two chained backward non-strict as-ofs
    val first = AsOfJoinPlan.asofJoin(
      s.table("sql_trades"), s.table("sql_quotes"),
      keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"), strict = false)
    val expected = AsOfJoinPlan.asofJoin(
        first.select(col("sym"), col("t"), col("px_r")),
        s.table("sql_refs"),
        keys = Seq("sym" -> "sym"), order = Seq("t" -> "t"),
        strict = false, rightSuffix = "_r2")
      .select(col("sym"), col("t"), col("px_r"), col("ref_id_r2"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == expected)
    assert(got(("A", 10L, 101L, 7L)) && got(("C", 5L, -1L, -1L)), got.toString)
    // both joins planned to the native operator
    val plan = spark.sql("""SELECT t.sym, t.t, q.px, r.ref_id
      FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t
      ASOF LEFT JOIN sql_refs r ON t.sym = r.sym AND t.t >= r.t""")
      .queryExecution.optimizedPlan
    val nAsOf = plan.collect { case a: graft.plans.AsOfJoin => a }.size
    assert(nAsOf == 2, s"expected 2 native as-of nodes, got $nAsOf:\n$plan")
  }

  test("two ASOF joins over the SAME relation resolve by their distinct " +
      "user aliases (outermost alias binds, relation name is fallback)") {
    views()
    val got = spark.sql("""SELECT t.sym, t.t, q.px, q2.px AS px2
      FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t
      ASOF LEFT JOIN sql_quotes q2 ON t.sym = q2.sym AND t.t > q2.t""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // q: backward non-strict; q2: backward STRICT — at t=10 they differ
    assert(got(("A", 10L, 101L, 100L)), got.toString)
    assert(got(("C", 5L, -1L, -1L)))
    val n = spark.sql("""SELECT t.sym FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t
      ASOF LEFT JOIN sql_quotes q2 ON t.sym = q2.sym AND t.t > q2.t""")
      .queryExecution.optimizedPlan
      .collect { case a: graft.plans.AsOfJoin => a }.size
    assert(n == 2, s"both same-relation ASOFs must convert, got $n")
  }

  test("two anchor-less ASOF joins are genuinely ambiguous and refuse") {
    views()
    // both right sides are subqueries: no alias anchor — with two shaped
    // inner joins of the same type the rule must refuse, never guess
    val e = intercept[IllegalArgumentException] {
      spark.sql("""SELECT * FROM sql_trades t
        ASOF JOIN (SELECT sym AS qs, t AS qt FROM sql_quotes)
          ON t.sym = qs AND t.t >= qt
        ASOF JOIN (SELECT sym AS q2s, t AS q2t FROM sql_quotes)
          ON t.sym = q2s AND t.t >= q2t""")
        .collect()
    }
    assert(e.getMessage.contains("ASOF JOIN"), e.getMessage)
  }

  test("string literals and comments containing 'ASOF JOIN' are never " +
      "rewritten, counted, or corrupted") {
    views()
    // literal-only occurrence: the statement has NO real as-of join and a
    // range-shaped join — nothing may be converted, the literal's value
    // must survive byte-identical
    val r1 = spark.sql("""SELECT t.sym, 'use ASOF JOIN here' AS hint, q.px
      FROM sql_trades t JOIN sql_quotes q
        ON t.sym = q.sym AND t.t >= q.t""")
    assert(r1.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AsOfJoin => a }.isEmpty,
      "a literal mention must not convert the coincidental range join")
    assert(r1.select("hint").head().getString(0) == "use ASOF JOIN here")
    // literal + real ASOF in one statement: the real one converts, the
    // literal survives
    val r2 = spark.sql("""SELECT t.sym, t.t, 'ASOF JOIN docs' AS note, q.px
      FROM sql_trades t
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t""")
    assert(r2.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AsOfJoin => a }.size == 1)
    assert(r2.select("note").head().getString(0) == "ASOF JOIN docs")
    // comment occurrences (line + bracketed) are invisible to the rewrite
    val r3 = spark.sql("""SELECT t.sym, t.t, q.px -- ASOF JOIN in a comment
      FROM sql_trades t /* and ASOF JOIN in a block comment */
      ASOF LEFT JOIN sql_quotes q ON t.sym = q.sym AND t.t >= q.t""")
    assert(r3.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AsOfJoin => a }.size == 1)
    assert(r3.count() == 5)
  }

  test("the rhs anchor stops conversion of a DIFFERENT as-of-shaped join " +
      "when the real ASOF ON fails shape detection") {
    views()
    val s = spark
    import s.implicits._
    Seq(("A", 1L), ("B", 2L)).toDF("sym", "v")
      .createOrReplaceTempView("sql_dims")
    // the ASOF join's ON has TWO inequalities (a window, not an as-of
    // shape) while the plain dims join coincidentally HAS the as-of shape
    // (equality + one inequality). Without the positional anchor the rule
    // would silently convert the dims join; with it, the statement fails
    // loudly naming the right side it could not anchor.
    val e = intercept[IllegalArgumentException] {
      spark.sql("""SELECT t.sym, t.t, q.px, d.v FROM sql_trades t
        ASOF JOIN sql_quotes q
          ON t.sym = q.sym AND t.t >= q.t AND t.t <= q.t + 100
        JOIN sql_dims d ON t.sym = d.sym AND t.trade_id > d.v""").collect()
    }
    assert(e.getMessage.contains("as-of ON shape") &&
      e.getMessage.contains("q"), e.getMessage)
  }

  test("inner ASOF drops unmatched lefts even when the right ordering " +
      "expression is non-null-propagating") {
    views()
    // coalesce(q.t, 0) evaluates NON-null over the all-null right row an
    // unmatched left carries — a filter on IsNotNull(ordering expression)
    // would keep C; the matched-marker filter must drop it
    val got = rows("""SELECT t.sym, t.t, q.px FROM sql_trades t
      ASOF JOIN sql_quotes q
        ON t.sym = q.sym AND t.t >= coalesce(q.t, 0)""")
    assert(!got.exists(_._1 == "C"),
      s"inner ASOF must drop the unmatched left under coalesce ordering: $got")
    assert(got(("A", 20L, 101L)), s"matched rows must survive: $got")
  }

  test("q83's exact query text runs on Spark and matches the native q76 shape") {
    // the SAME text the DuckDB oracle executes (single ordering column, so
    // restricted to ts-only ordering vs q76's (ts, event_id) tie-break —
    // identical output because ties only affect which equal-ts row wins)
    Tables.events(spark, sf0001).createOrReplaceTempView("events")
    val sqlGot = spark.sql(
      """SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
        |  epoch_us(c.ts) AS click_us
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events
        |                WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts > c.ts""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val ev = Tables.events(spark, sf0001)
    val native = AsOfJoinPlan.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts")),
        keys = Seq("user_id" -> "user_id"), order = Seq("ts" -> "ts"),
        strict = true)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts_r")).as("click_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(sqlGot.nonEmpty && sqlGot == native)
  }
}
