package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def day(s: String) = Date.valueOf(s)

  test("gapFillLinear fills interior gaps by linear interpolation") {
    // key A: days 1,2,4 observed; day 3 missing -> 2 + (8-2)*(1/2) = 5.0
    // key B: days 10..14 with 12,13 missing -> thirds between 3.0 and 9.0
    val obs = Seq(
      ("a", day("2024-01-01"), 1.0),
      ("a", day("2024-01-02"), 2.0),
      ("a", day("2024-01-04"), 8.0),
      ("b", day("2024-01-10"), 3.0),
      ("b", day("2024-01-11"), 3.0),
      ("b", day("2024-01-14"), 9.0)
    ).toDF("k", "day", "v")

    val out = TimeSeries.gapFillLinear(obs, "k", "day", "v")
      .orderBy("k", "day")
      .select("k", "day", "v_filled", "interpolated")
      .collect()

    val byKey = out.map(r => (r.getString(0), r.getDate(1).toString) ->
      (r.getDouble(2), r.getInt(3))).toMap

    assert(out.length === 9) // 4 days for a, 5 for b — span bounded by observations
    assert(byKey(("a", "2024-01-03")) === ((5.0, 1)))
    assert(byKey(("a", "2024-01-02")) === ((2.0, 0)))
    assert(byKey(("b", "2024-01-12")) === ((3.0 + ((9.0 - 3.0) * (1.0 / 3.0)), 1)))
    assert(byKey(("b", "2024-01-13")) === ((3.0 + ((9.0 - 3.0) * (2.0 / 3.0)), 1)))
  }

  test("gapFillLinear never extrapolates beyond a key's observed span") {
    val obs = Seq(("a", day("2024-03-05"), 7.0)).toDF("k", "day", "v")
    val out = TimeSeries.gapFillLinear(obs, "k", "day", "v").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("v_filled") === 7.0)
    assert(out.head.getAs[Int]("interpolated") === 0)
  }

  test("overlapSelfJoinGrid finds each overlapping pair exactly once") {
    // cell width 10 so every interval spans many cells — the
    // first-common-cell rule must still emit one row per pair
    val spans = Seq(
      (1L, 0L, 100L), (2L, 50L, 150L), (3L, 100L, 200L),
      (4L, 300L, 400L), (5L, 0L, 1000L)
    ).toDF("id", "s", "e")
    val out = TimeSeries.overlapSelfJoinGrid(spans, "s", "e", 10L,
        col("a.id") < col("b.id"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val rows = Seq((1L, 0L, 100L), (2L, 50L, 150L), (3L, 100L, 200L),
      (4L, 300L, 400L), (5L, 0L, 1000L))
    val brute = for {
      (ia, sa, ea) <- rows; (ib, sb, eb) <- rows
      if ia < ib && sa < eb && sb < ea
    } yield (ia, ib)
    assert(out === brute.sorted) // incl: (1,3) touch at 100 — NOT a pair
  }

  test("overlapSelfJoinGrid is an equi-join on the grid cell, never a product") {
    val spans = Seq((1L, 0L, 25L), (2L, 20L, 40L)).toDF("id", "s", "e")
    val plan = TimeSeries.overlapSelfJoinGrid(spans, "s", "e", 10L,
      col("a.id") < col("b.id")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("gapFillLinear windows are partitioned by the series key (no global sort)") {
    val obs = Seq(
      ("a", day("2024-01-01"), 1.0), ("a", day("2024-01-03"), 3.0),
      ("b", day("2024-01-01"), 5.0), ("b", day("2024-01-04"), 8.0)
    ).toDF("k", "day", "v")
    val plan = TimeSeries.gapFillLinear(obs, "k", "day", "v")
      .queryExecution.executedPlan.toString
    // every window frame must carry the series key as its partition spec —
    // an empty partitionBy would funnel the whole series through one task
    val specs = "windowspecdefinition\\(([^,)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"no window in plan:\n$plan")
    assert(specs.forall(_.startsWith("k#")),
      s"window not keyed by series key: $specs")
  }
}
