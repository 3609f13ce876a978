package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair and alignment operators over keyed daily series — the
  * post-ingest step the reference's weather pipeline leaves to its BI layer
  * (fct_city_day.sql produces the daily mart; gap repair before charting is
  * manual there). Re-expressed as distributed DataFrame combinators.
  *
  * Scale notes: every operator shuffles once on the series key; per-key state
  * is a window over that key's rows only (bounded by the series span), so a
  * 1000-executor scale-up spreads keys, not timestamps. Spines are generated
  * by `sequence`+`explode` from per-key bounds rows — never a driver loop.
  */
object TimeSeries {

  /** Fill missing days of a keyed daily series by linear interpolation
    * between the nearest observed days (the standard sensor-series repair:
    * pandas' `interpolate(method="time")`, re-expressed distributed).
    *
    * Input: one row per OBSERVED (key, day) with a numeric `valCol`.
    * Output: one row per (key, day) for EVERY day in the key's observed
    * [min, max] span — observed rows keep their value, gap rows get
    * `prev + (next - prev) * elapsed/gap` — plus an `interpolated` 0/1 flag.
    * The spine never extends beyond observed bounds, so every gap has both
    * brackets and no extrapolation policy is needed.
    *
    * Plan shape: one hash aggregate for per-key bounds, spine exploded from
    * the bounds rows (one task per key-batch, days fan out in parallel), one
    * shuffle-left-join back to the observations (co-partitioned on key after
    * the aggregate), then two window frames over a single sort on
    * (key, day): a forward pass carrying the last non-null (value, day) and
    * a backward pass carrying the next. No global sort, no driver state.
    */
  /** Grid-bucketed interval-overlap self-join (the partition-based
    * spatial/temporal join of DeWitt's PBSM, re-expressed over time): each
    * interval `[startCol, endCol)` (µs epoch longs, start < end) is exploded
    * into the fixed-width grid cells it covers, candidates meet by cell
    * EQUI-join — never an all-pairs/theta join — and each qualifying pair is
    * kept exactly once via the first-common-cell rule
    * (`cell == max(cellOf(a.start), cellOf(b.start))`), so no DISTINCT pass
    * is needed. `pairPred` (over aliases `a`/`b`, e.g.
    * `col("a.user_id") < col("b.user_id")`) prunes inside the join.
    *
    * Output: every column of `spans` twice, prefixed `a_` / `b_`, one row
    * per overlapping pair (strict overlap: touching endpoints don't match).
    *
    * Scale: the shuffle key is the grid cell, so co-occurring intervals
    * meet on one partition while disjoint time ranges never pair; cell
    * width trades fan-out (long intervals hit e/W cells) against per-cell
    * candidate quadratics — size it near the median interval length.
    */
  def overlapSelfJoinGrid(
      spans: DataFrame,
      startCol: String,
      endCol: String,
      cellUs: Long,
      pairPred: Column): DataFrame = {
    require(cellUs > 0, "cell width must be positive")
    // integer `div`, not `/`: Column./ is double division, and a 2^50-µs
    // epoch divided as double can land on the wrong cell at a boundary.
    val withCells = spans
      .withColumn("__c0", expr(s"$startCol div ${cellUs}L"))
      .withColumn("__cell",
        explode(sequence(col("__c0"), expr(s"($endCol - 1L) div ${cellUs}L"))))
    val joined = withCells.as("a").join(withCells.as("b"),
      col("a.__cell") === col("b.__cell") &&
        pairPred &&
        col(s"a.$startCol") < col(s"b.$endCol") &&
        col(s"b.$startCol") < col(s"a.$endCol") &&
        col("a.__cell") === greatest(col("a.__c0"), col("b.__c0")))
    joined.select(
      (spans.columns.map(c => col(s"a.$c").as(s"a_$c")) ++
        spans.columns.map(c => col(s"b.$c").as(s"b_$c"))).toIndexedSeq: _*)
  }

  def gapFillLinear(obs: DataFrame, key: String, dayCol: String, valCol: String): DataFrame = {
    val bounds = obs.groupBy(col(key))
      .agg(min(col(dayCol)).as("__d0"), max(col(dayCol)).as("__d1"))
    val spine = bounds.select(col(key),
      explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day"))).as(dayCol))

    val wPrev = Window.partitionBy(col(key)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(key)).orderBy(col(dayCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valCol)

    spine.join(obs, Seq(key, dayCol), "left")
      .withColumn("__pv", last(v, ignoreNulls = true).over(wPrev))
      .withColumn("__pd", last(when(v.isNotNull, col(dayCol)), ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wNext))
      .withColumn("__nd", first(when(v.isNotNull, col(dayCol)), ignoreNulls = true).over(wNext))
      // IEEE evaluation order mirrors the oracle SQL exactly:
      // pv + ((nv - pv) * (elapsed / gap)) — keep the parenthesization.
      .withColumn(s"${valCol}_filled",
        when(v.isNotNull, v).otherwise(
          col("__pv") + ((col("__nv") - col("__pv")) *
            (datediff(col(dayCol), col("__pd")).cast("double") /
              datediff(col("__nd"), col("__pd")).cast("double")))))
      .withColumn("interpolated", when(v.isNull, 1).otherwise(0).cast("int"))
      .drop("__pv", "__pd", "__nv", "__nd")
  }
}
