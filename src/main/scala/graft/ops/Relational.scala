package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators the reference pipeline performs, re-expressed
  * as reusable DataFrame combinators (SURVEY.md §2.3).
  *
  * Every operator stays fully distributed — no driver-side collects — so each
  * survives a 100 TB / 1000-executor scale-up: dedup and sessionization are
  * single-shuffle window operators keyed by their partition keys; gap
  * detection joins a generated spine against a pre-aggregated distinct set.
  */
object Relational {

  /** Skew mitigation by salting: aggregate a skewed key in two stages —
    * first by (key, salt) so one hot key spreads over `buckets` reducers,
    * then merge the partials by key. Correct for any algebraic aggregate
    * expressed as (partial, merge) column pairs; here specialized to
    * sum/count which cover the reference's aggregates. AQE's skew-join
    * handling covers joins; this covers aggregation skew.
    */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame = {
    // the salt must be independent of the DATA (identical values would all
    // land in one bucket); a row-position-derived salt spreads any hot key
    // uniformly, and the assignment is irrelevant to the merged result
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as("sum_value"), sum(col("__n")).cast("long").as("n"))
  }

  /** Skew mitigation for joins: salt the skewed (large) side's key with a
    * row-position bucket and replicate each small-side row once per
    * bucket, so one hot key's probe rows spread over `buckets` tasks.
    * Semantically identical to the plain equi-join (every original pair
    * matches in exactly one bucket). AQE's skew-join split covers most
    * cases at runtime; this is the explicit form for when it can't (e.g.
    * aggregation-free pipelines below a shuffle already in flight).
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Last-write-wins keyed dedup — the batch-functional equivalent of the
    * reference's Postgres `ON CONFLICT (city,timestamp) DO UPDATE` upsert
    * (load_to_postgres.py:90-102; SURVEY.md O12). Exactly one row per key
    * survives: the first under `order` (pass e.g. `_ingested_at desc` +
    * tie-breaks). One hash shuffle on `keys`; no driver involvement.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Calendar-spine gap detection (backfill_openmeteo.py:44-75; SURVEY.md
    * O18): generate every expected bucket of `grain` between the min and max
    * of `tsCol`, anti-join the buckets actually present. The spine is built
    * with `sequence`+`explode` from a 1-row bounds aggregate — no
    * driver-side loop — and the present-set is pre-aggregated to distinct
    * buckets before the join, so the anti-join is tiny at any scale.
    */
  def calendarGaps(df: DataFrame, tsCol: String, grain: String, step: String): DataFrame = {
    val present = df.select(date_trunc(grain, col(tsCol)).as("bucket")).distinct()
    val bounds = df.agg(
      date_trunc(grain, min(col(tsCol))).as("b0"),
      date_trunc(grain, max(col(tsCol))).as("b1"))
    val spine = bounds.select(
      explode(expr(s"sequence(b0, b1, interval $step)")).as("bucket"))
    spine.join(present, Seq("bucket"), "left_anti")
  }

  /** Sessionize a keyed event stream: a new session starts when the gap to
    * the previous event for the same key exceeds `gapSeconds`. Two window
    * passes over one shuffle on the key.
    */
  def sessionize(df: DataFrame, key: String, tsCol: String, gapSeconds: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val byKey = Window.partitionBy(col(key))
      .orderBy(col(tsCol) +: tieBreak.map(col): _*)
    val prev = lag(col(tsCol), 1).over(byKey)
    val isNew = when(
      prev.isNull || unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Range (interval) self-join: ordered pairs (a earlier, b later) of
    * rows sharing `key` with `b.ts − a.ts ≤ windowSeconds`, banded by
    * window-width time bucket so the join is an equi-join on
    * (key, bucket) with the later side probing only its own and the
    * previous bucket — never a full per-key cross product with a non-equi
    * filter. This is the standard banding rewrite that keeps range joins
    * shuffle-bounded at 100 TB. Each qualifying pair matches exactly one
    * of the two probes, so no dedup is needed.
    */
  def rangeSelfJoin(
      df: DataFrame, key: String, tsCol: String, idCol: String,
      windowSeconds: Long): DataFrame = {
    val w = windowSeconds * 1000000L
    val bucket = (unix_micros(col(tsCol)) / lit(w)).cast("long")
    val t = df.select(col(key).as("k"), col(idCol).as("id"),
      col(tsCol).as("ts"), bucket.as("b"))
    val earlier = t.as("l")
    val later = t.select(col("k"), col("id"), col("ts"),
      explode(array(col("b"), col("b") - 1)).as("b")).as("r")
    earlier.join(later,
        col("l.k") === col("r.k") && col("l.b") === col("r.b") &&
          (col("l.ts") < col("r.ts") ||
            (col("l.ts") === col("r.ts") && col("l.id") < col("r.id"))) &&
          unix_micros(col("r.ts")) - unix_micros(col("l.ts")) <= w)
      .select(col("l.k").as(key), col("l.id").as("id_a"), col("r.id").as("id_b"),
        unix_micros(col("l.ts")).as("ts_a_us"), unix_micros(col("r.ts")).as("ts_b_us"))
  }

  /** Struct-of-arrays → rows pivot used by the reference for the hourly
    * payload (SURVEY.md O1/O2): zip the parallel arrays positionally and
    * explode one row per element. `arrays_zip` pads ragged arrays with null
    * (the information-preserving policy of run_once.py:45-47; see SURVEY.md
    * §1.3).
    */
  def zipExplode(df: DataFrame, arrayCols: Seq[String], keep: Seq[String]): DataFrame = {
    val zipped = arrays_zip(arrayCols.map(col): _*).as("__z")
    val out = keep.map(col) ++ arrayCols.map(c => col(s"__z.$c").as(c))
    df.select(keep.map(col) :+ explode(zipped).as("__z"): _*)
      .select(out: _*)
  }
}
