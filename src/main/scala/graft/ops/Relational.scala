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
  /** Deterministic per-row salt in [0, buckets): a content hash of every
    * column, so a recomputed map task (executor loss, stage retry) assigns
    * the SAME salt to the same row — a row-position salt
    * (monotonically_increasing_id) would re-salt recomputed rows and could
    * duplicate or drop them across reduce partitions. Exact duplicate rows
    * share a bucket (degraded spread, never wrong results); callers with a
    * unique id column can pass it as `saltCols` for perfect spread.
    */
  private def contentSalt(df: DataFrame, buckets: Int, saltCols: Seq[String]): Column = {
    val cols = if (saltCols.nonEmpty) saltCols.map(col) else df.columns.toSeq.map(col)
    pmod(xxhash64(cols: _*), lit(buckets.toLong))
  }

  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String, buckets: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    df.withColumn("__salt", contentSalt(df, buckets, saltCols))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as("sum_value"), sum(col("__n")).cast("long").as("n"))
  }

  /** Skew mitigation for joins: salt the skewed (large) side's key with a
    * deterministic content-hash bucket and replicate each small-side row
    * once per bucket, so one hot key's probe rows spread over `buckets` tasks.
    * Semantically identical to the plain equi-join (every original pair
    * matches in exactly one bucket). AQE's skew-join split covers most
    * cases at runtime; this is the explicit form for when it can't (e.g.
    * aggregation-free pipelines below a shuffle already in flight).
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String, buckets: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    val saltedLarge = large.withColumn("__salt", contentSalt(large, buckets, saltCols))
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
    // two-level spine: exploding the whole range out of the 1-row bounds
    // aggregate would generate (and push through every downstream operator)
    // ALL spine rows in ONE task. Instead explode a coarse day spine from
    // the bounds row (tiny: one row per day), repartition it, then explode
    // each day's fine buckets in parallel — years of minute-grain spine
    // spread over the cluster instead of a single straggler task.
    val days = bounds
      .select(explode(expr(
        "sequence(date_trunc('DAY', b0), date_trunc('DAY', b1), interval 1 day)")).as("day"),
        col("b0"), col("b1"))
      .repartition(col("day"))
    val spine = days.select(explode(expr(
      s"sequence(greatest(day, b0), " +
        s"least(day + interval 1 day - interval $step, b1), interval $step)")).as("bucket"))
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

  /** Global row numbering without a single-partition sort: `row_number()
    * .over(Window.orderBy(...))` funnels EVERY row through one task, a
    * straight scale-killer on large inputs. Instead, number rows within a
    * coarse partition (e.g. a day bucket), count rows per partition, turn
    * the counts into cumulative offsets with a window over the TINY
    * per-partition count frame (one row per coarse bucket — the only
    * single-partition sort left, bounded by the number of buckets, not
    * rows), and broadcast the offsets back. Requires `coarse` to be
    * consistent with `order` (rows in a lower coarse bucket sort before
    * rows in a higher one — true for any truncation of the order key).
    * Emits a 1-based BIGINT `outCol`, identical to the naive global
    * row_number.
    */
  def twoStageRowNumber(
      df: DataFrame, coarse: Column, order: Seq[Column], outCol: String): DataFrame = {
    val t = df.withColumn("__coarse", coarse)
    val wLocal = Window.partitionBy(col("__coarse")).orderBy(order: _*)
    val counts = t.groupBy(col("__coarse")).agg(count(lit(1)).as("__cnt"))
    val wOff = Window.orderBy(col("__coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .select(col("__coarse"),
        coalesce(sum(col("__cnt")).over(wOff), lit(0L)).as("__off"))
    t.withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("__coarse"))
      .withColumn(outCol, col("__off") + col("__lrn"))
      .drop("__coarse", "__lrn", "__off")
  }

  /** Struct-of-arrays → rows pivot used by the reference for the hourly
    * payload (SURVEY.md O1/O2): zip the parallel arrays positionally and
    * explode one row per element. `arrays_zip` pads ragged arrays with null
    * (the information-preserving policy of run_once.py:45-47; see SURVEY.md
    * §1.3), and `explode_outer` extends the same pad-don't-drop policy to a
    * row whose arrays are ALL empty: it survives as one row of nulls (for
    * the downstream quality gate to judge) instead of vanishing.
    */
  def zipExplode(df: DataFrame, arrayCols: Seq[String], keep: Seq[String]): DataFrame = {
    val zipped = arrays_zip(arrayCols.map(col): _*).as("__z")
    val out = keep.map(col) ++ arrayCols.map(c => col(s"__z.$c").as(c))
    df.select(keep.map(col) :+ explode_outer(zipped).as("__z"): _*)
      .select(out: _*)
  }

  /** Deterministic train/val/test split: bucket = PolyHash(id as string)
    * mod 100, label by cumulative percentage thresholds. The same row gets
    * the same split on every engine, every run, every cluster size —
    * unlike randomSplit, which depends on partitioning. Pure projection:
    * linear, shuffle-free, reproducible from the table alone (the property
    * a 100 TB training corpus needs so a re-run never leaks val rows into
    * train).
    */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split: train=$trainPct val=$valPct")
    df.withColumn("bucket", hashBucket(df, idCol))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic percentile bucket in [0, 100) from a PolyHash of the id
    * column — the shared primitive of [[hashSplit]] and
    * [[stratifiedSampleByHash]].
    */
  private def hashBucket(df: DataFrame, idCol: String): Column = {
    graft.functions.PolyHash.register(df.sparkSession)
    pmod(
      expr(s"${graft.functions.PolyHash.FnName}(CAST($idCol AS STRING), 31, 1000000007)"),
      lit(100L)).cast("long")
  }

  /** Deterministic per-group cap — keep at most `maxRows` rows per group
    * (the per-domain document cap of web-corpus curation): rows rank by
    * PolyHash of their id (id itself as the tie-break, though ids are
    * unique), so the kept subset is a uniform-ish, partitioning- and
    * engine-independent choice, not "whatever arrived first". ONE window
    * per group key; group sizes are data-bounded (domains), and the output
    * carries `keep_rank` so downstream stages can tighten the cap without
    * re-ranking.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      maxRows: Int): DataFrame = {
    require(maxRows > 0, "cap must be positive")
    graft.functions.PolyHash.register(df.sparkSession)
    val hv = expr(
      s"${graft.functions.PolyHash.FnName}(CAST($idCol AS STRING), 31, 1000000007)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(hv.asc, col(idCol).asc)
    df.withColumn("keep_rank", row_number().over(w).cast("long"))
      .filter(col("keep_rank") <= maxRows)
  }

  /** Deterministic per-group WEIGHT budget — the token-budget domain-mixing
    * step of corpus curation (hit a target token count per source, cf.
    * DoReMi-style mixtures): each group's rows order by PolyHash(id) (a
    * reproducible pseudo-random permutation) and a row is `kept` while the
    * running weight total, including the row itself, stays within the
    * group's budget. Same kept set on every engine/run/partitioning.
    *
    * The running total is computed in TWO stages so no task ever sorts a
    * whole group (one source can be most of a 100 TB corpus): rows
    * range-bucket on the HIGH bits of their hash (hash >> 22 — a
    * truncation of the (hash, id) order, so bucket boundaries respect
    * it), per-bucket sums roll into per-group prefix offsets over the
    * tiny (groups × ≤240)-row frame — the only unpartitioned-within-group
    * window left, bounded by bucket count, not rows — the offsets
    * broadcast back, and the inclusive cumulative window runs partitioned
    * by (group, bucket). Emits `cum_weight` (BIGINT, inclusive of the
    * current row) and `kept`; `budgetFor` is evaluated per row (e.g. a
    * CASE over the group column), so budgets ride along without a join.
    */
  def budgetPerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, budgetFor: Column): DataFrame = {
    graft.functions.PolyHash.register(df.sparkSession)
    val hv = expr(
      s"${graft.functions.PolyHash.FnName}(CAST($idCol AS STRING), 31, 1000000007)")
    val t = df.withColumn("__hv", hv)
      .withColumn("__bkt", shiftright(col("__hv"), 22))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col(weightCol)).as("__bsum"))
      .select(col(groupCol), col("__bkt"),
        coalesce(sum(col("__bsum")).over(wOff), lit(0L)).as("__off"))
    val wLocal = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(col("__hv").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("__lc", sum(col(weightCol)).over(wLocal))
      .join(broadcast(offsets), Seq(groupCol, "__bkt"))
      .withColumn("cum_weight", (col("__off") + col("__lc")).cast("long"))
      .withColumn("kept", col("cum_weight") <= budgetFor)
      .drop("__hv", "__bkt", "__lc", "__off")
  }

  /** Deterministic per-stratum downsampling: keep a row iff its hash
    * bucket falls below its stratum's rate — `rates` maps stratum value to
    * keep-fraction in percent; unknown strata use `defaultPct`. The same
    * doc survives (or not) on every engine/run/partitioning, so a corpus
    * rebalance (e.g. downweight the dominant language) is reproducible —
    * the property `df.sampleBy` (seeded per-partition RNG) does not give.
    * Pure projection+filter: linear, shuffle-free.
    */
  def stratifiedSampleByHash(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "rates are percentages in [0, 100]")
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(df, idCol))
      .filter(col("bucket") < rate)
  }

  /** Deterministic global epoch shuffle — the "shuffle the corpus each
    * training epoch" step, reproducible from the table alone: every row
    * gets a pseudo-random `shuffle_key` = md5(id ++ ":e<epoch>") (a
    * different permutation per epoch, the same permutation on every
    * engine/run/cluster size, unlike `orderBy(rand(seed))`, which depends
    * on partitioning), a 1-based global `pos` in key order, and a
    * round-robin `shard` in [0, nShards) so consumers can pull disjoint
    * slices of the shuffled order. md5, not a polynomial hash: PolyHash
    * of a sequential id is near-monotone in the id (last-digit changes
    * move the key by 1), which would "shuffle" the corpus back into
    * insertion order; a cryptographic digest actually scatters.
    *
    * The global numbering is [[twoStageRowNumber]] on the key's leading
    * hex pair (a truncation of the (key, id) order — 256 coarse buckets),
    * so no task ever sorts the whole corpus — the scale property a naive
    * `row_number() OVER (ORDER BY key)` epoch shuffle lacks.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val keyed = df.withColumn("shuffle_key",
      md5(concat(col(idCol).cast("string"), lit(s":e$epoch"))))
    twoStageRowNumber(keyed, substring(col("shuffle_key"), 1, 2),
        Seq(col("shuffle_key").asc, col(idCol).asc), "pos")
      .withColumn("shard", pmod(col("pos") - 1, lit(nShards.toLong)))
  }

  /** Temperature-based (T=2, i.e. sqrt-weighted) source rebalancing — the
    * multilingual/domain upsampling step of corpus mixing (the α-sampling
    * of public LLM data recipes): target share of stratum i ∝ sqrt(n_i),
    * so heavy strata downsample and the tail keeps more of its mass.
    * `targetFrac` scales the output corpus vs the input. Keep decisions
    * are a per-stratum micro-threshold on the PolyHash id bucket —
    * partitioning- and engine-independent like [[stratifiedSampleByHash]],
    * but with rates DERIVED from the observed counts in the same job:
    * counts → one tiny per-stratum table (broadcast join back), never a
    * driver collect. Engine parity: sqrt is IEEE-correctly-rounded
    * everywhere, the share sum runs over exact DECIMAL casts, and the
    * final threshold is floored to integer micro-units.
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      targetFrac: Double = 0.5): DataFrame = {
    graft.functions.PolyHash.register(df.sparkSession)
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("w", sqrt(col("n")).cast(org.apache.spark.sql.types.DecimalType(28, 12)))
    val tot = counts.agg(sum(col("n")).cast("long").as("total_n"),
      sum(col("w")).as("tot_w"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(strataCol),
        floor(lit(1000000.0) * least(lit(1.0),
          (lit(targetFrac) * col("total_n").cast("double")) *
            (col("w").cast("double") / col("tot_w").cast("double")) /
            col("n").cast("double")))
          .cast("long").as("keep_micro"))
    // the ':mix' suffix pads short ids past 6 chars so the polynomial
    // wraps the modulus — PolyHash of a bare 3-digit id is itself < 1e5,
    // which would land EVERY row under any realistic micro-threshold
    val bucket = pmod(
      expr(s"${graft.functions.PolyHash.FnName}(" +
        s"CONCAT(CAST($idCol AS STRING), ':mix'), 31, 1000000007)"),
      lit(1000000L))
    df.join(broadcast(rates), strataCol)
      .filter(bucket < col("keep_micro"))
      .select(col(idCol), col(strataCol), col("keep_micro"))
  }

  /** Weighted SYSTEMATIC sampling (the SMC-resampling scheme): per
    * stratum, lay the rows' weights end-to-end on a number line in id
    * order and pick the row containing each of `k` evenly-spaced midpoint
    * ticks t_j = (2j+1)·total/(2k) — every row's selection probability is
    * ∝ its weight, heavy rows (weight > total/k) can win multiple ticks,
    * and, unlike exponential/Gumbel-key weighted sampling, the whole
    * procedure is EXACT integer arithmetic (containment compares
    * cross-multiplied BIGINTs, never a log or a pow), so the selected set
    * is bit-identical on any engine. The token-budget mixing use: sample
    * k docs per source ∝ token count for a fixed-size eval slice whose
    * composition mirrors the mixture.
    *
    * Scale shape: one partitioned prefix-sum window (id-ordered within
    * stratum), per-stratum totals as a broadcast, ticks as a constant
    * k-row broadcast — linear in the corpus with one shuffle on the
    * stratum key. Output: (stratum, tick_idx, id, weight); rows with
    * non-positive weight can never contain a tick and are dropped.
    */
  def systematicSample(df: DataFrame, strataCol: String, weightCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one tick")
    // ROWS frame, not the default RANGE: RANGE gives orderBy-peer rows
    // (duplicate ids within a stratum) identical cumulative sums — i.e.
    // overlapping containment intervals, so one tick could select several
    // rows. ROWS assigns each row its own half-open interval regardless of
    // duplicates; the weight tie-break makes the walk order (and thus
    // which duplicate wins a tick) deterministic across engines.
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(idCol), col("__w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.filter(col(weightCol) > 0)
      .select(col(strataCol), col(idCol), col(weightCol).cast("long").as("__w"))
      .withColumn("__cum", sum(col("__w")).over(w))
    val totals = cum.groupBy(col(strataCol))
      .agg(max(col("__cum")).as("__total"))
    val ticks = df.sparkSession.range(k).select(col("id").as("tick_idx"))
    cum.join(broadcast(totals), strataCol)
      .crossJoin(broadcast(ticks))
      .filter(
        (col("__cum") - col("__w")) * (2 * k) <=
          (col("tick_idx") * 2 + 1) * col("__total") &&
        (col("tick_idx") * 2 + 1) * col("__total") <
          col("__cum") * (2 * k))
      .select(col(strataCol), col("tick_idx"), col(idCol),
        col("__w").as("weight"))
  }
}
