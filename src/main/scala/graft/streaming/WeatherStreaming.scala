package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Quality
import graft.weather.{Weather, WeatherJobs}

/** Structured Streaming face of the pipeline (SURVEY.md §2.5): the same
  * explode/clean/dedup/daily-agg functions applied to `readStream`, with
  * the reference's cadence semantics mapped onto Spark's model:
  *
  *  - hourly Airflow cron (etl_openmeteo.py:14)    → Trigger.AvailableNow
  *    per run (or ProcessingTime("1 hour") resident);
  *  - `_ingest_log` idempotency (load_to_postgres.py:152-185) → the file
  *    source's checkpointed input log;
  *  - 7-day backfill lookback (backfill_openmeteo.py:38-39) → 7-day
  *    watermark bounding state;
  *  - PK upsert (create_staging.sql:10) → `dropDuplicates` within the
  *    watermark on (city, timestamp);
  *  - daily mart (fct_city_day.sql:3) → 1-day tumbling window aggregate.
  */
object WeatherStreaming {

  /** Streaming staging rows from a partitioned JSON lake directory
    * (layout `city=…/ds=…/hour=…`, written by [[Weather.writeLake]]);
    * partition discovery materializes `city`.
    */
  def readStagingStream(spark: SparkSession, lakePath: String): DataFrame = {
    val raw = spark.readStream
      .schema(Weather.RawWeatherSchema.add("_ingested_at", "timestamp"))
      .option("basePath", lakePath)
      .json(lakePath)
    Weather.clean(Weather.explodeHourly(raw))
  }

  /** Watermarked exactly-once staging: late data beyond 7 days dropped,
    * duplicate (city, timestamp) arrivals within the watermark deduped.
    */
  def dedupedStaging(staging: DataFrame): DataFrame =
    staging
      .withWatermark("timestamp", "7 days")
      .dropDuplicates("city", "timestamp")

  /** Retry-tolerant payload dedup (§2.5 exactly-once hardening): a RETRIED
    * fetch of the same (city, ds, hour) arrives with a DIFFERENT
    * `_ingested_at` — each attempt stamps its own clock — so a
    * `dropDuplicates` key set that includes the event-time column can
    * never match the duplicate. `dropDuplicatesWithinWatermark` dedups on
    * the business key alone while the watermark both bounds state (keys
    * older than `delay` are evicted — O(active keys), not O(history)) and
    * defines how late a retry can still be suppressed.
    */
  def dedupRetries(raw: DataFrame, delay: String = "1 hour"): DataFrame =
    raw.withWatermark("_ingested_at", delay)
      .dropDuplicatesWithinWatermark("city", "ds", "hour")

  /** The reference DAG end-to-end in streaming form: new lake files →
    * staging rows → per-micro-batch quality gate → idempotent upsert into
    * staging parquet. A failing batch throws inside `foreachBatch`, which
    * fails the streaming query and leaves staging untouched — the exact
    * blocking semantics of the Airflow validate→load edge
    * (etl_openmeteo.py:179-183), with the file-source checkpoint playing
    * the `_ingest_log` role.
    */
  def gatedLoadStream(
      spark: SparkSession,
      lakePath: String,
      stagingPath: String,
      checkpointPath: String): StreamingQuery =
    readStagingStream(spark, lakePath).writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist: the batch feeds three actions (emptiness check, gate
        // aggregate, upsert write) — without it each re-reads the files
        batch.persist()
        try {
          if (!batch.isEmpty) {
            val gated = Quality.gate(batch, Weather.weatherSuite)
            WeatherJobs.upsertParquet(spark, gated, stagingPath)
          }
        } finally batch.unpersist()
      }
      .start()

  /** Tumbling 1-day windowed mart in streaming mode (append with the
    * watermark; emits a window per city per day once finalized).
    */
  def dailyMartStream(staging: DataFrame): DataFrame =
    dedupedStaging(staging)
      .groupBy(window(col("timestamp"), "1 day"), col("city"))
      .agg(
        avg(col("temperature_2m")).as("temperature_avg"),
        min(col("temperature_2m")).as("temperature_min"),
        max(col("temperature_2m")).as("temperature_max"),
        sum(col("precipitation")).as("precipitation_sum"),
        max(col("wind_speed_10m")).as("wind_speed_max"),
        count(lit(1)).as("n_hours"))
      .select(col("window.start").as("day"), col("city"),
        col("temperature_avg"), col("temperature_min"), col("temperature_max"),
        col("precipitation_sum"), col("wind_speed_max"), col("n_hours"))
}
