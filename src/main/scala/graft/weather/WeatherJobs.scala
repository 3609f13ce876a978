package graft.weather

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Quality

/** The reference's entry points as composed jobs (SURVEY.md §3):
  * EP2's bulk incremental load (run_load_once.py) and the stateful upsert
  * sink that stands in for Postgres staging.
  */
object WeatherJobs {

  /** Functional upsert sink (SURVEY.md S6/S7/O12): read current staging
    * parquet (if any), union the new batch, keep the newest row per
    * (city, timestamp) by `_ingested_at`, overwrite. Last-write-wins and
    * idempotent — re-loading the same batch is a no-op — which is exactly
    * the contract of the reference's `ON CONFLICT DO UPDATE`
    * (load_to_postgres.py:90-102). At scale the overwrite would be
    * partition-scoped (`partitionBy(ds)` + dynamic overwrite) so only
    * touched days rewrite.
    */
  def upsertParquet(spark: SparkSession, batch: DataFrame, stagingPath: String): Unit = {
    val merged =
      if (Files.exists(Paths.get(stagingPath))) {
        val current = spark.read.parquet(stagingPath)
        Weather.dedupUpsert(current.unionByName(batch))
      } else Weather.dedupUpsert(batch)
    // two-phase write: the source of the union cannot be overwritten in
    // place while it is being read. Finish with a directory rename (not a
    // second full write), which shrinks the non-atomic window to
    // delete+rename; a table format with atomic commits (Delta/Iceberg)
    // would close it entirely but isn't available in this environment.
    val hconf = spark.sparkContext.hadoopConfiguration
    val tmp = new org.apache.hadoop.fs.Path(stagingPath + ".tmp")
    val dst = new org.apache.hadoop.fs.Path(stagingPath)
    val fs = dst.getFileSystem(hconf)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  /** Partition-scoped MERGE upsert — the 100 TB form of [[upsertParquet]]:
    * the staging table is Hive-partitioned by `ds` (derived from
    * `timestamp`), and a batch rewrites ONLY the `ds` partitions it
    * touches, via dynamic partition overwrite. Untouched partitions' files
    * are left physically in place — an hourly batch against years of
    * staging rewrites one or two days, not the table. Same last-write-wins
    * contract as the reference's `ON CONFLICT DO UPDATE`
    * (load_to_postgres.py:96-99): newest `_ingested_at` per
    * (city, timestamp) survives, and re-applying a batch is a no-op.
    *
    * The touched-partition read is pruned with literal `ds` values (the
    * driver-side collect is bounded by the number of DAYS in the batch —
    * a handful for any incremental load, never data-scaled), so the merge
    * input is O(touched partitions + batch), not O(table).
    */
  def mergeUpsertParquet(spark: SparkSession, batch: DataFrame, stagingPath: String): Unit = {
    val withDs = batch.withColumn("ds", date_format(col("timestamp"), "yyyy-MM-dd"))
    val merged =
      if (Files.exists(Paths.get(stagingPath))) {
        val touched = withDs.select(col("ds")).distinct()
          .collect().map(_.getString(0)).toSeq
        val current = spark.read.option("basePath", stagingPath).parquet(stagingPath)
          .filter(col("ds").isin(touched: _*)) // partition-pruned scan
        Weather.dedupUpsert(current.unionByName(withDs))
      } else Weather.dedupUpsert(withDs)
    // materialize before overwriting: the merged frame reads the same
    // partitions the write replaces; checkpointing severs the file
    // dependency. The pinned data is only the touched slice, so this stays
    // small regardless of table size.
    val pinned = merged.localCheckpoint(true)
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try pinned.write.mode("overwrite").partitionBy("ds").parquet(stagingPath)
    finally prevMode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Keys already loaded, persisted like `staging._ingest_log`
    * (load_to_postgres.py:152-162).
    */
  def readIngestLog(spark: SparkSession, logPath: String): DataFrame =
    if (Files.exists(Paths.get(logPath))) spark.read.parquet(logPath)
    else spark.emptyDataFrame.withColumn("key", lit(""))
      .filter(lit(false)).select(col("key"))

  /** EP2 — bulk incremental load (run_load_once.py:57-103 restated):
    * enumerate lake files, anti-join the ingest log (O17), read only new
    * files, explode/clean/gate, upsert into staging, append the log.
    * The per-file driver loop of the reference collapses into one
    * distributed job per stage; `limitFiles` ≡ its `limit_files` knob.
    *
    * Returns the number of new files processed.
    */
  def loadIncremental(
      spark: SparkSession,
      lakePath: String,
      stagingPath: String,
      logPath: String,
      limitFiles: Option[Int] = None): Long = {
    val lake = Weather.readLake(spark, lakePath)
      .withColumn("s3_uri", input_file_name()) // O11 provenance
    val listing = lake.select(col("s3_uri").as("key")).distinct()
    val newKeysDf = Weather.newFiles(listing, readIngestLog(spark, logPath))
    val limited = limitFiles.map(newKeysDf.limit).getOrElse(newKeysDf)
    // MATERIALIZE the chosen key set once: an unordered limit() is not
    // stable across actions, and this frame feeds three of them (count,
    // the staging load's semi-join, the log append) — without pinning,
    // the log could record a file the load never read, and the anti-join
    // would then skip that file's data forever.
    val newKeys = limited.localCheckpoint(true)
    val nNew = newKeys.count()
    if (nNew > 0) {
      val batch = lake.join(newKeys, col("s3_uri") === col("key"), "left_semi")
      val staged = Weather.clean(Weather.explodeHourly(batch))
      val gated = Quality.gate(staged, Weather.weatherSuite)
      upsertParquet(spark, gated, stagingPath)
      newKeys.select(col("key"))
        .withColumn("ingested_at", current_timestamp())
        .write.mode("append").parquet(logPath)
    }
    nNew
  }
}
