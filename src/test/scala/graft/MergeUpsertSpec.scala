package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.weather.{Weather, WeatherJobs}

/** Partition-scoped MERGE upsert (dynamic partition overwrite): same
  * last-write-wins results as the whole-table rewrite, but only the `ds`
  * partitions a batch touches are rewritten — asserted on the actual files.
  */
class MergeUpsertSpec extends SparkSpec {

  private def batch(rows: Seq[(String, String, Double, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("city", "ts_s", "temperature_2m", "ing_s")
      .select(col("city"),
        col("ts_s").cast("timestamp").as("timestamp"),
        col("temperature_2m"),
        col("ing_s").cast("timestamp").as("_ingested_at"))
  }

  private val day1 = Seq(
    ("Warsaw", "2025-10-01 10:00:00", 10.0, "2025-10-01 11:00:00"),
    ("Warsaw", "2025-10-01 11:00:00", 11.0, "2025-10-01 12:00:00"),
    ("Berlin", "2025-10-01 10:00:00", 12.0, "2025-10-01 11:00:00"))
  private val day2 = Seq(
    ("Warsaw", "2025-10-02 10:00:00", 20.0, "2025-10-02 11:00:00"),
    ("Berlin", "2025-10-02 10:00:00", 21.0, "2025-10-02 11:00:00"))
  // correction for one day-2 hour, newer _ingested_at — must win the merge
  private val day2Fix = Seq(
    ("Warsaw", "2025-10-02 10:00:00", 20.5, "2025-10-02 13:00:00"))

  private def parquetFiles(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new File(dir)
    if (!root.exists()) Map.empty
    else walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  private def snapshot(path: String): Set[(String, Long, Double, Long)] =
    spark.read.parquet(path)
      .select(col("city"), unix_micros(col("timestamp")),
        col("temperature_2m"), unix_micros(col("_ingested_at")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

  test("merge matches the whole-table upsert path and is idempotent") {
    val base = Files.createTempDirectory("merge").toString
    val mergePath = s"$base/merge"; val fullPath = s"$base/full"
    for (b <- Seq(day1, day2, day2Fix)) {
      WeatherJobs.mergeUpsertParquet(spark, batch(b), mergePath)
      WeatherJobs.upsertParquet(spark, batch(b), fullPath)
    }
    val m = snapshot(mergePath)
    assert(m == snapshot(fullPath))
    assert(m.size == 5)
    // the correction won
    assert(m.exists { case (c, _, t, _) => c == "Warsaw" && t == 20.5 })
    assert(!m.exists { case (c, _, t, _) => c == "Warsaw" && t == 20.0 })
    // idempotency: re-applying the last batch changes nothing
    WeatherJobs.mergeUpsertParquet(spark, batch(day2Fix), mergePath)
    assert(snapshot(mergePath) == m)
  }

  test("untouched ds partitions' files are not rewritten") {
    val base = Files.createTempDirectory("mergepart").toString
    val path = s"$base/staging"
    WeatherJobs.mergeUpsertParquet(spark, batch(day1 ++ day2), path)
    val before = parquetFiles(path)
    assert(before.keys.exists(_.contains("ds=2025-10-01")))
    assert(before.keys.exists(_.contains("ds=2025-10-02")))
    // merge a batch touching ONLY ds=2025-10-02
    WeatherJobs.mergeUpsertParquet(spark, batch(day2Fix), path)
    val after = parquetFiles(path)
    val beforeDay1 = before.filter(_._1.contains("ds=2025-10-01"))
    val afterDay1 = after.filter(_._1.contains("ds=2025-10-01"))
    // same files, same mtimes — physically untouched
    assert(afterDay1 == beforeDay1)
    // the touched partition WAS rewritten
    assert(after.filter(_._1.contains("ds=2025-10-02")) !=
      before.filter(_._1.contains("ds=2025-10-02")))
    // and results are still correct
    assert(snapshot(path).size == 5)
  }
}
