package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.weather.Weather
import graft.streaming.WeatherStreaming

class StreamingSpec extends SparkSpec {

  private def rawFixture = {
    val s = spark
    import s.implicits._
    Weather.fixturePayloads
      .toDF("city", "_ingested_at_s", "raw_json")
      .select(col("city"),
        col("_ingested_at_s").cast("timestamp").as("_ingested_at"),
        from_json(col("raw_json"), Weather.RawWeatherSchema).as("p"))
      .select(col("city"), col("_ingested_at"), col("p.*"))
      .withColumn("ds", lit("2025-10-31"))
      .withColumn("hour", lit("12"))
  }

  test("lake write → batch read roundtrip preserves payloads and partitions") {
    val dir = Files.createTempDirectory("lake").toString
    Weather.writeLake(rawFixture, dir)
    val back = Weather.readLake(spark, dir)
    assert(back.count() == 5) // 5 payload objects
    assert(back.columns.contains("city") && back.columns.contains("ds"))
    val staged = Weather.clean(Weather.explodeHourly(back))
    assert(staged.count() == 13) // 4 cities × 3 hours + 1 re-ingest hour
  }

  test("streaming lake → watermarked dedup → daily mart matches batch") {
    val dir = Files.createTempDirectory("lake-stream").toString
    Weather.writeLake(rawFixture, dir)
    val mart = WeatherStreaming.dailyMartStream(
      WeatherStreaming.readStagingStream(spark, dir))
    val q = mart.writeStream
      .format("memory").queryName("mart_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("mart_stream")
    assert(got.count() == 4) // one window row per city
    val warsaw = got.filter(col("city") === "Warsaw").head()
    // dedup keeps the re-ingested 12:00 row (16.1): avg = (15.5+15.7+16.1)/3
    // (streaming dropDuplicates keeps the first arrival; both rows for the
    // key carry the same hour so n_hours stays 3)
    assert(warsaw.getAs[Long]("n_hours") == 3L)
  }

  test("gatedLoadStream loads good batches and blocks bad ones") {
    val base = Files.createTempDirectory("gated").toString
    val lake = s"$base/lake"; val staging = s"$base/staging"
    Weather.writeLake(rawFixture, lake)
    val q1 = WeatherStreaming.gatedLoadStream(spark, lake, staging, s"$base/cp1")
    q1.awaitTermination(60000)
    assert(spark.read.parquet(staging).count() == 12) // deduped staging keys
    // a poisoned payload (temperature 150 °C) arrives: the gate throws,
    // the query fails, staging is untouched
    val s = spark
    import s.implicits._
    val bad = Seq(("Oslo", "2025-10-31 14:00:00",
      """{"latitude": 59.9, "longitude": 10.7, "timezone": "Europe/Berlin",
        |"hourly": {"time": ["2025-10-31T13:00"], "temperature_2m": [150.0],
        |"precipitation": [0.0], "wind_speed_10m": [1.0]}}""".stripMargin))
      .toDF("city", "_ingested_at_s", "raw_json")
      .select(col("city"), col("_ingested_at_s").cast("timestamp").as("_ingested_at"),
        from_json(col("raw_json"), Weather.RawWeatherSchema).as("p"))
      .select(col("city"), col("_ingested_at"), col("p.*"))
      .withColumn("ds", lit("2025-10-31")).withColumn("hour", lit("14"))
    Weather.writeLake(bad, lake)
    val q2 = WeatherStreaming.gatedLoadStream(spark, lake, staging, s"$base/cp2")
    val failed =
      try { q2.awaitTermination(60000); false }
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        e.getMessage.contains("quality gate failed") ||
          Option(e.getCause).exists(_.getMessage.contains("quality gate failed"))
      }
    assert(failed, "expected the bad batch to fail the streaming query")
    assert(spark.read.parquet(staging).count() == 12)
    assert(spark.read.parquet(staging)
      .filter(col("city") === "Oslo").count() == 0)
  }

  test("streaming dedup bounds duplicates within the watermark") {
    val dir = Files.createTempDirectory("lake-dup").toString
    Weather.writeLake(rawFixture, dir)
    Weather.writeLake(rawFixture, dir) // same files arrive twice
    val staged = WeatherStreaming.dedupedStaging(
      WeatherStreaming.readStagingStream(spark, dir))
    val q = staged.writeStream
      .format("memory").queryName("staging_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // 12 distinct (city, timestamp) keys despite 26 arriving rows (the
    // Warsaw re-ingest shares its key with the original 12:00 hour)
    assert(spark.table("staging_stream").count() == 12)
  }

  test("dedupRetries suppresses a retried fetch with a DIFFERENT ingest timestamp") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("retries").toString
    val dir = s"$base/raw"; val cp = s"$base/cp"; val out = s"$base/out"
    def payloads(rows: Seq[(String, String, String, String)]) =
      rows.toDF("city", "ds", "hour", "ing_s")
        .select(col("city"), col("ds"), col("hour"),
          col("ing_s").cast("timestamp").as("_ingested_at"))
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("city STRING, ds STRING, hour STRING, _ingested_at TIMESTAMP")
        .parquet(dir)
      // file sink (not memory): the second run must RECOVER the dedup
      // state from the checkpoint, which the memory sink doesn't support
      val q = WeatherStreaming.dedupRetries(stream).writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); q.stop()
    }
    payloads(Seq(
      ("Warsaw", "2025-10-31", "12", "2025-10-31 12:05:00"),
      ("Berlin", "2025-10-31", "12", "2025-10-31 12:06:00")))
      .write.mode("append").parquet(dir)
    runOnce()
    // the retry arrives 15 min later with ITS OWN _ingested_at — a
    // dropDuplicates key including the event-time column would pass it
    payloads(Seq(
      ("Warsaw", "2025-10-31", "12", "2025-10-31 12:20:00"), // retry: dropped
      ("Paris", "2025-10-31", "12", "2025-10-31 12:21:00"))) // new: kept
      .write.mode("append").parquet(dir)
    runOnce()
    val got = spark.read.parquet(out)
      .select(col("city")).collect().map(_.getString(0)).toSeq
    assert(got.sorted == Seq("Berlin", "Paris", "Warsaw"),
      s"expected the Warsaw retry suppressed, got $got")
  }
}
