package graft

import org.apache.spark.sql.functions._
import graft.ops.Quality
import graft.weather.Weather

class WeatherSpec extends SparkSpec {

  lazy val mart = Weather.runFixturePipeline(spark).cache()

  test("flagship pipeline produces a non-empty daily mart") {
    assert(mart.count() == 4) // 4 cities × 1 day
  }

  test("upsert is last-write-wins: re-ingested Warsaw 12:00 hour wins") {
    // fixture re-ingests Warsaw 12:00 with temp 16.1 (was 15.9); daily avg
    // becomes (15.5 + 15.7 + 16.1) / 3
    val warsaw = mart.filter(col("city") === "Warsaw").head()
    assert(math.abs(warsaw.getAs[Double]("temperature_avg") - (15.5 + 15.7 + 16.1) / 3) < 1e-9)
    assert(warsaw.getAs[Long]("n_hours") == 3)
  }

  test("ragged arrays pad with null and aggregates skip them") {
    // London's wind array has 2 entries for 3 hours: avg over the 2 non-null
    val london = mart.filter(col("city") === "London").head()
    assert(math.abs(london.getAs[Double]("wind_speed_avg") - (9.9 + 9.8) / 2) < 1e-9)
    assert(london.getAs[Long]("n_hours") == 3)
  }

  test("documented mart superset: min/max/sum columns present") {
    val cols = mart.columns.toSet
    assert(Set("temperature_avg", "temperature_min", "temperature_max",
      "precipitation_avg", "precipitation_sum", "wind_speed_avg",
      "wind_speed_max").subsetOf(cols))
  }

  test("coldest day report returns the minimum-temperature city-day") {
    val coldest = Weather.coldestDay(mart).head()
    assert(coldest.getAs[String]("city") == "London")
  }

  test("quality gate blocks the canonical bad batch") {
    import spark.implicits._
    // FIXTURES.md §4 bad records: null ts, 150 °C, −5 mm precipitation
    val bad = Seq(
      ("Warsaw", null.asInstanceOf[java.sql.Timestamp], 150.0, -5.0, 5.0,
        52.23, 21.01, "Europe/Berlin"))
      .toDF("city", "timestamp", "temperature_2m", "precipitation",
        "wind_speed_10m", "latitude", "longitude", "timezone")
    val report = Quality.validate(bad, Weather.weatherSuite)
    assert(!report.passed)
    assert(report.failures.map(_.name).toSet ==
      Set("not_null_timestamp", "between_temperature_2m", "between_precipitation"))
  }

  test("quality gate passes the canonical good batch") {
    import spark.implicits._
    val good = Seq(
      ("Warsaw", java.sql.Timestamp.valueOf("2025-10-31 12:00:00"), 15.5, 0.0, 5.2,
        52.23, 21.01, "Europe/Berlin"),
      ("Berlin", java.sql.Timestamp.valueOf("2025-10-31 12:00:00"), 16.8, 2.5, 8.1,
        52.52, 13.41, "Europe/Berlin"))
      .toDF("city", "timestamp", "temperature_2m", "precipitation",
        "wind_speed_10m", "latitude", "longitude", "timezone")
    assert(Quality.validate(good, Weather.weatherSuite).passed)
  }

  test("empty batch fails the gate (validate_raw_weather.py:122-123)") {
    import spark.implicits._
    val empty = Seq.empty[(String, java.sql.Timestamp, Double, Double, Double,
      Double, Double, String)]
      .toDF("city", "timestamp", "temperature_2m", "precipitation",
        "wind_speed_10m", "latitude", "longitude", "timezone")
    assert(!Quality.validate(empty, Weather.weatherSuite).passed)
  }

  test("local-time cutoff: Warsaw hours >= 12:00 local on Oct 31 dropped") {
    import spark.implicits._
    // 2025-10-31 Warsaw is UTC+1 (CET, after the Oct-26 DST fallback):
    // 10:59Z = 11:59 local (kept), 11:00Z = 12:00 local (dropped)
    val df = Seq(
      java.sql.Timestamp.valueOf("2025-10-31 10:59:00"),
      java.sql.Timestamp.valueOf("2025-10-31 11:00:00"))
      .toDF("timestamp")
    val kept = Weather.localCutoff(df, "Europe/Warsaw", "2025-10-31", 12)
      .collect().map(_.getTimestamp(0).toString)
    assert(kept.toSeq == Seq("2025-10-31 10:59:00.0"))
  }

  test("DST boundary: Oct 26 2025 has 24 UTC hours in the daily mart") {
    import spark.implicits._
    val hours = (0 until 24).map(h =>
      ("Warsaw", java.sql.Timestamp.valueOf(f"2025-10-26 $h%02d:00:00"),
        10.0, 0.0, 1.0, java.sql.Timestamp.valueOf("2025-10-27 00:00:00")))
      .toDF("city", "timestamp", "temperature_2m", "precipitation",
        "wind_speed_10m", "_ingested_at")
    val m = Weather.dailyMart(hours)
    assert(m.head().getAs[Long]("n_hours") == 24)
  }

  test("missingHours finds exactly the removed city-hours") {
    import spark.implicits._
    val all = for {
      city <- Seq("Warsaw", "Berlin"); h <- 0 until 12
    } yield (city, java.sql.Timestamp.valueOf(f"2025-10-30 $h%02d:00:00"),
      10.0, 0.0, 1.0, java.sql.Timestamp.valueOf("2025-10-31 00:00:00"))
    val withGaps = all.filterNot { case (c, ts, _, _, _, _) =>
      (c == "Warsaw" && ts.toString.startsWith("2025-10-30 05")) ||
        (c == "Berlin" && ts.toString.startsWith("2025-10-30 09"))
    }.toDF("city", "timestamp", "temperature_2m", "precipitation",
      "wind_speed_10m", "_ingested_at")
    val missing = Weather.missingHours(withGaps)
      .collect().map(r => (r.getAs[String]("city"), r.getAs[java.sql.Timestamp]("bucket").toString))
    assert(missing.toSet == Set(
      ("Warsaw", "2025-10-30 05:00:00.0"), ("Berlin", "2025-10-30 09:00:00.0")))
  }
}
