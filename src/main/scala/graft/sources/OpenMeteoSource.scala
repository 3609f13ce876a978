package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.weather.Weather

/** The reference's HTTP sources (SURVEY.md S1/S2): Open-Meteo `/v1/forecast`
  * and `/v1/archive` payload acquisition, re-expressed for Spark.
  *
  * The fetch itself is driver-adjacent and transport-injectable: `transport`
  * maps a URL to a JSON payload body (in production `java.net.http`; in
  * tests a fixture map — this environment has no egress, and the engine's
  * job starts at the payload, not the socket). Fetched payloads immediately
  * become a schema-enforced DataFrame, so everything downstream of the
  * network boundary is the distributed pipeline.
  *
  * URL construction mirrors openmeteo_client.py:12-61 (hourly variable
  * list, timezone parameter, ISO date window).
  */
object OpenMeteoSource {

  final case class City(name: String, lat: Double, lon: Double)

  val HourlyVars = "temperature_2m,precipitation,wind_speed_10m"

  /** openmeteo_client.py:19-25 — forecast endpoint query. */
  def forecastUrl(lat: Double, lon: Double, startIso: String, endIso: String,
      tz: String = "Europe/Berlin"): String =
    s"https://api.open-meteo.com/v1/forecast?latitude=$lat&longitude=$lon" +
      s"&hourly=$HourlyVars&timezone=$tz" +
      s"&start_hour=$startIso&end_hour=$endIso"

  /** openmeteo_client.py:40-56 — archive endpoint query. */
  def archiveUrl(lat: Double, lon: Double, startDate: String, endDate: String,
      tz: String = "auto"): String =
    s"https://archive-api.open-meteo.com/v1/archive?latitude=$lat&longitude=$lon" +
      s"&hourly=$HourlyVars&timezone=$tz" +
      s"&start_date=$startDate&end_date=$endDate"

  /** Fetch one payload per city through `transport` and land them as a raw
    * schema-enforced DataFrame (city + payload columns + `_ingested_at`),
    * ready for [[Weather.explodeHourly]]. The fetch loop is O(cities) on
    * the driver — cities are small; payloads are what scale, and they are
    * parsed/processed distributed.
    */
  def fetch(
      spark: SparkSession,
      cities: Seq[City],
      urlFor: City => String,
      transport: String => String): DataFrame = {
    import spark.implicits._
    cities.map(c => (c.name, transport(urlFor(c))))
      .toDF("city", "raw_json")
      .select(
        col("city"),
        current_timestamp().as("_ingested_at"),
        from_json(col("raw_json"), Weather.RawWeatherSchema).as("p"))
      .select(col("city"), col("_ingested_at"), col("p.*"))
  }
}
