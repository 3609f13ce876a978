package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream event-time INTERVAL join with bounded state — the §2.5
  * surface beyond the reference's single-stream jobs: every weather
  * reading is joined to the alerts raised for its city within the
  * following `windowMinutes`.
  *
  * Both inputs carry watermarks and the join condition bounds event time
  * in BOTH directions (`alert_ts` ∈ [ts, ts + window]), which is exactly
  * what lets Spark evict buffered rows once the global watermark passes
  * their match window — on an unbounded stream the join state stays
  * O(window × arrival rate) instead of growing forever. Spark executes
  * this as a symmetric stateful hash join keyed by city, with each side's
  * state pruned by the derived time bounds.
  */
object StreamJoin {

  val ReadingSchema = "city STRING, ts TIMESTAMP, temp_c DOUBLE"
  val AlertSchema = "alert_city STRING, alert_ts TIMESTAMP, level STRING"

  def readingsWithAlerts(spark: SparkSession, readingsPath: String,
      alertsPath: String, windowMinutes: Int = 10): DataFrame = {
    val readings = spark.readStream.schema(ReadingSchema).parquet(readingsPath)
      .withWatermark("ts", s"$windowMinutes minutes")
    val alerts = spark.readStream.schema(AlertSchema).parquet(alertsPath)
      .withWatermark("alert_ts", s"$windowMinutes minutes")
    readings.join(alerts, expr(
      s"""city = alert_city AND
         |alert_ts >= ts AND
         |alert_ts <= ts + interval $windowMinutes minutes""".stripMargin))
      .select(col("city"), col("ts"), col("temp_c"),
        col("alert_ts"), col("level"))
  }
}
