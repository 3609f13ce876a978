package graft

import org.apache.spark.sql.functions._
import graft.sources.OpenMeteoV2Source
import graft.weather.Weather

class OpenMeteoV2SourceSpec extends SparkSpec {

  test("DSv2 source plans one partition per city and feeds the pipeline") {
    // fixture transport: answer every URL with the payload whose
    // coordinates appear in the query string
    val byCoords = Weather.fixturePayloads.take(4).map(_._3)
    OpenMeteoV2Source.Transports.register("fixture", url => {
      byCoords.find { p =>
        val lat = url.split("latitude=")(1).split("&")(0)
        p.contains(s""""latitude": $lat""") || p.replace(" ", "").contains(s""""latitude":$lat""")
      }.getOrElse(sys.error(s"no fixture for $url"))
    })
    val df = spark.read.format("graft.sources.OpenMeteoV2Source")
      .option("cities", "Warsaw:52.23:21.01;Berlin:52.52:13.41;London:51.51:-0.13;Paris:48.85:2.35")
      .option("window", "2025-10-31T10:00/2025-10-31T12:00")
      .option("transport", "fixture")
      .load()
    assert(df.rdd.getNumPartitions == 4) // one fetch partition per city
    assert(df.count() == 4)
    // through the normal pipeline: parse → explode → clean
    val staged = Weather.clean(Weather.explodeHourly(
      df.select(col("city"), current_timestamp().as("_ingested_at"),
          from_json(col("raw_json"), Weather.RawWeatherSchema).as("p"))
        .select(col("city"), col("_ingested_at"), col("p.*"))))
    assert(staged.count() == 12) // 4 cities × 3 hours
    assert(staged.filter(col("city") === "Warsaw" && col("temperature_2m") === 15.5).count() == 1)
  }
}
