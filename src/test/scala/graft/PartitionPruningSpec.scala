package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.weather.Weather

/** Validates the PLANS.md claim that lake/mart layouts give partition
  * pruning: a filter on a partition column must reach the scan as a
  * PartitionFilter (pruned file listing), not a post-scan Filter.
  */
class PartitionPruningSpec extends SparkSpec {

  test("daily mart partitioned by day prunes non-matching partitions") {
    val dir = Files.createTempDirectory("mart").toString + "/fct_city_day"
    val mart = Weather.runFixturePipeline(spark)
      .withColumn("day_p", col("day").cast("string"))
    mart.write.partitionBy("day_p").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("day_p") === "2025-10-31")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day_p"), plan)
    assert(read.count() == 4)
    // a non-existent partition reads zero files, not zero rows post-scan
    val none = spark.read.parquet(dir).filter(col("day_p") === "1999-01-01")
    assert(none.count() == 0)
  }

  test("raw lake reads prune on the city partition column") {
    val dir = Files.createTempDirectory("lakeprune").toString
    val s = spark
    import s.implicits._
    val raw = Weather.fixturePayloads
      .toDF("city", "_ingested_at_s", "raw_json")
      .select(col("city"), col("_ingested_at_s").cast("timestamp").as("_ingested_at"),
        from_json(col("raw_json"), Weather.RawWeatherSchema).as("p"))
      .select(col("city"), col("_ingested_at"), col("p.*"))
      .withColumn("ds", lit("2025-10-31")).withColumn("hour", lit("12"))
    Weather.writeLake(raw, dir)
    val one = Weather.readLake(spark, dir).filter(col("city") === "Berlin")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(city"), plan)
    assert(one.count() == 1)
  }
}
