package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  *
  * All tables are plain parquet, one file per table under the sf directory.
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark does not
  * read natively; we read it as a nanosecond long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds,
  * which is exactly what DuckDB does when it reads the same file — so oracle
  * comparisons agree at microsecond precision.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Events table with `ts` normalized to a microsecond TimestampType.
    *
    * The driver has generated `events.ts` as both TIMESTAMP(NANOS) (rounds
    * 1-4) and TIMESTAMP(MICROS) (round 5+); handle either. NANOS is read as
    * a long (`nanosAsLong`) and truncated to micros; MICROS arrives as
    * TIMESTAMP_NTZ and is cast to TimestampType under the UTC session zone —
    * identical values, and exactly what DuckDB yields on the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
