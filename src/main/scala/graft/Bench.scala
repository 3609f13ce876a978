package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every registered query on
  * SPARK_GRAFT_SF_DIR, print one JSON line with per-query wall-clock.
  * Results are materialized through the `noop` sink so every column of
  * every row is computed (a bare `count()` lets Spark prune most of the
  * work and would overstate throughput).
  *
  * Harness hygiene:
  *  - every table is warmed (scanned through noop) before the timed loop,
  *    so the first query to touch lineitem isn't charged its first-scan IO
  *    and codegen warm-up;
  *  - each query is timed best-of-2 to damp container noise (same query
  *    has measured 2.5 s vs 8.4 s across runs here);
  *  - a query that throws is recorded with a -1 sentinel and listed in a
  *    "failed" array instead of silently contributing an artificially
  *    short elapsed time to the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM (classloading, codegen, shuffle machinery) outside any
    // timed region so the first alphabetical query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)")
      .write.mode("overwrite").format("noop").save()
    // warm every input table: pull each file through the OS page cache and
    // parquet footer/decoder paths before any query is timed
    Tables.names.foreach { t =>
      Tables.table(spark, sfDir, t)
        .write.mode("overwrite").format("noop").save()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      try name -> math.min(once(), once())
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
