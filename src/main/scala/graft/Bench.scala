package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every registered query on
  * SPARK_GRAFT_SF_DIR, print one JSON line with per-query wall-clock.
  * Results are materialized through the `noop` sink so every column of
  * every row is computed (a bare `count()` lets Spark prune most of the
  * work and would overstate throughput).
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
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.mode("overwrite").format("noop").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
