package graft
class ScratchPerfSpec extends SparkSpec {
  test("inline mor scan fixed overhead") {
    val w = java.nio.file.Files.createTempDirectory("perf").toString
    spark.conf.set("spark.sql.catalog.perf", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.perf.warehouse", w)
    spark.sql("CREATE TABLE perf.t (id BIGINT, v BIGINT) USING lake TBLPROPERTIES ('dmlMode'='mor')")
    spark.sql("INSERT INTO perf.t SELECT id, id FROM range(500)")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"TIME $tag ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    time("clean-scan-1")(spark.table("perf.t").count())
    time("clean-scan-2")(spark.table("perf.t").count())
    spark.sql("DELETE FROM perf.t WHERE id = 7")
    time("mor-scan-1")(spark.table("perf.t").count())
    time("mor-scan-2")(spark.table("perf.t").count())
    time("mor-scan-3")(spark.table("perf.t").count())
    spark.sql("DELETE FROM perf.t WHERE id = 8")
    time("mor2-scan-1")(spark.table("perf.t").count())
    time("mor2-scan-2")(spark.table("perf.t").count())
  }
}
