package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool, two modes:
  *
  *  - `runMain graft.Explain <name> [sfDir]` — print the formatted physical
  *    plan of one query and time it (cold + warm).
  *  - `runMain graft.Explain --all [sfDir] [outDir]` — dump every query's
  *    formatted plan to `<outDir>/<name>.txt` with volatile tokens
  *    (expression ids, plan ids, file paths, stats) scrubbed, so snapshots
  *    are committable and plan regressions (a lost pushdown, a new
  *    Exchange) show up as git diffs round-over-round.
  */
object Explain {

  /** Strip run-variable noise so two dumps of the same logical plan are
    * byte-identical.
    */
  def scrub(plan: String, sfDir: String): String = plan
    .replace(sfDir, "<SF>")
    .replaceAll("#\\d+", "#x")
    // lambda variable names carry a session-global counter (x_5 vs x_18
    // depending on how many lambdas the session created before this plan)
    .replaceAll("lambda ([a-z]+)_\\d+", "lambda $1_n")
    // RDD callsites embed source line numbers, which move on unrelated
    // edits to the file
    .replaceAll("at ([A-Za-z0-9_.]+)\\.scala:\\d+", "at $1.scala:<line>")
    // typed-API (map/flatMap/mapPartitions) plans print the JVM lambda
    // object identity — different every process
    .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+@[0-9a-f]+", "\\$\\$Lambda\\$<id>")
    // RDD ids in ExistingRDD/localCheckpoint arguments are a session counter
    .replaceAll("RDD\\[\\d+\\]", "RDD[x]")
    .replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("Location: InMemoryFileIndex[^\\n]*", "Location: <scrubbed>")
    .replaceAll("file:[^,\\]\\s]*", "<path>")
    .replaceAll("Statistics\\([^)]*\\)", "Statistics(<scrubbed>)")
    // content-addressed materializations (bucketed tables, exported models)
    // embed a corpus signature — row count + key sum — that varies by SF
    .replaceAll("_bkt_n\\d+_s\\d+", "_bkt_<sig>")
    // the catalog fixture tables' names are content-addressed the same way
    .replaceAll("(docs[a-z_]*)_n\\d+_s\\d+", "$1_<sig>")
    .replaceAll("(typed_[a-z_]*)_n\\d+_s\\d+", "$1_<sig>")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("--all")) {
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
      val outDir = if (args.length > 2) args(2) else "plans"
      Files.createDirectories(Paths.get(outDir))
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), scrub(plan, sfDir))
          println(s"[plans] wrote $outDir/$name.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
        }
      }
    } else {
      val name = args(0)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val fn = SparkEntry.queries(name)
      println(fn(spark, sfDir).queryExecution.explainString(FormattedMode))
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
