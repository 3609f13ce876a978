package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamJoin

/** The stream-stream interval join must (1) match only within the event-
  * time window and the city key, and (2) match a reading buffered in join
  * state against an alert that arrives in a LATER run (checkpointed state
  * across restarts) — the property that distinguishes a stateful
  * stream-stream join from per-batch joining.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2025-10-31 10:$minute%02d:00")

  test("interval join matches within the window, across batches and restarts") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("sjoin").toString
    val rdir = s"$base/readings"; val adir = s"$base/alerts"
    val cp = s"$base/cp"; val out = s"$base/out"
    def run(): Unit = {
      // parquet sink: the memory sink can't recover from a checkpoint,
      // and checkpoint recovery is exactly what this spec exercises
      val q = StreamJoin.readingsWithAlerts(spark, rdir, adir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); q.stop()
    }
    def matches(): Set[(String, String)] = spark.read.parquet(out)
      .select("city", "level").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // run 1: two readings; one in-window alert for cityA, one alert
    // OUTSIDE cityA's 10-minute window, one alert for a city with no
    // reading at all
    Seq(("cityA", ts(0), 12.5), ("cityB", ts(0), 7.0))
      .toDF("city", "ts", "temp_c").write.mode("append").parquet(rdir)
    Seq(("cityA", ts(5), "wind"), ("cityA", ts(12), "rain"),
      ("cityC", ts(6), "hail"))
      .toDF("alert_city", "alert_ts", "level").write.mode("append").parquet(adir)
    run()
    assert(matches() == Set(("cityA", "wind")),
      s"only the in-window same-city alert may match, got ${matches()}")
    // run 2 (restart, same checkpoint): an alert for cityB arrives late in
    // PROCESSING time but inside cityB's event-time window — it must join
    // the reading buffered in the checkpointed join state
    Seq(("cityB", ts(8), "snow"))
      .toDF("alert_city", "alert_ts", "level").write.mode("append").parquet(adir)
    run()
    assert(matches() == Set(("cityA", "wind"), ("cityB", "snow")),
      s"state must carry the unmatched reading across the restart, got ${matches()}")
  }
}
