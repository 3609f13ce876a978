package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.WeatherLakeV2Sink

/** APPLY CHANGES INTO (applyChangesWriter): a silver lake maintained
  * purely from a bronze lake's streaming change feed converges to
  * bronze's live state under random op sequences, across stream
  * restarts, a mid-stream bronze vacuum, and replayed epochs.
  */
class LakeCdcApplySpec extends SparkSpec {

  test("bronze -> silver via the streaming change feed: random ops, " +
      "restarts every drain, mid-stream vacuum, replayed epochs — " +
      "silver always converges to bronze's live state") {
    val s = spark
    import s.implicits._
    val keyFn = (f: DataFrame) => get_json_object(f("raw_json"), "$.k")
    val route = (v: org.apache.spark.sql.Column) =>
      (concat(lit("c"), get_json_object(v, "$.k").cast("long") % 3),
        lit("2024-01-01"), lit("00"))
    val rng = new scala.util.Random(20260815)
    val base = Files.createTempDirectory("lakecdcapply").toString
    val bronze = s"$base/bronze"; val silver = s"$base/silver"
    val ckpt = s"$base/ckpt"
    var model = Map.empty[Long, Long]
    var nextKey = 0L
    def payload(rows: Seq[(Long, Long)]): DataFrame =
      rows.toDF("k", "v").select(
        concat(lit("c"), col("k") % 3).as("city"),
        lit("2024-01-01").as("ds"), lit("00").as("hour"),
        to_json(struct(col("k"), col("v"))).as("raw_json"))
    def stateOf(lake: String): Map[Long, Long] =
      WeatherLakeV2Sink.readCommitted(spark, lake).select(
          get_json_object(col("value"), "$.k").cast("long"),
          get_json_object(col("value"), "$.v").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each drain is a RESTART: a fresh AvailableNow query resuming from
    // the shared checkpoint — the exactly-once claim rides on it
    def drainIntoSilver(): Unit = {
      val q = spark.readStream
        .format("graft.sources.WeatherLakeV2StreamSource")
        .option("readChangeFeed", "true")
        .load(bronze)
        .writeStream
        .foreachBatch(WeatherLakeV2Sink.applyChangesWriter(
          silver, "bronze-to-silver", keyFn, route))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def freshRows(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ =>
        nextKey += 1; (nextKey, rng.between(0L, 1000L))
      }
    for (i <- 1 to 10) {
      rng.nextInt(5) match {
        case 0 =>
          val rows = freshRows(1 + rng.nextInt(3))
          payload(rows).write.format("graft.sources.WeatherLakeV2Sink")
            .mode("append").save(bronze)
          model ++= rows
        case 1 =>
          val existing = rng.shuffle(model.keys.toSeq).take(rng.nextInt(3))
            .map(k => (k, rng.between(0L, 1000L)))
          val rows = existing ++ freshRows(1)
          WeatherLakeV2Sink.mergeCommitted(spark, bronze,
            payload(rows), keyFn, changeLog = true)
          model ++= rows
        case 2 =>
          val r = rng.nextInt(4)
          WeatherLakeV2Sink.deleteCommitted(spark, bronze,
            f => get_json_object(f("raw_json"), "$.k").cast("long") % 4 === r,
            changeLog = true)
          model = model.filter { case (k, _) => k % 4 != r }
        case 3 =>
          val r = rng.nextInt(3)
          WeatherLakeV2Sink.updateCommitted(spark, bronze,
            predicate = f =>
              get_json_object(f("raw_json"), "$.k").cast("long") % 3 === r,
            transform = f => to_json(struct(
              get_json_object(f("raw_json"), "$.k").cast("long").as("k"),
              (get_json_object(f("raw_json"), "$.k").cast("long") * 7 + r)
                .as("v"))),
            changeLog = true)
          model = model.map { case (k, v) =>
            k -> (if (k % 3 == r) k * 7 + r else v) }
        case 4 =>
          WeatherLakeV2Sink.compact(spark, bronze, targetBytes = 256)
      }
      drainIntoSilver()
      assert(stateOf(bronze) == model, s"op#$i: bronze diverged from model")
      assert(stateOf(silver) == model,
        s"op#$i: silver (feed-applied) diverged from bronze")
      if (i == 5) {
        // mid-stream vacuum: the consumer is caught up, so reclaiming
        // bronze's superseded history must not disturb the pipeline
        WeatherLakeV2Sink.vacuum(bronze, minAgeMs = 0L, force = true)
        val more = freshRows(2)
        payload(more).write.format("graft.sources.WeatherLakeV2Sink")
          .mode("append").save(bronze)
        model ++= more
        drainIntoSilver()
        assert(stateOf(silver) == model, "silver diverged after vacuum")
      }
    }
    // replayed epoch: calling the writer again with an already-applied
    // epochId is a marker-short-circuited no-op — and even forcing the
    // apply path with the same NET changes leaves the state unchanged
    // (idempotent merge) and silver's own history quiet
    val writer = WeatherLakeV2Sink.applyChangesWriter(
      silver, "bronze-to-silver", keyFn, route)
    val silverManifests = WeatherLakeV2Sink.manifestNames(silver).size
    val fakeEpoch = Seq(("insert", s"""{"k":${nextKey + 1000},"v":1}""",
        "manifest-x.txt", 1L))
      .toDF("change", "value", "commit", "commit_ts")
    writer(fakeEpoch, 0L) // epoch 0 was applied long ago -> marker skip
    assert(WeatherLakeV2Sink.manifestNames(silver).size == silverManifests,
      "a replayed epoch must publish nothing")
    assert(stateOf(silver) == model)
  }
}
