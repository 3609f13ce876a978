package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.WeatherLakeV2Sink

/** Model-based property test of the lake's table semantics: random
  * sequences of the SEVEN table operations (append, merge, delete,
  * update, compact, checkpoint, overwrite) run against both the real lake and a trivial
  * in-memory Map — after EVERY op the committed view must equal the
  * model, and a SHADOW consumer that sees only the incremental change
  * feed (readNewChanges + replaceCursor) must reconstruct the same
  * state. The layout-only ops (compact/checkpoint) must be invisible to
  * both. Row-level ops run with changeLog = true, so the change-log
  * write path and its GC interplay ride every random sequence too. This is the oracle the single-scenario specs can't give:
  * arbitrary interleavings, including the ones nobody thought to write.
  */
class WeatherLakeModelSpec extends SparkSpec {

  test("random op sequences: committed view == model after every op; " +
      "the change feed alone reconstructs the model") {
    val s = spark
    import s.implicits._
    val keyFn = (f: DataFrame) => get_json_object(f("raw_json"), "$.k")
    for (trial <- 1 to 2) {
      val rng = new scala.util.Random(20260815 + trial)
      val base = Files.createTempDirectory(s"lakemodel$trial").toString
      val lake = s"$base/lake"; val cursor = s"$base/cursor"
      var model = Map.empty[Long, Long]
      var shadow = Map.empty[Long, Long] // fed ONLY by readNewChanges
      var nextKey = 0L
      def payload(rows: Seq[(Long, Long)]): DataFrame =
        rows.toDF("k", "v").select(
          concat(lit("c"), col("k") % 3).as("city"),
          lit("2024-01-01").as("ds"), lit("00").as("hour"),
          to_json(struct(col("k"), col("v"))).as("raw_json"))
      def lakeState: Map[Long, Long] = {
        val rows = WeatherLakeV2Sink.readCommitted(spark, lake).select(
            get_json_object(col("value"), "$.k").cast("long"),
            get_json_object(col("value"), "$.v").cast("long"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
        assert(rows.size == rows.map(_._1).distinct.size,
          s"duplicate keys in the committed view: $rows")
        rows.toMap
      }
      def applyFeed(): Unit = {
        val (df, view) = WeatherLakeV2Sink.readNewChanges(
          spark, lake, cursor, keyFn)
        df.select(col("change"),
            get_json_object(col("value"), "$.k").cast("long"),
            get_json_object(col("value"), "$.v").cast("long"))
          .collect().foreach { r =>
            (r.getString(0), r.getLong(1), r.getLong(2)) match {
              case ("insert" | "update_postimage", k, v) => shadow += k -> v
              case ("delete", k, _) => shadow -= k
              case ("update_preimage", _, _) => ()
              case other => fail(s"unknown change row $other")
            }
          }
        WeatherLakeV2Sink.replaceCursor(cursor, view)
      }
      def freshRows(n: Int): Seq[(Long, Long)] =
        (0 until n).map { _ =>
          nextKey += 1; (nextKey, rng.between(0L, 1000L))
        }
      // every op records (snapshot, model) — rollback's restore points
      // (nothing deletes manifests before the end-of-trial vacuum, so
      // every recorded point stays resolvable by contract)
      val restorePoints =
        scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Map[Long, Long])]
      for (i <- 1 to 8) {
        val op = rng.nextInt(8)
        op match {
          case 0 => // append brand-new keys
            val rows = freshRows(1 + rng.nextInt(3))
            payload(rows).write.format("graft.sources.WeatherLakeV2Sink")
              .mode("append").save(lake)
            model ++= rows
          case 1 => // merge: some existing keys re-valued + one fresh
            val existing = rng.shuffle(model.keys.toSeq).take(rng.nextInt(3))
              .map(k => (k, rng.between(0L, 1000L)))
            val rows = existing ++ freshRows(1)
            WeatherLakeV2Sink.mergeCommitted(spark, lake,
              payload(rows), keyFn, changeLog = true)
            model ++= rows
          case 2 => // delete a residue class
            val r = rng.nextInt(4)
            WeatherLakeV2Sink.deleteCommitted(spark, lake,
              f => get_json_object(f("raw_json"), "$.k").cast("long") % 4 === r,
              changeLog = true)
            model = model.filter { case (k, _) => k % 4 != r }
          case 3 => // update a residue class to a key-derived value
            val r = rng.nextInt(3)
            WeatherLakeV2Sink.updateCommitted(spark, lake,
              predicate = f =>
                get_json_object(f("raw_json"), "$.k").cast("long") % 3 === r,
              transform = f => to_json(struct(
                get_json_object(f("raw_json"), "$.k").cast("long").as("k"),
                (get_json_object(f("raw_json"), "$.k").cast("long") * 7 + r)
                  .as("v"))),
              changeLog = true)
            model = model.map { case (k, v) =>
              k -> (if (k % 3 == r) k * 7 + r else v) }
          case 4 => WeatherLakeV2Sink.compact(spark, lake, targetBytes = 256)
          case 5 => WeatherLakeV2Sink.checkpointManifests(lake)
          case 6 => // overwrite: full refresh to a brand-new key set;
            // the incremental feed must net it to deletes of every old
            // key + inserts of the new (snapshot diff is op-agnostic)
            val rows = freshRows(1 + rng.nextInt(3))
            payload(rows).write.format("graft.sources.WeatherLakeV2Sink")
              .mode("overwrite").save(lake)
            model = rows.toMap
          case 7 if restorePoints.nonEmpty => // rollback to a recorded
            // snapshot: the classic lake's RESTORE (payload-agnostic) —
            // the SHADOW consumer rides the snapshot-diff cursor feed,
            // which derives the restore's net delta (the commit-log #op
            // router refuses rollback; that refusal is spec-pinned in
            // TypedLakeRollbackSpec)
            val (snap, recorded) =
              restorePoints(rng.nextInt(restorePoints.size))
            WeatherLakeV2Sink.rollbackTo(lake, snap)
            model = recorded
          case 7 => () // nothing recorded yet: no-op round
        }
        restorePoints += ((WeatherLakeV2Sink.snapshot(lake), model))
        assert(lakeState == model, s"trial $trial op#$i (kind $op) diverged")
        applyFeed()
        assert(shadow == model,
          s"trial $trial op#$i (kind $op): feed-reconstructed state diverged")
      }
      // end of trial: routine vacuum must change nothing for a caught-up
      // consumer, and both oracles still agree
      WeatherLakeV2Sink.vacuum(lake, minAgeMs = 0L, force = true)
      assert(lakeState == model)
      applyFeed()
      assert(shadow == model)
    }
  }
}
