package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** Model-based property test of the TYPED lake incl. MERGE-ON-READ
  * and NAMED REFS: random sequences of table operations — append,
  * copy-on-write merge/delete/update, MOR merge/delete/update, compact,
  * checkpoint, measure, reconcile, compact_deletes, tag, drop_tag,
  * create_branch, branch-stage, fast_forward, rollback-to-a-recorded-
  * snapshot —
  * against both the real table and a trivial in-memory Map.
  * After EVERY op the mor-resolved committed view must equal the model,
  * and a SHADOW consumer fed only the typed incremental change feed
  * (readNewChangesTyped + replaceCursor) must reconstruct the same state
  * — which exercises every interaction the single-scenario specs can't:
  * delete rows surviving checkpoints/measures, CoW rewrites racing live
  * directives, reconcile folding mid-sequence, CDF diffs spanning mixed
  * mor/cow commits.
  */
class TypedLakeModelSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType),
    StructField("city", StringType)))
  private val pc = Seq("city")

  test("random typed op sequences incl. merge-on-read: resolved view == " +
      "model after every op; the typed change feed alone reconstructs it") {
    val s = spark
    import s.implicits._
    for (trial <- 1 to 2) {
      val rng = new scala.util.Random(20260816 + trial)
      val base = Files.createTempDirectory(s"typedmodel$trial").toString
      val lake = s"$base/lake"; val cursor = s"$base/cursor"
      var model = Map.empty[Long, Long]
      var shadow = Map.empty[Long, Long]
      // every live tag remembers the MODEL state at creation: after any
      // op (CoW rewrites, mor debt, maintenance, the final zero-age
      // vacuum) the tagged snapshot must still read EXACTLY that state —
      // the retention-root property under the op mix
      var tagged = Map.empty[String, Map[Long, Long]]
      var tagSeq = 0
      // at most one live BRANCH: (name, model at fork, staged rows) —
      // after any main op (CoW rewrites superseding the base, mor debt,
      // maintenance, the final zero-age vacuum) the branch view must
      // still read fork-state + staged, and fast_forward must succeed
      // IFF main is still exactly the base (strict ancestry)
      var branch: Option[(String, Map[Long, Long], Map[Long, Long])] = None
      var branchSeq = 0
      var nextKey = 0L
      def payload(rows: Seq[(Long, Long)]): DataFrame =
        rows.toDF("k", "v").select(col("k"), col("v"),
          concat(lit("c"), col("k") % 3).as("city"))
      def lakeState: Map[Long, Long] = {
        val rows = TypedLake.readCommittedTyped(spark, lake, schema)
          .select("k", "v").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toSeq
        assert(rows.size == rows.map(_._1).distinct.size,
          s"duplicate keys in the resolved view: $rows")
        rows.toMap
      }
      def applyFeed(): Unit = {
        val (df, view) = TypedLake.readNewChangesTyped(spark, lake, schema,
          keyCols = Seq("k"), cursorPath = cursor)
        df.select(col("_change"), col("k"), col("v"))
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
      def tagState(name: String): Map[Long, Long] = {
        val snap = WeatherLakeV2Sink.readTag(lake, name)
        val files = WeatherLakeV2Sink.filesAsOf(lake, snap)
        val dels = WeatherLakeV2Sink.morDeleteLinesAsOf(lake, snap)
        TypedLake.readResolvedSplit(spark, lake, schema, files, dels)
          .select("k", "v").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      def branchState(name: String): Map[Long, Long] = {
        val base = WeatherLakeV2Sink.readBranchBase(lake, name)
        val files = WeatherLakeV2Sink.filesAsOf(lake, base) ++
          WeatherLakeV2Sink.branchFiles(lake, name)
        val dels = WeatherLakeV2Sink.morDeleteLinesAsOf(lake, base)
        TypedLake.readResolvedSplit(spark, lake, schema, files, dels)
          .select("k", "v").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      def freshRows(n: Int): Seq[(Long, Long)] =
        (0 until n).map { _ =>
          nextKey += 1; (nextKey, rng.between(0L, 1000L))
        }
      // every op records (snapshot, model) — rollback's restore points.
      // Mid-trial nothing deletes manifests (vacuum runs only at trial
      // end), so every recorded point stays resolvable by contract.
      val restorePoints =
        scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Map[Long, Long])]
      // seed so every op has something to chew on
      locally {
        val rows = freshRows(4)
        TypedLake.appendTyped(spark, lake, payload(rows), schema, pc,
          statsFields = Seq("k"))
        model ++= rows
        restorePoints += ((WeatherLakeV2Sink.snapshot(lake), model))
      }
      for (i <- 1 to 13) {
        val op = rng.nextInt(18)
        // mor ops randomize the delete-file FLAVOR per op — the table
        // organically mixes position and equality files across its
        // history, the exact state every reader must subtract correctly
        def flavor(): Boolean = rng.nextBoolean()
        op match {
          case 0 => // append brand-new keys
            val rows = freshRows(1 + rng.nextInt(3))
            TypedLake.appendTyped(spark, lake, payload(rows), schema, pc,
              statsFields = Seq("k"))
            model ++= rows
          case 1 => // copy-on-write merge upsert
            val existing = rng.shuffle(model.keys.toSeq).take(rng.nextInt(3))
              .map(k => (k, rng.between(0L, 1000L)))
            val rows = existing ++ freshRows(1)
            TypedLake.mergeTyped(spark, lake, schema, pc,
              payload(rows), keyCols = Seq("k", "city"))
            model ++= rows
          case 2 => // MERGE-ON-READ merge upsert
            val existing = rng.shuffle(model.keys.toSeq).take(rng.nextInt(3))
              .map(k => (k, rng.between(0L, 1000L)))
            val rows = existing ++ freshRows(1)
            TypedLake.mergeTypedMor(spark, lake, schema, pc,
              payload(rows), keyCols = Seq("k", "city"),
              positionDeletes = flavor())
            model ++= rows
          case 3 => // copy-on-write delete of a residue class
            val r = rng.nextInt(4)
            TypedLake.deleteTyped(spark, lake, schema, pc,
              predicate = df => df("k") % 4 === r)
            model = model.filter { case (k, _) => k % 4 != r }
          case 4 => // MERGE-ON-READ delete of a residue class
            val r = rng.nextInt(4)
            TypedLake.deleteTypedMor(spark, lake, schema, pc,
              predicate = df => df("k") % 4 === r,
              positionDeletes = flavor(), statsFields = Seq("k"))
            model = model.filter { case (k, _) => k % 4 != r }
          case 5 => // copy-on-write update to a key-derived value
            val r = rng.nextInt(3)
            TypedLake.updateTyped(spark, lake, schema, pc,
              predicate = df => df("k") % 3 === r,
              assignments = Seq("v" -> (df => df("k") * 7 + r)))
            model = model.map { case (k, v) =>
              k -> (if (k % 3 == r) k * 7 + r else v) }
          case 6 => TypedLake.compactTyped(spark, lake, schema, pc,
            targetBytes = 4096)
          case 7 => WeatherLakeV2Sink.checkpointManifests(lake)
          case 8 => TypedLake.reconcileMor(spark, lake, schema, pc)
          case 9 => TypedLake.measureStatsTyped(spark, lake, schema, Seq("k"))
          case 10 => // MERGE-ON-READ update to a key-derived value
            val r = rng.nextInt(3)
            TypedLake.updateTypedMor(spark, lake, schema, pc,
              predicate = df => df("k") % 3 === r,
              assignments = Seq("v" -> (df => df("k") * 9 + r)),
              positionDeletes = flavor())
            model = model.map { case (k, v) =>
              k -> (if (k % 3 == r) k * 9 + r else v) }
          case 11 => // delete-file consolidation (directives only)
            TypedLake.compactMorDeletes(spark, lake, schema)
          case 12 if tagged.size < 2 => // pin a named ref
            tagSeq += 1
            val name = s"t$tagSeq"
            WeatherLakeV2Sink.createTag(lake, name)
            tagged += name -> model
          case 12 => () // tag budget full: no-op round
          case 13 => // drop a random ref (its snapshot stops pinning)
            rng.shuffle(tagged.keys.toSeq).headOption.foreach { name =>
              assert(WeatherLakeV2Sink.dropTag(lake, name))
              tagged -= name
            }
          case 14 if branch.isEmpty => // fork a staging branch
            branchSeq += 1
            val name = s"b$branchSeq"
            WeatherLakeV2Sink.createBranch(lake, name)
            branch = Some((name, model, Map.empty))
          case 14 => () // branch budget full: no-op round
          case 15 => // stage an append (fresh keys) on the live branch
            branch.foreach { case (name, fork, staged) =>
              val rows = freshRows(1 + rng.nextInt(2))
              TypedLake.appendTypedToBranch(spark, lake, name,
                payload(rows), schema, pc, statsFields = Seq("k"))
              branch = Some((name, fork, staged ++ rows))
            }
          case 16 => // fast_forward: succeeds IFF main is still the base
            branch.foreach { case (name, fork, staged) =>
              val base = WeatherLakeV2Sink.readBranchBase(lake, name)
              val ancestral =
                WeatherLakeV2Sink.liveManifests(lake).toSet == base.toSet
              if (ancestral) {
                WeatherLakeV2Sink.fastForward(lake, name)
                model ++= staged // published atomically
              } else {
                if (staged.nonEmpty)
                  intercept[java.util.ConcurrentModificationException](
                    WeatherLakeV2Sink.fastForward(lake, name))
                else assert(WeatherLakeV2Sink.fastForward(lake, name) == 0)
              }
              assert(WeatherLakeV2Sink.dropBranch(lake, name))
              branch = None
            }
          case 17 => // rollback to a RANDOM earlier recorded snapshot:
            // the view must become exactly the model recorded THEN, and
            // every downstream oracle (tags, branch, the change feed's
            // net diff) must survive the wholesale restore
            val (snap, recorded) =
              restorePoints(rng.nextInt(restorePoints.size))
            WeatherLakeV2Sink.rollbackTo(lake, snap)
            model = recorded
        }
        restorePoints += ((WeatherLakeV2Sink.snapshot(lake), model))
        assert(lakeState == model, s"trial $trial op#$i (kind $op) diverged")
        tagged.foreach { case (n, st) =>
          assert(tagState(n) == st,
            s"trial $trial op#$i (kind $op): tag '$n' no longer reads " +
              "its pinned state")
        }
        branch.foreach { case (n, fork, staged) =>
          assert(branchState(n) == fork ++ staged,
            s"trial $trial op#$i (kind $op): branch '$n' no longer " +
              "reads fork-state + staged")
        }
        applyFeed()
        assert(shadow == model,
          s"trial $trial op#$i (kind $op): feed-reconstructed state diverged")
      }
      // end of trial: reconcile + vacuum must change nothing for either
      // oracle (delete files fold away, the view is stable). The feed
      // drains the reconcile commit BEFORE the forced vacuum — the
      // documented horizon contract: vacuum's age guard must exceed
      // consumer lag, and a zero-age forced vacuum ahead of the drain
      // would legitimately (loudly) strand the cursor.
      TypedLake.reconcileMor(spark, lake, schema, pc)
      applyFeed() // a view-preserving commit nets to zero changes
      assert(shadow == model)
      WeatherLakeV2Sink.vacuum(lake, minAgeMs = 0L, force = true)
      assert(lakeState == model)
      applyFeed()
      assert(shadow == model)
      assert(WeatherLakeV2Sink.committedMorDeleteFiles(lake).isEmpty)
      // the harshest retention test: every tag still reads its pinned
      // state after a ZERO-AGE forced vacuum swept the untagged history
      tagged.foreach { case (n, st) =>
        assert(tagState(n) == st,
          s"trial $trial: tag '$n' broken by the zero-age vacuum")
      }
      // and a live branch still reads fork + staged — vacuum × branch
      // retention is the same trap class the tag fixpoint closed
      branch.foreach { case (n, fork, staged) =>
        assert(branchState(n) == fork ++ staged,
          s"trial $trial: branch '$n' broken by the zero-age vacuum")
      }
    }
  }
}
