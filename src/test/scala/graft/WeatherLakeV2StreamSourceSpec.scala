package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The lake as a streaming SOURCE (WeatherLakeV2StreamSource): manifests
  * are the unit of progress, restarts resume from the checkpoint,
  * layout-only maintenance contributes nothing to caught-up streams
  * (replays at-least-once for partially-caught-up ones) and reads-once
  * for fresh streams.
  */
class WeatherLakeV2StreamSourceSpec extends SparkSpec {

  private def sink(lake: String, tag: String, n: Int): Unit = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => ("a", "2024-01-01", "00", s"""{"t":"$tag$i"}"""))
      .toDF("city", "ds", "hour", "raw_json")
      .coalesce(1)
      .write.format("graft.sources.WeatherLakeV2Sink")
      .mode("append").save(lake)
  }

  // memory sink refuses checkpoint recovery; foreachBatch is the
  // checkpoint-recoverable sink, collecting into a per-run buffer
  private val collected =
    scala.collection.concurrent.TrieMap.empty[String, Vector[String]]

  private def drain(lake: String, ckpt: String, table: String): Unit = {
    collected(table) = Vector.empty
    val q = spark.readStream
      .format("graft.sources.WeatherLakeV2StreamSource")
      .load(lake)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val vals = batch.collect().map(_.getString(0)).toVector
        collected.updateWith(table)(prev => Some(prev.getOrElse(Vector.empty) ++ vals))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def rows(table: String): Seq[String] =
    collected.getOrElse(table, Vector.empty).sorted

  test("streams committed manifests, resumes from the checkpoint, and " +
      "never sees half a write job") {
    val base = Files.createTempDirectory("lakestream").toString
    val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    sink(lake, "x", 3)
    drain(lake, ckpt, "lake_stream_t1")
    assert(rows("lake_stream_t1") ==
      Seq("""{"t":"x0"}""", """{"t":"x1"}""", """{"t":"x2"}"""))
    // an orphan file with no manifest must be invisible to the stream
    java.nio.file.Files.writeString(
      new java.io.File(s"$lake/city=a/ds=2024-01-01/hour=00/orphan.json").toPath,
      "{\"t\":\"orphan\"}\n")
    // restart with the same checkpoint: only NEW manifests arrive
    sink(lake, "y", 2)
    drain(lake, ckpt, "lake_stream_t2")
    assert(rows("lake_stream_t2") == Seq("""{"t":"y0"}""", """{"t":"y1"}"""),
      "a resumed stream must deliver exactly the new commits")
    // nothing new → an AvailableNow run delivers nothing
    drain(lake, ckpt, "lake_stream_t3")
    assert(rows("lake_stream_t3").isEmpty)
  }

  test("layout-only commits contribute NOTHING to a caught-up stream " +
      "(exactly-once across compact/checkpoint/measure), replay for a " +
      "partially-caught-up one, and read once for a fresh stream") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("lakestreamc").toString
    val lake = s"$base/lake"
    sink(lake, "a", 2); sink(lake, "b", 2) // same dir → compaction candidate
    val ckpt1 = s"$base/ckpt1"
    drain(lake, ckpt1, "lake_streamc_t1")
    assert(rows("lake_streamc_t1").size == 4)
    assert(WeatherLakeV2Sink.compact(spark, lake) == 1)
    // caught-up stream: every manifest the compaction superseded is in
    // the consumed set, so the re-listed rows are exactly the delivered
    // ones — the commit is consumed but contributes no rows
    drain(lake, ckpt1, "lake_streamc_t2")
    assert(rows("lake_streamc_t2").isEmpty,
      "a caught-up stream must not replay a layout-only re-list")
    // same for a stats backfill and a metadata checkpoint
    sink(lake, "c", 1)
    drain(lake, ckpt1, "lake_streamc_t2b")
    assert(rows("lake_streamc_t2b").size == 1)
    WeatherLakeV2Sink.measureStats(spark, lake, Seq("t"))
    WeatherLakeV2Sink.checkpointManifests(lake)
    drain(lake, ckpt1, "lake_streamc_t2c")
    assert(rows("lake_streamc_t2c").isEmpty,
      "measure/checkpoint re-lists must not replay for a caught-up stream")
    // fresh stream over the maintained lake: superseded manifests never
    // enter an offset; the surviving re-list IS its one copy of the data
    drain(lake, s"$base/ckpt2", "lake_streamc_t3")
    assert(rows("lake_streamc_t3").size == 5)
    // PARTIALLY caught-up: a stream that consumed only the first append
    // gets the full re-list (at-least-once — the keyed-consumer fallback)
    val lake2 = s"$base/lake2"
    sink(lake2, "a", 2)
    val ckpt3 = s"$base/ckpt3"
    drain(lake2, ckpt3, "lake_streamc_t4")
    assert(rows("lake_streamc_t4").size == 2)
    sink(lake2, "b", 2)
    assert(WeatherLakeV2Sink.compact(spark, lake2) == 1)
    drain(lake2, ckpt3, "lake_streamc_t5")
    assert(rows("lake_streamc_t5").size == 4,
      "a partially-caught-up stream receives the full re-list")
  }

  test("readChangeFeed: the lake streams row-level deltas — appends as " +
      "inserts, logged maintenance as classified changes, layout-only " +
      "commits as nothing; un-logged maintenance fails loudly") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("lakecdcstream").toString
    val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    val s = spark
    import s.implicits._
    def payload(rows: Seq[(String, Long, Long)]): DataFrame =
      rows.toDF("city", "k", "v").select(col("city"),
        lit("2024-01-01").as("ds"), lit("00").as("hour"),
        to_json(struct(col("k"), col("v"))).as("raw_json"))
    val keyFn = (f: DataFrame) => get_json_object(f("raw_json"), "$.k")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def drain(): Set[(String, Long, Long)] = {
      val before = buf.size
      val q = spark.readStream
        .format("graft.sources.WeatherLakeV2StreamSource")
        .option("readChangeFeed", "true")
        .load(lake)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select(col("change"),
              get_json_object(col("value"), "$.k").cast("long"),
              get_json_object(col("value"), "$.v").cast("long"))
            .collect().foreach(r => buf.synchronized {
              buf += ((r.getString(0), r.getLong(1), r.getLong(2))) })
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      buf.synchronized(buf.drop(before).toSet)
    }
    payload(Seq(("a", 1L, 10L), ("a", 2L, 20L)))
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    assert(drain() == Set(("insert", 1L, 10L), ("insert", 2L, 20L)))
    // logged merge: classified changes flow, survivor rewrites don't
    WeatherLakeV2Sink.mergeCommitted(spark, lake,
      payload(Seq(("a", 2L, 999L), ("c", 9L, 90L))), keyFn, changeLog = true)
    assert(drain() == Set(("update_preimage", 2L, 20L),
      ("update_postimage", 2L, 999L), ("insert", 9L, 90L)))
    // a compaction is layout-only: the stream sees NOTHING
    payload(Seq(("a", 4L, 40L)))
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    assert(WeatherLakeV2Sink.compact(spark, lake) >= 1)
    assert(drain() == Set(("insert", 4L, 40L)),
      "compaction must contribute no change rows")
    // logged delete flows
    WeatherLakeV2Sink.deleteCommitted(spark, lake,
      f => get_json_object(f("raw_json"), "$.k").cast("long") === 1,
      changeLog = true)
    assert(drain() == Set(("delete", 1L, 10L)))
    // an UN-logged row-level commit cannot be streamed — loud failure,
    // not phantom re-inserts of re-listed survivors
    WeatherLakeV2Sink.updateCommitted(spark, lake,
      predicate = f => get_json_object(f("raw_json"), "$.k").cast("long") === 2,
      transform = f => to_json(struct(
        get_json_object(f("raw_json"), "$.k").cast("long").as("k"),
        lit(0L).as("v"))))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(
        _.contains("without a change log"))), e.toString)
    // and the batch face requires an explicit version range for CDF
    // (the table_changes contract — see the batch-CDF spec below)
    intercept[Exception] {
      spark.read.format("graft.sources.WeatherLakeV2StreamSource")
        .option("readChangeFeed", "true").load(lake).collect()
    }
  }

  test("batch change feed (the table_changes role): an INCLUSIVE " +
      "version range over the commit history returns classified " +
      "changes through plain SQL view options; incoherent ranges and " +
      "missing startingVersion fail loudly") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("lakecdcbatch").toString
    val lake = s"$base/lake"
    val s = spark
    import s.implicits._
    def payload(rows: Seq[(String, Long, Long)]): DataFrame =
      rows.toDF("city", "k", "v").select(col("city"),
        lit("2024-01-01").as("ds"), lit("00").as("hour"),
        to_json(struct(col("k"), col("v"))).as("raw_json"))
    val keyFn = (f: DataFrame) => get_json_object(f("raw_json"), "$.k")
    // v0: append k=1,2; v1: merge updating k=2 + inserting k=9
    // (logged); v2: a second append (makes the dir multi-file so the
    // compact has real work); v3: compact (layout-only)
    payload(Seq(("a", 1L, 10L), ("a", 2L, 20L))).coalesce(1)
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    WeatherLakeV2Sink.mergeCommitted(spark, lake,
      payload(Seq(("a", 2L, 999L), ("a", 9L, 90L))), keyFn, changeLog = true)
    payload(Seq(("a", 4L, 40L))).coalesce(1)
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    assert(WeatherLakeV2Sink.compact(spark, lake) >= 1)
    def changes(opts: Map[String, String]): Set[(String, Long, Long)] = {
      var r = spark.read.format("graft.sources.WeatherLakeV2StreamSource")
        .option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(lake)
        .select(col("change"),
          get_json_object(col("value"), "$.k").cast("long"),
          get_json_object(col("value"), "$.v").cast("long"))
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    }
    // full history
    assert(changes(Map("startingVersion" -> "0")) == Set(
      ("insert", 1L, 10L), ("insert", 2L, 20L),
      ("update_preimage", 2L, 20L), ("update_postimage", 2L, 999L),
      ("insert", 9L, 90L), ("insert", 4L, 40L)))
    // only the merge commit
    assert(changes(Map("startingVersion" -> "1", "endingVersion" -> "1")) ==
      Set(("update_preimage", 2L, 20L), ("update_postimage", 2L, 999L),
        ("insert", 9L, 90L)))
    // the layout-only compact contributes nothing
    assert(changes(Map("startingVersion" -> "3")) == Set.empty)
    // plain SQL reaches the same rows through view options
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_changes
      USING graft.sources.WeatherLakeV2StreamSource
      OPTIONS (path '$lake', readChangeFeed 'true', startingVersion '1',
        endingVersion '1')""")
    assert(spark.sql(
        "SELECT count(*) FROM lake_changes WHERE change = 'insert'")
      .head().getLong(0) == 1L)
    // loud failures: missing start, out-of-range, inverted
    val e1 = intercept[IllegalArgumentException] {
      changes(Map.empty)
    }
    assert(e1.getMessage.contains("startingVersion"))
    intercept[IllegalArgumentException] {
      changes(Map("startingVersion" -> "0", "endingVersion" -> "99"))
    }
    intercept[IllegalArgumentException] {
      changes(Map("startingVersion" -> "2", "endingVersion" -> "1"))
    }
    intercept[IllegalArgumentException] {
      changes(Map("startingVersion" -> "x"))
    }
  }

  test("change-feed routing follows the #op directive, not the manifest " +
      "name; legacy prefix-named manifests still route by convention") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("lakecdcop").toString
    val lake = s"$base/lake"
    val s = spark
    import s.implicits._
    Seq(("a", "2024-01-01", "00", """{"k":1}"""))
      .toDF("city", "ds", "hour", "raw_json")
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    // a LEGACY layout-only manifest (no #op, compaction-named): re-lists
    // the same file — contributes nothing to the feed, by name fallback
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val mdir = s"$lake/${WeatherLakeV2Sink.ManifestDir}"
    val dataLines = WeatherLakeV2Sink.committedEntryLines(lake)
    val appendName = WeatherLakeV2Sink.liveManifests(lake).head
    java.nio.file.Files.write(
      java.nio.file.Path.of(mdir, "manifest-compact-legacy.txt"),
      (s"#supersedes $appendName" +: dataLines).mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    val batch = spark.read.format("graft.sources.WeatherLakeV2StreamSource")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(lake)
    // v0 insert flows; the legacy compact (v1) contributes nothing
    assert(batch.select(col("change")).collect().map(_.getString(0)).toSeq ==
      Seq("insert"))
    // a modern maintenance commit carries #op — rename it to an
    // APPEND-looking name: routing must STILL treat it as layout-only
    // (the directive is authoritative)
    WeatherLakeV2Sink.mergeCommitted(spark, lake,
      Seq(("a", "2024-01-01", "00", """{"k":1,"touched":true}"""))
        .toDF("city", "ds", "hour", "raw_json"),
      f => get_json_object(f("raw_json"), "$.k"), changeLog = true)
    val mergeName = WeatherLakeV2Sink.liveManifests(lake)
      .find(_.startsWith("manifest-merge-")).get
    assert(fs.rename(new org.apache.hadoop.fs.Path(mdir, mergeName),
      new org.apache.hadoop.fs.Path(mdir, "manifest-plainlooking.txt")))
    val all = spark.read.format("graft.sources.WeatherLakeV2StreamSource")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(lake)
      .select(col("change")).collect().map(_.getString(0)).toSeq.sorted
    // the renamed merge still ships its classified changes (one
    // update pre+post pair), NOT phantom inserts of re-listed survivors
    assert(all == Seq("insert", "update_postimage", "update_preimage"),
      all.toString)
  }

  test("scan pruning options (prunePartition, pruneField+range) skip " +
      "files on the driver for streaming AND batch-CDF reads, with row " +
      "parity against the unpruned scan; malformed options fail loudly") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("lakeprune").toString
    val lake = s"$base/lake"
    val s = spark
    import s.implicits._
    def sink(city: String, vs: Seq[Long]): Unit =
      vs.map(v => (city, v)).toDF("city", "v").select(col("city"),
          lit("2024-01-01").as("ds"), lit("00").as("hour"),
          to_json(struct(col("city"), col("v"))).as("raw_json"))
        .coalesce(1)
        .write.format("graft.sources.WeatherLakeV2Sink")
        .option("statsFields", "v")
        .mode("append").save(lake)
    sink("a", Seq(1L, 2L, 3L))
    sink("b", Seq(100L, 101L))
    def drainWith(opts: Map[String, String], tag: String): Seq[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var r = spark.readStream.format("graft.sources.WeatherLakeV2StreamSource")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load(lake).writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(x => buf.synchronized { buf += x.getString(0) })
          ()
        }
        .option("checkpointLocation", s"$base/ckpt-$tag")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      buf.synchronized(buf.toSeq.sorted)
    }
    val all = drainWith(Map.empty, "all")
    assert(all.size == 5)
    // partition pruning: only city=a's file is opened — and parity holds
    // (the pruned stream equals the unpruned one filtered the same way)
    val aOnly = drainWith(Map("prunePartition" -> "city=a"), "pa")
    assert(aOnly == all.filter(_.contains("\"city\":\"a\"")), aOnly)
    assert(aOnly.size == 3)
    // stats pruning: only the file whose v-range overlaps [50, inf)
    val big = drainWith(Map("pruneField" -> "v", "pruneMin" -> "50"), "pv")
    assert(big.size == 2 && big.forall(_.contains("10")), big)
    // batch CDF prunes the same way — a logged delete's change file
    // carries stats, so a disjoint range skips it at file level
    WeatherLakeV2Sink.deleteCommitted(spark, lake,
      f => get_json_object(f("raw_json"), "$.v").cast("long") === 100L,
      changeLog = true, statsFields = Seq("v"))
    def cdf(opts: Map[String, String]): Seq[(String, String)] = {
      var r = spark.read.format("graft.sources.WeatherLakeV2StreamSource")
        .option("readChangeFeed", "true").option("startingVersion", "0")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(lake).select(col("change"), col("value"))
        .collect().map(x => (x.getString(0), x.getString(1))).toSeq.sorted
    }
    val full = cdf(Map.empty)
    assert(full.count(_._1 == "delete") == 1, full)
    // range overlapping the deleted value keeps the change file …
    assert(cdf(Map("pruneField" -> "v", "pruneMin" -> "99"))
      .count(_._1 == "delete") == 1)
    // … a disjoint range skips it (and the city=b insert file too);
    // city=a's insert file [1..3] survives
    val low = cdf(Map("pruneField" -> "v", "pruneMax" -> "50"))
    assert(low.count(_._1 == "delete") == 0, low)
    assert(low.count(_._1 == "insert") == 3, low)
    // malformed options are loud (surface through the stream thread)
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    Seq(Map("pruneMin" -> "5") -> "pruneField",
        Map("pruneField" -> "v") -> "pruneMin",
        Map("prunePartition" -> "nonsense") -> "k=v").foreach {
      case (opts, needle) =>
        val e = intercept[Exception] {
          drainWith(opts, s"bad-${opts.keys.mkString}")
        }
        assert(chain(e).exists(t => Option(t.getMessage).exists(
          _.contains(needle))), s"$opts: $e")
    }
  }

  test("fresh earliest change feed over a vacuumed history fails " +
      "loudly instead of a silent empty bootstrap") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("lakecdcvac").toString
    val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    val s = spark
    import s.implicits._
    Seq(("a", "2024-01-01", "00", """{"k":1}"""),
        ("a", "2024-01-01", "00", """{"k":2}"""))
      .toDF("city", "ds", "hour", "raw_json").coalesce(1)
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    Seq(("a", "2024-01-01", "00", """{"k":3}"""))
      .toDF("city", "ds", "hour", "raw_json").coalesce(1)
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    // checkpoint the metadata, then vacuum the superseded commits away:
    // the surviving checkpoint manifest is layout-only — a fresh feed
    // could reconstruct NOTHING of the non-empty table
    assert(WeatherLakeV2Sink.checkpointManifests(lake) == 2)
    WeatherLakeV2Sink.vacuum(lake, minAgeMs = 0L, force = true)
    assert(WeatherLakeV2Sink.readCommitted(spark, lake).count() == 3)
    val q = spark.readStream
      .format("graft.sources.WeatherLakeV2StreamSource")
      .option("readChangeFeed", "true")
      .load(lake)
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) => () }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(t => Option(t.getMessage).exists(
      _.contains("predates the vacuum horizon"))), e.toString)
    // startingAt = latest is the documented escape hatch: it bootstraps
    // an EMPTY feed (future commits only) without touching the history
    val q2 = spark.readStream
      .format("graft.sources.WeatherLakeV2StreamSource")
      .option("readChangeFeed", "true").option("startingAt", "latest")
      .load(lake)
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) => () }
      .option("checkpointLocation", s"$base/ckpt2")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination() // terminates cleanly: nothing to replay
  }

  test("capped change-feed drain: maxManifestsPerTrigger admits commits " +
      "in COMMIT order and still delivers every delta") {
    val base = Files.createTempDirectory("lakecdccap").toString
    val lake = s"$base/lake"
    (0 until 3).foreach { i =>
      sink(lake, s"o$i-", 1)
      Thread.sleep(5) // distinct publish mtimes -> deterministic order
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
    val q = spark.readStream
      .format("graft.sources.WeatherLakeV2StreamSource")
      .option("readChangeFeed", "true")
      .option("maxManifestsPerTrigger", "1")
      .load(lake)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val vals = b.select(get_json_object(col("value"), "$.t"))
          .collect().map(_.getString(0)).toVector
        if (vals.nonEmpty) batches.synchronized { batches += vals.sorted }
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(batches.toList == List(
      Vector("o0-0"), Vector("o1-0"), Vector("o2-0")),
      s"capped CDC drain must admit one commit per batch in commit " +
        s"order: $batches")
  }

  test("startingAt = latest: history is skipped at first start, only " +
      "future commits flow; invalid values fail fast") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("lakestartlatest").toString
    val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    val s = spark
    import s.implicits._
    sink(lake, "old", 2) // history that must NOT replay
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def drain(): Set[(String, Long)] = {
      val before = buf.size
      val q = spark.readStream
        .format("graft.sources.WeatherLakeV2StreamSource")
        .option("readChangeFeed", "true")
        .option("startingAt", "latest")
        .load(lake)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select(col("change"),
              get_json_object(col("value"), "$.k").cast("long"))
            .collect().foreach(r => buf.synchronized {
              buf += ((r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))) })
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      buf.synchronized(buf.drop(before).toSet)
    }
    assert(drain() == Set.empty, "pre-start history must not replay")
    // a post-start commit flows (delete with a change log)
    Seq(("a", "2024-01-01", "00", """{"k":7,"v":70}"""))
      .toDF("city", "ds", "hour", "raw_json")
      .write.format("graft.sources.WeatherLakeV2Sink").mode("append").save(lake)
    WeatherLakeV2Sink.deleteCommitted(spark, lake,
      f => get_json_object(f("raw_json"), "$.k").cast("long") === 7,
      changeLog = true)
    assert(drain() == Set(("insert", 7L), ("delete", 7L)))
    intercept[Exception] {
      spark.readStream.format("graft.sources.WeatherLakeV2StreamSource")
        .option("startingAt", "yesterday").load(lake)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ckpt-bad")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
  }

  test("lake-to-lake streaming pipeline (bronze -> silver): incremental " +
      "flow on one checkpoint, exactly-once across a full pipeline replay") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("lakemedallion").toString
    val bronze = s"$base/bronze"; val silver = s"$base/silver"
    sink(bronze, "m", 3) // {"t":"m0".."m2"}
    // the pipeline: stream the bronze committed view, drop one row
    // (curation), re-key for the silver layout, publish with per-epoch
    // manifests — source offsets AND sink manifests both checkpoint-stable
    def run(ckpt: String): Unit = {
      val q = spark.readStream
        .format("graft.sources.WeatherLakeV2StreamSource")
        .load(bronze)
        .filter(get_json_object(col("value"), "$.t") =!= "m1")
        .select(lit("s").as("city"), lit("2024-01-01").as("ds"),
          lit("00").as("hour"), col("value").as("raw_json"))
        .writeStream
        .format("graft.sources.WeatherLakeV2Sink")
        .option("checkpointLocation", ckpt)
        .option("manifestId", "b2s")
        .trigger(Trigger.AvailableNow())
        .start(silver)
      q.awaitTermination()
    }
    def silverRows: Seq[String] = WeatherLakeV2Sink
      .readCommitted(spark, silver)
      .select(get_json_object(col("value"), "$.t"))
      .collect().map(_.getString(0)).toSeq.sorted
    run(s"$base/ckpt")
    assert(silverRows == Seq("m0", "m2"))
    assert(WeatherLakeV2Sink.manifestExists(silver, "b2s-0"))
    // incremental: new bronze commit flows through the SAME checkpoint
    // as epoch 1 — silver never re-ingests what it already published
    sink(bronze, "n", 1)
    run(s"$base/ckpt")
    assert(silverRows == Seq("m0", "m2", "n0"))
    assert(WeatherLakeV2Sink.manifestExists(silver, "b2s-1"))
    // full pipeline REPLAY (lost checkpoint, same manifestId): the fresh
    // run re-reads all of bronze as epoch 0, but silver's b2s-0 manifest
    // already exists — publication short-circuits end-to-end, rows do
    // not double, and the replay's files are sweepable orphans
    run(s"$base/ckpt-replay")
    assert(silverRows == Seq("m0", "m2", "n0"),
      "a replayed pipeline must not double-publish silver rows")
    Thread.sleep(10)
    assert(WeatherLakeV2Sink.sweepOrphans(silver, minAgeMs = 1) >= 1)
    assert(silverRows == Seq("m0", "m2", "n0"))
  }

  test("batch read face: spark.read over the same format returns the " +
      "committed view (readCommitted parity), and SQL works over a " +
      "CREATE TEMPORARY VIEW ... USING") {
    val base = Files.createTempDirectory("lakebatchread").toString
    val lake = s"$base/lake"
    sink(lake, "b", 3)
    // an orphan file with no manifest must stay invisible to the batch
    // face exactly as to readCommitted
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$lake/city=a/ds=2024-01-01/hour=00/orphan.json"),
      "{\"t\":\"orphan\"}\n")
    val viaConnector = spark.read
      .format("graft.sources.WeatherLakeV2StreamSource")
      .load(lake).collect().map(_.getString(0)).sorted
    val viaFunction = graft.sources.WeatherLakeV2Sink
      .readCommitted(spark, lake).collect().map(_.getString(0)).sorted
    assert(viaConnector.sameElements(viaFunction) && viaConnector.length == 3,
      s"connector batch read must equal readCommitted: ${viaConnector.toSeq}")
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_batch_view
      USING graft.sources.WeatherLakeV2StreamSource
      OPTIONS (path '$lake')""")
    val viaSql = spark.sql(
      "SELECT get_json_object(value, '$.t') AS t FROM lake_batch_view ORDER BY t")
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == Seq("b0", "b1", "b2"), viaSql.toString)
  }

  test("time travel through the batch face: snapshotVersion and " +
      "asOfManifests read options put table history behind plain SQL") {
    import graft.sources.WeatherLakeV2Sink
    val base = Files.createTempDirectory("laketimetravel").toString
    val lake = s"$base/lake"
    sink(lake, "v0-", 1)        // version 0
    val v0 = WeatherLakeV2Sink.snapshot(lake)
    sink(lake, "v1-", 1)        // version 1
    def ts(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .select(get_json_object(col("value"), "$.t"))
      .collect().map(_.getString(0)).toSeq.sorted
    // current view has both commits
    assert(ts(spark.read.format("graft.sources.WeatherLakeV2StreamSource")
      .load(lake)) == Seq("v0-0", "v1-0"))
    // pinned to version 0 of the history
    assert(ts(spark.read.format("graft.sources.WeatherLakeV2StreamSource")
      .option("snapshotVersion", "0").load(lake)) == Seq("v0-0"))
    // pinned to an explicitly captured manifest set
    assert(ts(spark.read.format("graft.sources.WeatherLakeV2StreamSource")
      .option("asOfManifests", v0.mkString(",")).load(lake)) == Seq("v0-0"))
    // time travel in PLAIN SQL via a view with options
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW lake_v0
      USING graft.sources.WeatherLakeV2StreamSource
      OPTIONS (path '$lake', snapshotVersion '0')""")
    assert(spark.sql("SELECT count(*) FROM lake_v0").head().getLong(0) == 1L)
    // bad inputs fail loudly
    intercept[Exception] {
      spark.read.format("graft.sources.WeatherLakeV2StreamSource")
        .option("snapshotVersion", "99").load(lake).collect()
    }
    intercept[Exception] {
      spark.read.format("graft.sources.WeatherLakeV2StreamSource")
        .option("snapshotVersion", "0")
        .option("asOfManifests", v0.mkString(","))
        .load(lake).collect()
    }
  }

  test("maxManifestsPerTrigger drains an AvailableNow run in capped " +
      "batches and still delivers every row") {
    val base = Files.createTempDirectory("lakestreamcap").toString
    val lake = s"$base/lake"
    (0 until 3).foreach(i => sink(lake, s"c$i-", 2)) // 3 manifests, 6 rows
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    collected("lake_stream_cap") = Vector.empty
    val q = spark.readStream
      .format("graft.sources.WeatherLakeV2StreamSource")
      .option("maxManifestsPerTrigger", "1")
      .load(lake)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val vals = batch.collect().map(_.getString(0)).toVector
        if (vals.nonEmpty) batches.incrementAndGet()
        collected.updateWith("lake_stream_cap")(prev =>
          Some(prev.getOrElse(Vector.empty) ++ vals))
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(rows("lake_stream_cap").size == 6,
      "a capped drain must still deliver every committed row")
    assert(batches.get() == 3,
      s"3 manifests at cap 1 must drain in 3 batches, saw ${batches.get()}")
  }

  test("AvailableNow snapshots the live set at query start: commits " +
      "landing after prepare wait for the next run") {
    val base = Files.createTempDirectory("lakestreamsnap").toString
    val lake = s"$base/lake"
    sink(lake, "pre", 1)
    val stream = new graft.sources.WeatherLakeV2StreamSource.LakeMicroBatchStream(lake)
    stream.prepareForTriggerAvailableNow()
    sink(lake, "post", 1) // lands after the snapshot
    val end = stream.latestOffset(stream.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    val parts = stream.planInputPartitions(stream.initialOffset(), end)
    assert(parts.length == 1,
      "the drain target must be the set snapshotted at prepare, " +
        s"not the current live set: ${parts.mkString(",")}")
  }

  test("non-positive or non-numeric maxManifestsPerTrigger fails fast") {
    val base = Files.createTempDirectory("lakestreambad").toString
    val lake = s"$base/lake"
    sink(lake, "v", 1)
    Seq("0", "-2", "many").foreach { bad =>
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        val q = spark.readStream
          .format("graft.sources.WeatherLakeV2StreamSource")
          .option("maxManifestsPerTrigger", bad)
          .load(lake)
          .writeStream.format("noop")
          .option("checkpointLocation", s"$base/ckpt-$bad")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      assert(e.getCause.getMessage.contains("maxManifestsPerTrigger"),
        s"'$bad' must be rejected with the option named: ${e.getCause}")
    }
  }

  test("missing path option fails fast; vacuum outpacing the reader " +
      "fails loudly at planning") {
    intercept[IllegalArgumentException] {
      new graft.sources.WeatherLakeV2StreamSource()
        .getTable(graft.sources.WeatherLakeV2StreamSource.Schema,
          Array.empty, new java.util.HashMap[String, String]())
    }
    // planInputPartitions over a manifest that vanished mid-plan
    val base = Files.createTempDirectory("lakestreamv").toString
    val lake = s"$base/lake"
    sink(lake, "z", 1)
    val stream = new graft.sources.WeatherLakeV2StreamSource.LakeMicroBatchStream(lake)
    val start = stream.initialOffset()
    val end = stream.latestOffset()
    val mdir = new java.io.File(s"$lake/${graft.sources.WeatherLakeV2Sink.ManifestDir}")
    mdir.listFiles().filter(_.getName.startsWith("manifest-")).foreach(_.delete())
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(start, end)
    }
    assert(e.getMessage.contains("vacuum outpaced"), e.getMessage)
  }
}
