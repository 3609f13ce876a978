package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.WeatherLakeV2Sink

/** Metadata-layer envelope at commit-log scale: the read path opens
  * EVERY published manifest ([[WeatherLakeV2Sink.liveManifests]] is the
  * root of every read), so a lake taking a commit a minute holds ~half a
  * million manifests a year and pays O(history) driver metadata per
  * operation unless the history is periodically collapsed. This spec
  * drives thousands of commits (hand-written manifests — also a
  * FORMAT.md conformance check: a manifest is one rename-published text
  * file), interleaves the documented maintenance cadence
  * (checkpointManifests + vacuum), and pins the envelope:
  * the metadata layer returns to O(live) after each collapse, rows are
  * conserved throughout, and the read path over the collapsed history is
  * measurably cheaper than over the full one. Cadence policy lives in
  * BASELINE.md ("metadata envelope").
  */
class LakeMetadataScaleSpec extends SparkSpec {

  test("3000 commits: periodic checkpoint+vacuum keep the metadata " +
      "layer O(live); rows conserved; collapsed read path cheaper") {
    val lake = Files.createTempDirectory("lakescale").toString
    val dataDir = java.nio.file.Path.of(lake, "city=a", "ds=2024-01-01",
      "hour=00")
    val mdir = java.nio.file.Path.of(lake, WeatherLakeV2Sink.ManifestDir)
    java.nio.file.Files.createDirectories(dataDir)
    java.nio.file.Files.createDirectories(mdir)
    val total = 3000
    val cadence = 1000
    var i = 0
    def commitOne(): Unit = {
      val f = dataDir.resolve(f"part-load-$i%06d.json")
      java.nio.file.Files.write(f, s"""{"k":$i}""".getBytes("UTF-8"))
      // a commit is ONE text file renamed into place (FORMAT.md):
      // tmp-write + move, exactly what writeManifest does
      val tmp = mdir.resolve(f".manifest-load-$i%06d.tmp")
      java.nio.file.Files.write(tmp,
        s"${WeatherLakeV2Sink.FormatPrefix}${WeatherLakeV2Sink.FormatVersion}\n$f\n"
          .getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, mdir.resolve(f"manifest-load-$i%06d.txt"))
      i += 1
    }
    var worstLive = 0
    while (i < total) {
      (0 until cadence).foreach(_ => commitOne())
      worstLive = math.max(worstLive, WeatherLakeV2Sink.liveManifests(lake).size)
      // the documented cadence: collapse the live set to one manifest,
      // then reclaim the superseded history (age 0 here — no concurrent
      // readers in the spec; production sizes the age guard to reader/
      // stream lag, see vacuum's doc)
      assert(WeatherLakeV2Sink.checkpointManifests(lake) >= cadence)
      WeatherLakeV2Sink.vacuum(lake, minAgeMs = 0L, force = true)
      val live = WeatherLakeV2Sink.liveManifests(lake)
      assert(live.size == 1,
        s"after checkpoint+vacuum the history must be ONE manifest, " +
          s"got ${live.size}")
      assert(WeatherLakeV2Sink.committedFiles(lake).size == i,
        "rows conserved through every collapse")
    }
    // the envelope claim: per-operation metadata cost tracks the LIVE
    // set, not the total commit count. Time the read-path root over the
    // collapsed history (1 manifest) vs a rebuilt full history
    // (`cadence` manifests) — the collapsed form must win clearly (it
    // opens 1 file instead of ~1000; assert a conservative 3x so the
    // spec never flakes on fs cache noise).
    def time[T](body: => T): Long = {
      val t0 = System.nanoTime(); body; System.nanoTime() - t0
    }
    // warm both paths once to exclude class-loading noise
    WeatherLakeV2Sink.committedEntryLines(lake)
    val collapsed = time(WeatherLakeV2Sink.committedEntryLines(lake))
    (0 until cadence).foreach(_ => commitOne())
    WeatherLakeV2Sink.committedEntryLines(lake)
    val full = time(WeatherLakeV2Sink.committedEntryLines(lake))
    assert(collapsed * 3 < full,
      s"collapsed read path ($collapsed ns over 1 manifest) must be " +
        s"clearly cheaper than the uncollapsed one ($full ns over " +
        s"~$cadence manifests)")
    // and the data itself is intact end to end: one distributed read
    // (Spark bin-packs the small files) sees every committed row once
    val n = WeatherLakeV2Sink.readCommitted(spark, lake)
      .select(get_json_object(col("value"), "$.k").cast("long"))
      .distinct().count()
    assert(n == total + cadence, s"expected ${total + cadence} rows, got $n")
  }
}
