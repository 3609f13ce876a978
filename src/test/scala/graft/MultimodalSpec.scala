package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  private def media = {
    val s = spark
    import s.implicits._
    Seq(
      MediaRow(1L, "image", Array.tabulate(64)(i => (i * 7 % 251).toByte)),
      MediaRow(2L, "audio", Array.tabulate(200)(i => (i * 13 % 251).toByte)),
      MediaRow(3L, "image", Array.emptyByteArray))
      .toDS()
  }

  test("decodeMeta is deterministic and total (empty payloads included)") {
    val metas = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(metas(1L).n_bytes == 64L)
    assert(metas(1L).width == 16 + 0 && metas(1L).height == 16 + 7)
    assert(metas(3L).n_bytes == 0L && metas(3L).width == 16)
    // deterministic across evaluations
    val again = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(metas == again)
  }

  test("extractFeatures yields fixed-width vectors with stable checksums") {
    val fs = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f).toMap
    assert(fs.values.forall(_.features.length == 8))
    assert(fs(3L).checksum == 0L)
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(fs.view.mapValues(_.checksum).toMap == again)
  }

  test("sampleFrames fans out bounded frame rows per payload") {
    val frames = Multimodal.sampleFrames(media, frameLen = 10, stride = 2).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length == 3)  // offsets 0, 20, 40 (54 would exceed 64-10? no: (64-10)/20+1 = 3)
    assert(byId(2L).length == 10) // (200-10)/20 + 1
    assert(!byId.contains(3L))
    assert(frames.forall(_.frame_bytes.length <= 10))
  }

  test("sampleFrames keeps a full trailing frame inside a partial stride window") {
    val s = spark
    import s.implicits._
    val m = Seq(MediaRow(9L, "video", Array.tabulate(30)(_.toByte))).toDS()
    // offsets 0 and 20 both hold full 10-byte frames; naive len/(10*2)
    // would emit only one
    val frames = Multimodal.sampleFrames(m, frameLen = 10, stride = 2).collect()
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1))
    assert(frames.forall(_.frame_bytes.length == 10))
  }

  test("binaryFeatures matches plain-text md5/length semantics") {
    val df = Multimodal.binaryFeatures(
      media.toDF().withColumnRenamed("bytes", "payload"), "media_id", "payload")
    val row = df.filter(col("media_id") === 1L).head()
    assert(row.getAs[Long]("n_bytes") == 64L)
    assert(row.getAs[String]("digest_md5").length == 32)
  }

  test("headerFields: le_uint parses little-endian fields off REAL binary " +
    "(high bytes, truncation, a RIFF-style magic)") {
    val s = spark
    import s.implicits._
    // payload 1: a WAV-ish head — 'RIFF' magic, then a LE size field with
    // high (sign-bit-set) bytes that would corrupt under naive signed reads
    val riff = Array[Byte]('R', 'I', 'F', 'F', 0xE8.toByte, 0x80.toByte, 0xFF.toByte)
    val rows = Seq(
      (1L, riff),
      (2L, Array[Byte](0x01, 0x02)), // truncated: fields zero-extend
      (3L, Array.empty[Byte])).toDF("media_id", "payload")
    val out = Multimodal.headerFields(rows, "media_id", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // 'RIFF' little-endian = 0x46464952
    assert(out(1L) === ((7L, 0x46464952L, 0x80E8L, 0xFFL)))
    assert(out(2L) === ((2L, 0x0201L, 0L, 0L)))
    assert(out(3L) === ((0L, 0L, 0L, 0L)))
    // reference compute agrees with the expression on every byte pattern
    assert(graft.functions.LeUInt.compute(riff, 0, 4) == 0x46464952L)
    assert(graft.functions.LeUInt.compute(riff, 4, 2) == 0x80E8L)
    assert(graft.functions.LeUInt.compute(riff, -2, 4) == ('R'.toLong << 16) + ('I'.toLong << 24))
  }

  test("shard export: rolls at shardBytes, roundtrips exactly, accounts " +
      "every record in the manifest") {
    import graft.multimodal.Multimodal
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val media = (0L until 100L)
      .map(i => Multimodal.MediaRow(i, "image",
        Array.fill((i % 7 + 1).toInt * 10)(i.toByte)))
    val ds = media.toDS().repartition(4)
    val target = 256L
    val manifest = Multimodal.writeShards(ds, dir, shardBytes = target)
    assert(manifest.map(_.records).sum == 100L)
    assert(manifest.size > 4, "a 256-byte target over ~5 KB must roll")
    manifest.foreach { sh =>
      assert(new java.io.File(sh.path).length() == sh.bytes,
        "manifest byte count must match the file")
      assert(sh.bytes <= target || sh.records == 1,
        s"over-target shard ${sh.path} must hold exactly one oversized record")
    }
    val back = Multimodal.readShards(spark, dir).collect()
      .map(r => r.media_id -> r.bytes.toSeq).toMap
    assert(back == media.map(m => m.media_id -> m.bytes.toSeq).toMap,
      "roundtrip must reproduce every payload byte-exactly")
    // the manifest-scoped reader sees exactly the same committed set
    val viaManifest = Multimodal.readShardManifest(spark, manifest).collect()
      .map(r => r.media_id -> r.bytes.toSeq).toMap
    assert(viaManifest == back)
    // no in-progress residue survives a successful write
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".inprogress-")),
      "completed tasks must rename every in-progress shard away")
  }

  test("shard export: runs sharing a directory never collide on a " +
      "published name; each manifest scopes to its own run") {
    import graft.multimodal.Multimodal
    val s = spark
    import s.implicits._
    // (partitionId, taskAttemptId) restart at 0 in a new application, so
    // names must carry a per-job token; two same-shaped writes into one
    // directory are the in-process proxy for that cross-application case
    val dir = java.nio.file.Files.createTempDirectory("shards_two").toString
    def rows(tag: Long) = (0L until 10L)
      .map(i => Multimodal.MediaRow(tag * 100 + i, "image",
        Array.fill(20)((tag + i).toByte))).toDS().coalesce(1)
    val m1 = Multimodal.writeShards(rows(1), dir, shardBytes = 1024L)
    val m2 = Multimodal.writeShards(rows(2), dir, shardBytes = 1024L)
    assert(m1.map(_.path).toSet.intersect(m2.map(_.path).toSet).isEmpty,
      "two runs over one directory must publish disjoint shard names")
    // each manifest reads back exactly its own run's records
    assert(Multimodal.readShardManifest(spark, m1).collect()
      .map(_.media_id).toSet == (100L until 110L).toSet)
    assert(Multimodal.readShardManifest(spark, m2).collect()
      .map(_.media_id).toSet == (200L until 210L).toSet)
    // the glob reader sees the union
    assert(Multimodal.readShards(spark, dir).count() == 20L)
  }

  test("shard export: an oversized record lands alone; a truncated shard " +
      "fails loudly") {
    import graft.multimodal.Multimodal
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards_big").toString
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", Array.fill(500)(1.toByte)), // > target
      Multimodal.MediaRow(2L, "image", Array.fill(10)(2.toByte)))
    val manifest = Multimodal.writeShards(rows.toDS().coalesce(1), dir,
      shardBytes = 64L)
    assert(manifest.exists(sh => sh.records == 1 && sh.bytes > 64L),
      "the oversized record must still be written, alone in its shard")
    assert(Multimodal.readShards(spark, dir).count() == 2)
    // corrupt tail → the reader throws, never returns a silent prefix
    val bad = new java.io.FileOutputStream(s"$dir/shard-bad-00000.bin")
    bad.write(Array[Byte](1, 2, 3)); bad.close()
    val e = intercept[Exception] {
      Multimodal.readShards(spark, dir).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("truncated shard")),
      s"expected a loud truncated-shard failure, got $e")
  }
}
