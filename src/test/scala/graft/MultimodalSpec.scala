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
}
