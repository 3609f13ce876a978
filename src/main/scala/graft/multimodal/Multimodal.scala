package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads ride through the engine as opaque `binary` columns plus typed
  * metadata, exactly like any other column — partitioned, shuffled and
  * predicate-pruned by Spark without interpreting the bytes.
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED with deterministic byte-level fakes — media codecs are not
  * available in this environment — but the Spark-side plumbing is real and
  * is the part that matters at 100 TB:
  *
  *  - batch-shaped processing via `mapPartitions` over a typed Dataset
  *    (one decoder instance per partition, amortized across rows — the
  *    same shape a Pandas-UDF / mapInPandas deployment uses);
  *  - schema contracts: binary payload + metadata struct in, fixed-width
  *    feature struct out, so downstream stages stay columnar;
  *  - per-row cost is bounded and row-independent → embarrassingly
  *    parallel, no shuffle introduced by any decode/feature stage.
  *
  * To productionize, replace the bodies marked "STUB" with real codec
  * calls; no plan shape changes.
  */
object Multimodal {

  /** One media payload: opaque bytes + the metadata a lake would carry. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte])

  /** Decoded (stub) metadata — stands in for codec-derived dimensions. */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int, // STUB: derived from header bytes, not a real decode
      height: Int,
      channels: Int)

  /** Fixed-width feature vector per payload (stand-in for an embedding). */
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      checksum: Long,
      features: Array[Float])

  /** A sampled "frame": every `stride`-th block of `frameLen` bytes. */
  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  private def rollingHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  /** STUB decode: metadata from the payload header. A real implementation
    * parses the container format here; the batch shape (one pass per
    * partition, streaming iterator in/out) is what a codec needs.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup: a real decoder is instantiated ONCE here
      rows.map { r =>
        val b = r.bytes
        def at(i: Int): Int = if (b.length > i) b(i) & 0xff else 0
        MediaMeta(r.media_id, r.kind, b.length.toLong,
          width = 16 + at(0), height = 16 + at(1), channels = 1 + at(2) % 4)
      }
    }
  }

  /** STUB feature extraction: deterministic 8-dim float vector seeded from
    * a rolling checksum — stands in for a vision/audio embedding model.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val h = rollingHash(r.bytes)
        val fs = Array.tabulate(dim) { i =>
          (((h >> (i * 7)) & 0x7f).toFloat / 127.0f) - 0.5f
        }
        MediaFeatures(r.media_id, r.bytes.length.toLong, h, fs)
      }
    }
  }

  /** STUB frame sampling: every `stride`-th `frameLen`-byte block. A real
    * implementation seeks keyframes; the fan-out shape (one row → N frame
    * rows, bounded per row) is identical.
    */
  def sampleFrames(media: Dataset[MediaRow], frameLen: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      // a frame exists at offset i*frameLen*stride whenever a full
      // frameLen block fits — including one inside the trailing partial
      // stride window
      val n =
        if (r.bytes.length < frameLen) 0
        else (r.bytes.length - frameLen) / (frameLen * stride) + 1
      (0 until n).map { i =>
        val start = i * frameLen * stride
        Frame(r.media_id, i, r.bytes.slice(start, start + frameLen))
      }
    }
  }

  /** Column-level (codegen'd) feature extraction over any binary column —
    * the subset expressible without a codec, used by the oracle-checked
    * query: byte length, md5 digest, base64 payload echo.
    */
  def binaryFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      md5(col(binCol)).as("digest_md5"),
      // Spark's base64 emits MIME 76-char lines; strip the CRLFs so the
      // digest matches unwrapped encoders (DuckDB, python base64).
      regexp_replace(base64(col(binCol)), "[\\r\\n]", "").as("payload_b64"))

  /** Typed header-field extraction from the opaque payload — REAL byte
    * parsing, not a stub: little-endian unsigned fields read off the
    * binary column exactly the way a RIFF/WAV/BMP header parse does,
    * via the native codegen'd [[graft.functions.LeUInt]] expression.
    * This is the ingest-time metadata pass of a multimodal lake: magic
    * number, size field, flags — enough to route/filter/partition
    * payloads without ever invoking a codec. Truncated payloads
    * zero-extend (LeUInt reads missing bytes as 0), so a corrupt object
    * yields a deterministic row instead of failing the scan. Linear,
    * shuffle-free.
    */
  def headerFields(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val s = df.sparkSession
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      graft.functions.LeUInt(s, col(binCol), 0, 4).as("magic_le32"),
      graft.functions.LeUInt(s, col(binCol), 4, 2).as("size_le16"),
      graft.functions.LeUInt(s, col(binCol), 6, 1).as("flags_u8"))
  }

  /** Wrap documents.text as an opaque payload table — the stand-in media
    * corpus for this environment (payload bytes are fake; plumbing real).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
        col("text").cast("binary").as("bytes"))
      .as[MediaRow]
  }

  // -----------------------------------------------------------------
  // size-bounded binary shard export (WebDataset/TFRecord shape)
  // -----------------------------------------------------------------

  /** One written shard: its path and what it holds. */
  final case class ShardInfo(path: String, records: Long, bytes: Long)

  /** A record read back from a shard. */
  final case class ShardRecord(media_id: Long, bytes: Array[Byte])

  /** Per-record framing: 8-byte little-endian media_id + 4-byte
    * little-endian payload length + payload. Self-describing enough to
    * stream-parse, simple enough that ANY trainer-side loader (Python,
    * C++) reads it with two struct unpacks — the same posture as
    * WebDataset's tar framing and TFRecord's length-prefixed blocks
    * (public formats; this one is deliberately minimal).
    */
  private val RecordHeaderBytes = 12

  /** A task-staged shard awaiting the driver's publish rename. */
  private final case class StagedShard(
      staged: String, path: String, records: Long, bytes: Long)

  /** Pack media payloads into size-bounded binary shards — how training
    * data actually reaches a dataloader: not a parquet of blobs but
    * sequential shard files a reader streams without touching a query
    * engine. Fully distributed (each task rolls its own shards at
    * `shardBytes`, no coordination, no shuffle); a record larger than the
    * target gets its own shard rather than being refused. Returns the
    * shard manifest — O(shards) driver-side metadata, like the lake
    * compaction's path list, NOT data-scaled.
    *
    * Two-phase commit, because Spark tasks are at-least-once: every task
    * STAGES its shards under hidden `.inprogress-` names (the `shard-*`
    * glob never sees them), and only after the job succeeds does the
    * DRIVER rename the winning attempts' files to their published names —
    * the same stage-then-publish shape as a FileCommitProtocol. A task
    * that dies after rolling N shards, or a speculative attempt that
    * loses, leaves only hidden staged files; nothing partial or duplicate
    * can ever reach [[readShards]]' glob. The rename pass is O(shards)
    * driver metadata, matching the manifest collect.
    *
    * Record order within a shard is the task's iteration order; order the
    * input upstream (`Relational.epochShuffle`, or t20's curriculum
    * phase-major ordering) when the training order matters — the shard
    * boundary never splits a record.
    */
  def writeShards(media: Dataset[MediaRow], outDir: String,
      shardBytes: Long = 256L * 1024 * 1024): Seq[ShardInfo] = {
    require(shardBytes > RecordHeaderBytes,
      s"shardBytes must exceed the $RecordHeaderBytes-byte record header")
    import media.sparkSession.implicits._
    // per-JOB token in every shard name: (partitionId, taskAttemptId)
    // restarts at 0 in a new Spark application, so two runs sharing a
    // directory (the readShardManifest use case) would otherwise collide
    // on a published name and fail the publish rename
    val jobToken = java.util.UUID.randomUUID().toString.take(8)
    val staged = media.mapPartitions { it =>
      val fs = new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      val taskId = org.apache.spark.TaskContext.get() match {
        case null => "local"
        case tc => s"${tc.partitionId()}-${tc.taskAttemptId()}"
      }
      val written = scala.collection.mutable.ArrayBuffer.empty[StagedShard]
      var out: org.apache.hadoop.fs.FSDataOutputStream = null
      var inProgress: org.apache.hadoop.fs.Path = null
      var path: String = null
      var bytes = 0L
      var records = 0L
      var seq = 0
      def close(): Unit = if (out != null) {
        out.close()
        written += StagedShard(inProgress.toString, path, records, bytes)
        out = null; inProgress = null; bytes = 0L; records = 0L
      }
      def open(): Unit = {
        val name = f"shard-$jobToken-$taskId-$seq%05d.bin"
        seq += 1
        path = new org.apache.hadoop.fs.Path(outDir, name).toString
        inProgress = new org.apache.hadoop.fs.Path(outDir, s".inprogress-$name")
        out = fs.create(inProgress, false)
      }
      it.foreach { row =>
        val payload = row.bytes
        val recLen = RecordHeaderBytes.toLong + payload.length
        // roll BEFORE the record that would overflow; an oversized record
        // (> shardBytes on its own) still lands, alone in its shard
        if (out != null && bytes + recLen > shardBytes) close()
        if (out == null) open()
        val header = java.nio.ByteBuffer.allocate(RecordHeaderBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        header.putLong(row.media_id)
        header.putInt(payload.length)
        out.write(header.array())
        out.write(payload)
        bytes += recLen
        records += 1
      }
      close()
      written.iterator
    }.collect().toSeq
    // publish phase: the job succeeded, so `staged` holds exactly the
    // winning attempts' shards — rename them into glob visibility
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    staged.map { sh =>
      val dest = new org.apache.hadoop.fs.Path(sh.path)
      if (!fs.rename(new org.apache.hadoop.fs.Path(sh.staged), dest))
        throw new java.io.IOException(s"failed to publish shard $dest")
      ShardInfo(sh.path, sh.records, sh.bytes)
    }
  }

  /** Read shards back as (media_id, payload) rows — the audit/repair path
    * (the hot consumer is the trainer's own loader). One task per shard
    * file via `binaryFile`; parse fails LOUDLY on a truncated or
    * misframed shard rather than returning a silent prefix.
    *
    * The glob form reads every published shard in the directory — safe
    * against task retries AND speculation, because publication happens
    * only in [[writeShards]]' driver-side rename pass over the winning
    * attempts' staged files. [[readShardManifest]] additionally scopes
    * the read to ONE write call's manifest when several runs share a
    * directory.
    */
  def readShards(spark: SparkSession, dir: String): Dataset[ShardRecord] =
    parseShards(spark,
      spark.read.format("binaryFile").load(s"$dir/shard-*.bin"))

  /** [[readShards]] over exactly the shards a [[writeShards]] call
    * committed — immune to stray files from other runs over the same
    * directory.
    */
  def readShardManifest(spark: SparkSession,
      manifest: Seq[ShardInfo]): Dataset[ShardRecord] =
    parseShards(spark,
      spark.read.format("binaryFile").load(manifest.map(_.path): _*))

  private def parseShards(spark: SparkSession,
      files: DataFrame): Dataset[ShardRecord] = {
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val buf = java.nio.ByteBuffer.wrap(content)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val outRows = scala.collection.mutable.ArrayBuffer.empty[ShardRecord]
        while (buf.remaining() > 0) {
          if (buf.remaining() < RecordHeaderBytes)
            throw new IllegalStateException(
              s"truncated shard $path: ${buf.remaining()} trailing bytes")
          val id = buf.getLong()
          val len = buf.getInt()
          if (len < 0 || len > buf.remaining())
            throw new IllegalStateException(
              s"misframed shard $path: record length $len with " +
                s"${buf.remaining()} bytes left")
          val payload = new Array[Byte](len)
          buf.get(payload)
          outRows += ShardRecord(id, payload)
        }
        outRows
      }
  }
}
