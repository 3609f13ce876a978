package graft.sources

import java.util
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE face of the raw-payload lake (SURVEY.md S3) — the
  * `SupportsWrite` twin of [[OpenMeteoV2Source]]'s read connector, and the
  * V2 form of `Weather.writeLake`. The reference's S3 writer routes each
  * raw JSON payload to a Hive-style key
  * `city=<c>/ds=<yyyy-mm-dd>/hour=<hh>/` (s3_writer.py:59-61); here every
  * executor-side [[LakeDataWriter]] does that routing for its partition of
  * rows — fully distributed, no driver involvement per row.
  *
  * {{{
  * df.select(col("city"), col("ds"), col("hour"),
  *     to_json(struct(...)).as("raw_json"))   // serialization stays codegen'd
  *   .write.format("graft.sources.WeatherLakeV2Sink")
  *   .mode("append").save(path)
  * }}}
  *
  * Each task writes files named `part-<taskId>-<uuid>.json` directly under
  * their final partition directories; `abort()` deletes the task's files,
  * so a failed task leaves nothing behind and a retried task writes fresh
  * names (append-only eventual-commit, the object-store-friendly layout the
  * reference uses — no directory rename on commit).
  */
class WeatherLakeV2Sink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WeatherLakeV2Sink.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    if (path == null || path.trim.isEmpty) throw new IllegalArgumentException(
      "WeatherLakeV2Sink: required option 'path' is missing (use .save(<path>))")
    new WeatherLakeV2Sink.LakeTable(path)
  }
}

object WeatherLakeV2Sink {
  /** Pre-serialized payload row: partition keys + the raw JSON line. */
  val Schema: StructType = StructType(Seq(
    StructField("city", StringType, nullable = false),
    StructField("ds", StringType, nullable = false),
    StructField("hour", StringType, nullable = false),
    StructField("raw_json", StringType, nullable = false)))

  class LakeTable(path: String) extends Table with SupportsWrite {
    override def name(): String = s"weather_lake($path)"
    override def schema(): StructType = Schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_WRITE)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val jobId = info.queryId()
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new BatchWrite {
            override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
              new LakeWriterFactory(path)
            // Files land under their final names during the task (no
            // directory rename — object-store-friendly, like the
            // reference). Job commit publishes a MANIFEST listing every
            // task-committed file, written to a temp name and renamed so
            // it appears atomically: readers that filter through
            // [[committedFiles]] never see files from a job that died
            // between task commits and job commit.
            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              val files = messages.collect { case FilesWritten(ps) => ps }.flatten
              writeManifest(path, jobId, files)
            }
            override def abort(messages: Array[WriterCommitMessage]): Unit = ()
          }
        }
      }
    }
  }

  /** Directory of per-job manifests under the lake root. */
  val ManifestDir = "_manifests"

  private[sources] def writeManifest(basePath: String, jobId: String,
      files: Seq[String]): Unit = {
    val fs = new Path(basePath).getFileSystem(new Configuration())
    val mdir = new Path(basePath, ManifestDir)
    fs.mkdirs(mdir)
    val tmp = new Path(mdir, s".manifest-$jobId.tmp")
    val out = fs.create(tmp, true)
    try files.foreach(f => out.write((f + "\n").getBytes("UTF-8")))
    finally out.close()
    val dest = new Path(mdir, s"manifest-$jobId.txt")
    // a silently failed rename would lose the manifest and hide every file
    // this job wrote from the gated read path — surface it as a commit
    // failure instead (Spark then aborts the job loudly)
    if (!fs.rename(tmp, dest) && !fs.exists(dest))
      throw new java.io.IOException(
        s"WeatherLakeV2Sink: failed to publish manifest $dest")
  }

  /** Every file recorded by a COMPLETED job's manifest — the read-side
    * filter that drops orphan files left by jobs that died after some
    * task commits but before job commit.
    */
  def committedFiles(basePath: String): Seq[String] = {
    val fs = new Path(basePath).getFileSystem(new Configuration())
    val mdir = new Path(basePath, ManifestDir)
    manifestNames(basePath)
      .flatMap(n => readLines(fs, new Path(mdir, n)))
      .filter(_.nonEmpty)
  }

  /** The manifest-gated read path: only lines from files a completed job
    * committed. Returns (value: raw JSON line) rows; parse with the
    * caller's schema (Weather.RawWeatherSchema for the weather lake).
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      basePath: String): org.apache.spark.sql.DataFrame = {
    val files = committedFiles(basePath)
    if (files.isEmpty) {
      import spark.implicits._
      spark.emptyDataset[String].toDF("value")
    } else spark.read.text(files: _*)
  }

  // -----------------------------------------------------------------
  // manifest-cursor incremental reader
  // -----------------------------------------------------------------

  /** Names of every completed job's manifest under the lake root. */
  def manifestNames(basePath: String): Seq[String] = {
    val fs = new Path(basePath).getFileSystem(new Configuration())
    val mdir = new Path(basePath, ManifestDir)
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("manifest-")).sorted
  }

  private def readLines(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Manifest names already consumed, per the cursor file (empty before
    * the first [[advanceCursor]]).
    */
  def consumedManifests(cursorPath: String): Set[String] = {
    val p = new Path(cursorPath)
    val fs = p.getFileSystem(new Configuration())
    if (fs.exists(p)) readLines(fs, p).filter(_.nonEmpty).toSet else Set.empty
  }

  /** Incremental consumption of the lake — the manifest-cursor twin of
    * `WeatherJobs.loadIncremental`'s listing scan: return only the rows of
    * manifests not yet recorded at `cursorPath`, plus the manifest names
    * to pass to [[advanceCursor]] once the batch is durably processed.
    * Because the unit of progress is a whole job's manifest, a reader
    * never sees half a job, and an unadvanced cursor replays the full
    * manifest (at-least-once, idempotent for keyed upsert consumers).
    * O(new manifests) driver work — the data files themselves are read
    * distributed via `spark.read.text`.
    */
  def readNewCommits(spark: org.apache.spark.sql.SparkSession,
      basePath: String, cursorPath: String):
      (org.apache.spark.sql.DataFrame, Seq[String]) = {
    val fresh = manifestNames(basePath)
      .filterNot(consumedManifests(cursorPath))
    val fs = new Path(basePath).getFileSystem(new Configuration())
    val files = fresh
      .flatMap(n => readLines(fs, new Path(new Path(basePath, ManifestDir), n)))
      .filter(_.nonEmpty)
    val df =
      if (files.isEmpty) {
        import spark.implicits._
        spark.emptyDataset[String].toDF("value")
      } else spark.read.text(files: _*)
    (df, fresh)
  }

  /** Durably mark manifests consumed: rewrite the cursor with the union of
    * old and new names via tmp-then-rename, so a torn write can't corrupt
    * it (a lost rename surfaces as an exception, and an unadvanced cursor
    * only replays — never skips — data).
    */
  def advanceCursor(cursorPath: String, manifests: Seq[String]): Unit = {
    if (manifests.nonEmpty) {
      val p = new Path(cursorPath)
      val fs = p.getFileSystem(new Configuration())
      val all = (consumedManifests(cursorPath) ++ manifests).toSeq.sorted
      val tmp = new Path(p.getParent, s".${p.getName}.tmp")
      val out = fs.create(tmp, true)
      try all.foreach(n => out.write((n + "\n").getBytes("UTF-8")))
      finally out.close()
      // Hadoop rename refuses an existing destination: drop the old cursor
      // first. A crash inside this window loses only PROGRESS, not data —
      // the next read replays every manifest (at-least-once), it never
      // skips one.
      if (fs.exists(p)) fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(
          s"WeatherLakeV2Sink: failed to advance manifest cursor $p")
    }
  }

  final case class FilesWritten(paths: Seq[String]) extends WriterCommitMessage

  class LakeWriterFactory(path: String) extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new LakeDataWriter(path, partitionId, taskId)
  }

  /** Routes each row's JSON line into its `city=/ds=/hour=` directory,
    * keeping one open stream per partition directory seen (bounded by the
    * distinct key combinations in this task's rows). Production threads
    * the real Hadoop conf through the factory; the default conf resolves
    * local and default-FS paths, which is what this sandbox exercises.
    */
  class LakeDataWriter(basePath: String, partitionId: Int, taskId: Long)
      extends DataWriter[InternalRow] {
    private val fs = new Path(basePath).getFileSystem(new Configuration())
    private val streams = mutable.Map.empty[String, org.apache.hadoop.fs.FSDataOutputStream]
    private val written = mutable.ArrayBuffer.empty[String]
    private val fileUuid = UUID.randomUUID().toString

    override def write(row: InternalRow): Unit = {
      val dir = s"city=${row.getString(0)}/ds=${row.getString(1)}/hour=${row.getString(2)}"
      val out = streams.getOrElseUpdate(dir, {
        val f = new Path(basePath,
          s"$dir/part-$partitionId-$taskId-$fileUuid.json")
        written += f.toString
        fs.create(f, false)
      })
      out.write(row.getString(3).getBytes("UTF-8"))
      out.write('\n')
    }

    override def commit(): WriterCommitMessage = {
      streams.values.foreach(_.close())
      FilesWritten(written.toSeq)
    }

    override def abort(): Unit = {
      streams.values.foreach(s => try s.close() catch { case _: Exception => })
      written.foreach(p => try fs.delete(new Path(p), false)
        catch { case _: Exception => })
    }

    override def close(): Unit = ()
  }
}
