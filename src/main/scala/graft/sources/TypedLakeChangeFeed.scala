package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING CHANGE FEED over a TYPED lake table — the face that lets a
  * merge-on-read table feed a streaming consumer WITHOUT constant
  * reconciles. The append-only typed stream (`readStream.table`)
  * rightly refuses live delete files — an append stream cannot express
  * deletions — but a CDC-rate mor table exists precisely to take
  * row-level deletions every commit, so its streaming face must emit
  * CHANGES, not appends:
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.TypedLakeChangeFeed")
  *   .schema(<table schema>)               // the TABLE's columns
  *   .option("path", <table location>)
  *   .option("keyCols", "id")              // row identity
  *   .load()                               // _change + table columns
  * }}}
  *
  * This is a NATIVE DSv2 stream — `TableProvider` →
  * [[TypedLakeChangeFeed.CdfTable]] → `MicroBatchStream with
  * SupportsAdmissionControl` — one stream stack with the typed append
  * source, not a v1 `Source` shim: admission rides the engine's own
  * `ReadLimit` (`maxManifestsPerTrigger` becomes the default read
  * limit; the engine passes the consumed offset back into
  * `latestOffset(start, limit)`, so there is no hand-rolled mutable
  * admission mirror), `Trigger.AvailableNow` drains through the
  * engine's wrapper against `reportLatestOffset`, and restart replay
  * is the engine's offset-log contract.
  *
  * Each micro-batch is [[TypedLake.changesBetweenTyped]] between the
  * consumed manifest set and the admitted one — the exact NET row
  * deltas (insert / delete / update_preimage / update_postimage), each
  * side MOR-RESOLVED through its own delete files, several commits
  * collapsing to their net effect, layout-only commits (compact /
  * checkpoint / measure / compactdel) contributing nothing by
  * construction. A fresh stream's first batch is the current resolved
  * state as inserts — the Delta `readChangeFeed` genesis the batch
  * cursor feed ([[TypedLake.readNewChangesTyped]]) already pins.
  *
  * A DSv2 micro-batch serves PARTITIONS, not a plan fragment, so each
  * admitted window's diff MATERIALIZES once under the stream's
  * checkpoint (`<checkpoint>/graft-cdf-stage/b-<offset-pair hash>`,
  * written temp-then-rename, keyed by the (start, end) offsets — the
  * same move as Delta's `_change_data` files, pushed to read time):
  * replays of the same window re-serve the SAME staged files without
  * re-running the diff (and survive a vacuum that would have broken a
  * re-derivation), `commit(end)` garbage-collects stages at-or-before
  * the committed frontier, and the data legs stay O(changed files +
  * delete bytes) per batch — never O(table).
  *
  * Offsets are manifest-name SETS (the classic stream's offset form):
  * deterministic replay after restart re-derives the SAME delta from
  * the manifest history — and a vacuum that reclaimed BOTH the history
  * and the staged batch fails the replay LOUDLY
  * ([[WeatherLakeV2Sink.filesAsOf]]'s vacuum-horizon error), never
  * silently skips.
  */
class TypedLakeChangeFeed extends TableProvider with DataSourceRegister {
  import TypedLakeChangeFeed._

  override def shortName(): String = "lake-typed-cdf"

  // the 'path' form carries the table schema via .schema(...) — it is
  // external metadata by design (a path-addressed lake stores none)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolveTable(options, None)._2

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (path, tableSchema) = resolveTable(opts, Some(schema))
    new CdfTable(path, tableSchema)
  }
}

object TypedLakeChangeFeed {

  /** (location, TABLE schema) of the feed: either `table = <catalog
    * identifier>` — resolved through the session catalog, which is the
    * ONLY safe form for RENAMED tables (the schema must carry the
    * historicalNames metadata or old files would silently null-fill the
    * renamed column; a hand-passed `.schema(...)` cannot know it) — or
    * `path` + an explicit `.schema(...)` for path-addressed lakes.
    */
  private def resolveTable(options: CaseInsensitiveStringMap,
      userSchema: Option[StructType]): (String, StructType) =
    Option(options.get("table")) match {
      case Some(name) =>
        val analyzed = SparkSession.active.table(name)
          .queryExecution.analyzed
        val tbl = analyzed.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2Relation
              if r.table.isInstanceOf[LakeCatalog.TypedLakeCatalogTable] =>
            r.table.asInstanceOf[LakeCatalog.TypedLakeCatalogTable]
        }.orElse(analyzed.collectFirst {
          case p if p.getTagValue(
              graft.plans.MorScanResolution.MorTable).isDefined =>
            p.getTagValue(graft.plans.MorScanResolution.MorTable).get
        }).getOrElse(throw new IllegalArgumentException(
          s"TypedLakeChangeFeed: '$name' is not a typed lake catalog " +
            "table"))
        (tbl.path, tbl.tableSchema)
      case None =>
        val path = Option(options.get("path")).getOrElse(
          throw new IllegalArgumentException(
            "TypedLakeChangeFeed: pass either 'table' (catalog " +
              "identifier — required for renamed tables, the schema " +
              "must carry the name mapping) or 'path' + .schema(...)"))
        (path, userSchema.getOrElse(throw new IllegalArgumentException(
          "TypedLakeChangeFeed: pass the TABLE schema via .schema(...) — " +
            "the feed emits it plus the _change column")))
    }

  /** The feed's row shape: `_change` + the table columns (exactly
    * [[TypedLake.changesBetweenTyped]]'s output).
    */
  def changeSchema(tableSchema: StructType): StructType =
    StructType(StructField("_change", StringType, nullable = false) +:
      tableSchema.fields)

  /** The consumed manifest set as a streaming offset (JSON array — the
    * classic stream's offset form).
    */
  final case class CdfOffset(consumed: Seq[String]) extends Offset {
    override def json(): String = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val arr = mapper.createArrayNode()
      consumed.sorted.foreach(arr.add)
      mapper.writeValueAsString(arr)
    }
  }

  private[sources] def offsetManifests(o: Offset): Seq[String] = o match {
    case CdfOffset(consumed) => consumed
    case other => parseJson(other.json())
  }

  private def parseJson(json: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    val names = Seq.newBuilder[String]
    node.forEach(n => names += n.asText())
    names.result()
  }

  /** Read-or-write-once genesis frontier under the stream's checkpoint
    * (the engine only logs END offsets, so a crash between first start
    * and the first offset commit would otherwise re-derive a DIFFERENT
    * `latest` frontier) — written temp-then-rename so it appears
    * atomically; a concurrent restart adopts the winner's frontier.
    */
  private def persistedGenesis(metadataPath: String,
      current: Seq[String]): Seq[String] = {
    val fs = new Path(metadataPath).getFileSystem(LakeIO.conf)
    val file = new Path(metadataPath, "graft-cdf-genesis")
    if (fs.exists(file)) {
      val in = fs.open(file)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      parseJson(txt)
    } else {
      fs.mkdirs(new Path(metadataPath))
      val tmp = new Path(metadataPath,
        s".graft-cdf-genesis.tmp-${UUID.randomUUID()}")
      val out = LakeIO.newOutput(fs, tmp, false)
      try out.write(CdfOffset(current).json()
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, file)) {
        // a concurrent restart won the race: adopt ITS frontier
        fs.delete(tmp, false)
        val in = fs.open(file)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        return parseJson(txt)
      }
      current
    }
  }

  /** The DSv2 table face of the feed: streaming-only (a batch read of a
    * change feed has no cursor — use the batch CDF functions), schema =
    * `_change` + table columns.
    */
  final class CdfTable(path: String, tableSchema: StructType)
      extends Table with SupportsRead {
    WeatherLakeV2Sink.requirePayload(path, TypedLake.Payload,
      "the typed change feed")
    override def name(): String = s"lake_typed_cdf($path)"
    override def schema(): StructType = changeSchema(tableSchema)
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = {
      val keyCols = Option(options.get("keyCols"))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(throw new IllegalArgumentException(
          "TypedLakeChangeFeed: the 'keyCols' option (row identity) is " +
            "required — the feed nets deltas per key"))
      val maxPerTrigger = Option(options.get("maxManifestsPerTrigger"))
        .map(_.toInt).getOrElse(Int.MaxValue)
      require(maxPerTrigger > 0,
        "TypedLakeChangeFeed: maxManifestsPerTrigger must be positive")
      val startLatest = Option(options.get("startingAt"))
        .map(_.trim.toLowerCase).getOrElse("earliest") match {
        case "earliest" => false
        case "latest" => true
        case other => throw new IllegalArgumentException(
          s"TypedLakeChangeFeed: unknown startingAt '$other' — use " +
            "'earliest' (full current state as inserts) or 'latest' " +
            "(new changes only)")
      }
      val p = path; val ts = tableSchema
      new ScanBuilder with Scan {
        override def build(): Scan = this
        override def readSchema(): StructType = changeSchema(ts)
        override def description(): String = s"lake_typed_cdf($p)"
        override def toBatch: Batch = throw new UnsupportedOperationException(
          "TypedLakeChangeFeed is a STREAMING source — for batch change " +
            "reads use the CDF functions (changesBetweenTyped / " +
            "readNewChangesTyped) or time-travel diffs")
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new CdfMicroBatchStream(p, ts, keyCols, maxPerTrigger,
            startLatest, checkpointLocation)
      }
    }
  }

  /** The DSv2 micro-batch stream: offsets admit manifests in commit
    * order under the engine's own `ReadLimit`; each admitted window's
    * diff stages once and serves file partitions.
    */
  final class CdfMicroBatchStream(path: String, tableSchema: StructType,
      keyCols: Seq[String], maxPerTrigger: Int, startLatest: Boolean,
      checkpointLocation: String)
      extends MicroBatchStream with SupportsAdmissionControl {

    private def spark = SparkSession.active
    private val stageRoot = new Path(checkpointLocation, "graft-cdf-stage")
    private def fs = stageRoot.getFileSystem(LakeIO.conf)

    override def initialOffset(): Offset =
      if (!startLatest) CdfOffset(Seq.empty)
      else CdfOffset(persistedGenesis(checkpointLocation,
        WeatherLakeV2Sink.manifestHistory(path)))

    override def getDefaultReadLimit: ReadLimit =
      if (maxPerTrigger == Int.MaxValue) ReadLimit.allAvailable()
      else ReadLimit.maxFiles(maxPerTrigger)

    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "TypedLakeChangeFeed paces admission through latestOffset(start, " +
          "limit) — the SupportsAdmissionControl contract")

    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val consumed = offsetManifests(start).toSet
      // commit order pins WHICH manifests an admission-bounded batch
      // takes; the offset itself is order-free (a set)
      val fresh = WeatherLakeV2Sink.manifestHistory(path)
        .filterNot(consumed)
      val take = limit match {
        case f: ReadMaxFiles => f.maxFiles()
        case _ => Int.MaxValue
      }
      CdfOffset((consumed ++ fresh.take(take)).toSeq.sorted)
    }

    override def reportLatestOffset(): Offset =
      CdfOffset(WeatherLakeV2Sink.manifestHistory(path).sorted)

    override def deserializeOffset(json: String): Offset =
      CdfOffset(parseJson(json))

    /** SHA-1 of the feed's CURRENT change schema (column names included):
      * staged parquet written before a column rename carries the OLD
      * spelling, and re-reading it under the new schema would null-fill
      * the renamed column silently — the stage is only replayable while
      * the schema it was written under still holds.
      */
    private def schemaSha: String =
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(changeSchema(tableSchema).json
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString

    /** Materialize the window's diff exactly once (keyed by the offset
      * pair, temp-then-rename) and return its parquet files. A replay
      * of the same window re-serves the staged files without
      * re-deriving the diff — unless the table schema changed since the
      * stage was written (meta records the schema sha): then the stage
      * is DISCARDED and the diff re-derives under the current schema,
      * which reads old spellings through the name mapping.
      */
    private def stageBatch(from: Seq[String], to: Seq[String])
        : Seq[String] = {
      val digest = java.security.MessageDigest.getInstance("SHA-1")
        .digest((from.sorted.mkString(",") + "->" + to.sorted.mkString(","))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val dir = new Path(stageRoot, s"b-$digest")
      if (fs.exists(dir) &&
          !readMeta(dir).exists(_._2.contains(schemaSha)))
        // legacy meta (no schema sha) or a schema drift since staging:
        // never replay bytes whose column spellings may no longer match
        fs.delete(dir, true)
      if (!fs.exists(dir)) {
        val tmp = new Path(stageRoot, s".b-$digest.tmp-${UUID.randomUUID()}")
        TypedLake.changesBetweenTyped(spark, path, tableSchema, keyCols,
            from = from, to = to)
          .write.parquet(tmp.toString)
        // GC + replay metadata: the admitted frontier this stage belongs
        // to, and the schema it was derived under
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val obj = mapper.createObjectNode()
        val arr = obj.putArray("to")
        to.sorted.foreach(arr.add)
        obj.put("schemaSha", schemaSha)
        val meta = LakeIO.newOutput(fs, new Path(tmp, "graft-cdf-meta"), false)
        try meta.write(mapper.writeValueAsString(obj)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally meta.close()
        if (!fs.rename(tmp, dir)) fs.delete(tmp, true) // a replay won
      }
      fs.listStatus(dir).map(_.getPath.toString)
        .filter(_.endsWith(".parquet")).sorted.toSeq
    }

    /** A stage's (admitted frontier, schema sha) — None when the meta
      * file is missing or unreadable; schema sha None on the legacy
      * array-only form (pre-schema-stamp stages).
      */
    private def readMeta(dir: Path): Option[(Seq[String], Option[String])] =
      try {
        val metaFile = new Path(dir, "graft-cdf-meta")
        if (!fs.exists(metaFile)) None
        else {
          val in = fs.open(metaFile)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(txt)
          if (node.isArray) {
            val names = Seq.newBuilder[String]
            node.forEach(n => names += n.asText())
            Some((names.result(), None))
          } else {
            val names = Seq.newBuilder[String]
            node.get("to").forEach(n => names += n.asText())
            Some((names.result(), Option(node.get("schemaSha"))
              .map(_.asText())))
          }
        }
      } catch { case _: Exception => None }

    override def planInputPartitions(start: Offset, end: Offset)
        : Array[InputPartition] = {
      val from = offsetManifests(start)
      val to = offsetManifests(end)
      if (from.toSet == to.toSet) return Array.empty
      val staged = stageBatch(from, to)
      if (staged.isEmpty) return Array.empty
      val b = org.apache.spark.sql.execution.datasources.v2.parquet
        .ParquetTable(s"lake_typed_cdf($path)", spark,
          CaseInsensitiveStringMap.empty(), staged.toIndexedSeq,
          Some(changeSchema(tableSchema)),
          classOf[org.apache.spark.sql.execution.datasources.parquet
            .ParquetFileFormat])
        .newScanBuilder(CaseInsensitiveStringMap.empty())
        .build().toBatch
      val factory = b.createReaderFactory()
      // each planned partition CARRIES its batch's reader factory —
      // plan-then-read pairing is structural (the append stream's rule)
      b.planInputPartitions().map(p =>
        LakeCatalog.TypedBatchPartition(p, factory): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      LakeCatalog.TypedBatchReaderFactory

    /** Drop staged windows at-or-before the committed frontier: the
      * engine never replays a committed batch, so a stage whose end set
      * is contained in the committed set can only be garbage.
      */
    override def commit(end: Offset): Unit = {
      val committed = offsetManifests(end).toSet
      if (!fs.exists(stageRoot)) return
      fs.listStatus(stageRoot).filter(_.isDirectory).foreach { st =>
        val to = readMeta(st.getPath).map(_._1).getOrElse(Seq.empty)
        if (to.nonEmpty && to.forall(committed))
          fs.delete(st.getPath, true)
      }
    }

    override def stop(): Unit = ()
  }
}
