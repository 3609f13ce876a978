package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  * Each micro-batch is [[TypedLake.changesBetweenTyped]] between the
  * consumed manifest set and the admitted one — the exact NET row
  * deltas (insert / delete / update_preimage / update_postimage), each
  * side MOR-RESOLVED through its own delete files, several commits
  * collapsing to their net effect, layout-only commits (compact /
  * checkpoint / measure / compactdel) contributing nothing by
  * construction (no file-set or delete-set difference survives the
  * diff). A fresh stream's first batch is the current resolved state as
  * inserts — the Delta `readChangeFeed` + `startingVersion=latest-ish`
  * genesis this engine's batch cursor feed
  * ([[TypedLake.readNewChangesTyped]]) already pins.
  *
  * Offsets are manifest-name SETS (the classic stream's offset form):
  * deterministic replay after restart re-derives the SAME delta from
  * the manifest history — and a vacuum that reclaimed part of that
  * history fails the replay LOUDLY ([[WeatherLakeV2Sink.filesAsOf]]'s
  * vacuum-horizon error), never silently skips. `maxManifestsPerTrigger`
  * bounds admission per batch.
  *
  * Scale posture: offsets and admission are O(manifests) driver
  * metadata; every data leg is the CDF diff itself — O(changed files +
  * delete bytes), never O(table).
  */
class TypedLakeChangeFeed extends StreamSourceProvider
    with DataSourceRegister {
  import TypedLakeChangeFeed._

  override def shortName(): String = "lake-typed-cdf"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      changeSchema(resolveTable(sqlContext, schema, parameters)._2))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (path, tableSchema) = resolveTable(sqlContext, schema, parameters)
    val keyCols = parameters.get("keycols").orElse(parameters.get("keyCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "TypedLakeChangeFeed: the 'keyCols' option (row identity) is " +
          "required — the feed nets deltas per key"))
    val maxPerTrigger = parameters.get("maxmanifestspertrigger")
      .orElse(parameters.get("maxManifestsPerTrigger")).map(_.toInt)
      .getOrElse(Int.MaxValue)
    require(maxPerTrigger > 0,
      "TypedLakeChangeFeed: maxManifestsPerTrigger must be positive")
    // startingAt = earliest (default): genesis batch = the current
    // resolved state as inserts. latest: deltas only — the frontier at
    // FIRST START is persisted under the stream's metadata path, so a
    // crash before the first offset commits replays the SAME frontier
    // (never a window that depends on when the source object was
    // rebuilt).
    val genesis: Seq[String] =
      parameters.get("startingat").orElse(parameters.get("startingAt"))
        .map(_.trim.toLowerCase).getOrElse("earliest") match {
        case "earliest" => Seq.empty
        case "latest" =>
          persistedGenesis(metadataPath,
            WeatherLakeV2Sink.manifestHistory(path))
        case other => throw new IllegalArgumentException(
          s"TypedLakeChangeFeed: unknown startingAt '$other' — use " +
            "'earliest' (full current state as inserts) or 'latest' " +
            "(new changes only)")
      }
    new TypedLakeCdfSource(sqlContext.sparkSession, path,
      tableSchema, keyCols, maxPerTrigger, genesis)
  }

  /** (location, TABLE schema) of the feed: either `table = <catalog
    * identifier>` — resolved through the session catalog, which is the
    * ONLY safe form for RENAMED tables (the schema must carry the
    * historicalNames metadata or old files would silently null-fill the
    * renamed column; a hand-passed `.schema(...)` cannot know it) — or
    * `path` + an explicit `.schema(...)` for path-addressed lakes.
    */
  private def resolveTable(sqlContext: SQLContext,
      schema: Option[StructType],
      parameters: Map[String, String]): (String, StructType) =
    parameters.get("table") match {
      case Some(name) =>
        val analyzed = sqlContext.sparkSession.table(name)
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
        val path = parameters.getOrElse("path",
          throw new IllegalArgumentException(
            "TypedLakeChangeFeed: pass either 'table' (catalog " +
              "identifier — required for renamed tables, the schema " +
              "must carry the name mapping) or 'path' + .schema(...)"))
        (path, tableSchemaOf(schema))
    }
}

object TypedLakeChangeFeed {
  /** Read-or-write-once genesis frontier under the stream's metadata
    * path (the v1-source pattern: FileStreamSource keeps its seen-files
    * log there) — written temp-then-rename so it appears atomically.
    */
  private def persistedGenesis(metadataPath: String,
      current: Seq[String]): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(metadataPath)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val file = new org.apache.hadoop.fs.Path(metadataPath,
      "graft-cdf-genesis")
    if (fs.exists(file)) {
      val in = fs.open(file)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      parseJson(txt)
    } else {
      fs.mkdirs(new org.apache.hadoop.fs.Path(metadataPath))
      val tmp = new org.apache.hadoop.fs.Path(metadataPath,
        s".graft-cdf-genesis.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
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

  private def tableSchemaOf(schema: Option[StructType]): StructType =
    schema.getOrElse(throw new IllegalArgumentException(
      "TypedLakeChangeFeed: pass the TABLE schema via .schema(...) — the " +
        "feed emits it plus the _change column"))

  /** The feed's row shape: `_change` + the table columns (exactly
    * [[TypedLake.changesBetweenTyped]]'s output).
    */
  def changeSchema(tableSchema: StructType): StructType =
    StructType(StructField("_change", StringType, nullable = false) +:
      tableSchema.fields)

  /** The consumed manifest set as a v1 streaming offset (JSON array —
    * the classic stream's offset form on the v1 `Source` face).
    */
  final case class CdfOffset(consumed: Seq[String]) extends V1Offset {
    override def json(): String = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val arr = mapper.createArrayNode()
      consumed.sorted.foreach(arr.add)
      mapper.writeValueAsString(arr)
    }
  }

  private[sources] def offsetManifests(
      o: org.apache.spark.sql.connector.read.streaming.Offset): Seq[String] =
    o match {
      case CdfOffset(consumed) => consumed
      case SerializedOffset(json) => parseJson(json)
      case other => parseJson(other.json())
    }

  private def parseJson(json: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    val names = Seq.newBuilder[String]
    node.forEach(n => names += n.asText())
    names.result()
  }

  /** The v1 [[Source]]: offsets admit manifests in commit order; each
    * batch IS the snapshot-diff change feed between its offsets.
    */
  final class TypedLakeCdfSource(spark: SparkSession, path: String,
      tableSchema: StructType, keyCols: Seq[String], maxPerTrigger: Int,
      genesis: Seq[String] = Seq.empty)
      extends Source {
    WeatherLakeV2Sink.requirePayload(path, TypedLake.Payload,
      "the typed change feed")

    override def schema: StructType = changeSchema(tableSchema)

    // the engine drives start offsets from its own log; this mirror only
    // paces ADMISSION (how much history the next getOffset exposes).
    // startingAt=latest seeds it with the persisted genesis frontier —
    // those manifests are "already consumed" without ever being emitted
    @volatile private var planned: Set[String] = genesis.toSet

    override def getOffset: Option[V1Offset] = {
      // commit order pins WHICH manifests an admission-bounded batch
      // takes; the offset itself is order-free (a set)
      val history = WeatherLakeV2Sink.manifestHistory(path)
      val fresh = history.filterNot(planned)
      if (fresh.isEmpty && planned.nonEmpty)
        Some(CdfOffset(planned.toSeq.sorted))
      else if (fresh.isEmpty) None
      else {
        val admitted = planned ++ fresh.take(maxPerTrigger)
        planned = admitted
        Some(CdfOffset(admitted.toSeq.sorted))
      }
    }

    override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
      val from = start.map(offsetManifests).getOrElse(genesis)
      val to = offsetManifests(end)
      // restart: the engine replays from ITS log — adopt the replayed
      // frontier so admission continues from there, never re-plans it
      planned = planned ++ to
      // a v1 Source's batch must present as a STREAMING frame
      org.apache.spark.sql.GraftPlanBridge.asStreamingFrame(
        TypedLake.changesBetweenTyped(spark, path, tableSchema, keyCols,
          from = from, to = to))
    }

    override def commit(end: V1Offset): Unit = ()
    override def stop(): Unit = ()
  }
}
