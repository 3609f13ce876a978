package graft.sources

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, SafeProjection, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, concat, lit, raise_error}
import org.apache.spark.sql.types._

/** TYPED, Parquet-backed lake tables — the general form of the manifest
  * lake. The classic (v1) lake fixes the row shape to three path-encoded
  * partition keys plus one raw JSON line, which re-parses every payload
  * field per query (`get_json_object`) and prunes no payload columns; the
  * reference's staging relation, by contrast, is a TYPED table
  * (create_staging.sql:3-11). A typed lake table keeps the SAME manifest
  * layer — atomic rename commits, `#supersedes` partial superseding,
  * optimistic validate-at-publish, vacuum/checkpoint/time travel all
  * unchanged, because that layer deals in file paths and entry lines,
  * never in row bytes — and swaps the payload: data files are Parquet
  * with an arbitrary user schema, stamped `#format 2` + `#payload
  * parquet` so a v1 reader fails loudly instead of scanning Parquet
  * binaries as text lines (FORMAT.md §Versioning).
  *
  * Spark-first by construction:
  *  - READS delegate to the engine's own Parquet DSv2 machinery
  *    ([[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable]]
  *    over the committed file list): vectorized columnar decode, column
  *    pruning and filter pushdown to the Parquet scan, footer/row-group
  *    stats skipping, partition columns recovered from `k=v` directories
  *    — nothing reimplemented;
  *  - WRITES are a DSv2 `DataWriter[InternalRow]` around the engine's
  *    [[ParquetOutputWriter]], routing each row to its partition
  *    directory and accumulating per-file min/max for `statsFields`
  *    FROM THE TYPED COLUMN VALUES into the manifest entry lines — the
  *    same stats format the driver-side skipping layer already prunes
  *    on, now without a JSON scan;
  *  - row-level DML (merge/delete/update) keeps the classic ops' exact
  *    plan shape — driver-side candidate pruning over partition values +
  *    entry-line stats, ONE distributed pass to find touched files,
  *    survivors rewritten distributed, ONE partially-superseding manifest
  *    validated at publish — with the data legs on Parquet frames.
  *
  * Scale posture (100 TB): identical to the classic lake — everything
  * driver-side is O(committed files) or O(touched files) metadata, every
  * data pass is distributed and pruned before IO. The typed payload only
  * IMPROVES the data legs: columnar decode + predicate pushdown replace
  * whole-line JSON parsing.
  */
object TypedLake {
  import WeatherLakeV2Sink.{FieldAcc, FieldStats, entryPath, lineStats, manifestJoinKey, partitionValues, statsToJson}

  val Payload = "parquet"

  // -----------------------------------------------------------------
  // hash bucketing (storage-partitioned joins)
  // -----------------------------------------------------------------

  /** The bucket id of one column value — Murmur3 (the engine's own hash
    * family) mod n, over the INTERNAL value representation. ONE
    * definition shared by the writer's file routing, the catalog's V2
    * `bucket` function ([[LakeCatalog]] implements FunctionCatalog), and
    * therefore both sides of every storage-partitioned join: rows with
    * equal keys land in equal buckets on every bucketed lake table, so
    * a bucket-co-partitioned join needs NO exchange.
    */
  def bucketId(value: Any, dt: DataType, numBuckets: Int): Int = {
    require(numBuckets > 0, "bucketId: numBuckets must be positive")
    if (value == null) 0
    else {
      val h = org.apache.spark.sql.catalyst.expressions
        .Murmur3HashFunction.hash(value, dt, 42L)
      (((h % numBuckets) + numBuckets) % numBuckets).toInt
    }
  }

  /** Bucket file-name marker: bucketed data files are
    * `part-b<id>c<count>-<op>-<uuid>.parquet` — bucket id AND bucket
    * count are STRUCTURAL (same move as the delete-file flavor marker),
    * so the scan groups files per bucket with no extra metadata and a
    * file that lacks the marker makes the scan fall back to unknown
    * partitioning (correct, just shuffles) instead of mis-grouping.
    * The count suffix is the file's bucket GENERATION — without it a
    * bucket(8) file and a bucket(16) file with the same id would be
    * indistinguishable, and a count evolution would silently mis-group
    * (a count-8 id-5 file holds keys that split across ids 5 and 13
    * under 16 buckets). Legacy `part-b<id>-` markers (pre-count-stamp
    * writers) resolve to the table's pre-evolution count — see
    * [[LakeCatalog.BucketPriorCountsProp]]. A pre-stamp READER parses a
    * stamped name as unmarked: fail-safe (falls back to shuffling),
    * never fail-wrong.
    */
  private[graft] def bucketOfFile(path: String): Option[Int] =
    bucketGenOfFile(path).map(_._1)

  /** (bucket id, explicit bucket count) of a marked file — count is
    * None for legacy pre-stamp markers (their generation is the table's
    * pre-evolution count), None overall for unmarked files.
    */
  private[graft] def bucketGenOfFile(path: String): Option[(Int, Option[Int])] = {
    val name = new Path(path).getName
    if (!name.startsWith("part-b")) None
    else {
      val id = name.stripPrefix("part-b").takeWhile(_.isDigit)
      if (id.isEmpty) None
      else if (name.startsWith(s"part-b$id-")) Some((id.toInt, None))
      else {
        val after = name.stripPrefix(s"part-b$id")
        val cnt = after.stripPrefix("c").takeWhile(_.isDigit)
        if (after.startsWith("c") && cnt.nonEmpty &&
            after.startsWith(s"c$cnt-"))
          Some((id.toInt, Some(cnt.toInt)))
        else None
      }
    }
  }

  /** Partition-column types with a canonical, unambiguous path rendering.
    * Floats/decimals/timestamps are refused (their string forms are
    * ambiguous or timezone-dependent — the same reason Delta discourages
    * them as partition columns).
    */
  private def partitionable(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         DateType | BooleanType => true
    case _ => false
  }

  /** Validate a typed table's (schema, partition columns) at CREATE:
    * partition columns must be a SUFFIX of the declared schema (data
    * columns first — the Hive/Spark file-table convention, which keeps
    * the stored order identical to the scan's dataSchema-then-partitions
    * order) with path-renderable types.
    */
  def validateTyped(schema: StructType, partCols: Seq[String]): Unit = {
    require(schema.nonEmpty, "TypedLake: a table needs at least one column")
    val names = schema.fieldNames.toSeq
    require(names.map(_.toLowerCase).distinct.size == names.size,
      s"TypedLake: duplicate column names in (${names.mkString(", ")})")
    // "__" is the internal namespace of every DML/mor frame column
    // (__file/__path/__pos/__t/__s, __target_file/__row_pos in delete
    // files, __s_<col>/__d_<col> join renames): a user column there
    // would collide with the delete-file schema or a join rename and
    // corrupt the subtraction silently — refuse at CREATE/convert
    names.find(_.startsWith("__")).foreach { n =>
      throw new IllegalArgumentException(
        s"TypedLake: column name '$n' uses the reserved '__' prefix — " +
          "double-underscore names are internal to the DML/merge-on-read " +
          "machinery (__file, __target_file, __row_pos, __s_*, __d_*); " +
          "rename the column")
    }
    // name-mapping invariants (RENAME metadata): historical names must
    // not collide with any live column or each other — the widened scan
    // schema would be ambiguous
    val hist = historicalNames(schema)
    val allHist = hist.values.flatten.toSeq
    require(allHist.map(_.toLowerCase).distinct.size == allHist.size,
      s"TypedLake: duplicate historical names (${allHist.mkString(", ")})")
    allHist.find(h => names.exists(_.equalsIgnoreCase(h))).foreach { h =>
      throw new IllegalArgumentException(
        s"TypedLake: historical name '$h' collides with a live column — " +
          "the widened scan schema would be ambiguous")
    }
    hist.keys.find(partCols.contains).foreach { p =>
      throw new IllegalArgumentException(
        s"TypedLake: partition column '$p' carries rename history — " +
          "partition columns cannot be renamed (their values are path " +
          "segments under the old spelling)")
    }
    require(names.takeRight(partCols.size) == partCols,
      s"TypedLake: partition columns (${partCols.mkString(", ")}) must be " +
        s"the LAST columns of the schema, in order — got (${names.mkString(", ")}). " +
        "Data columns first keeps the declared order identical to the " +
        "scan's data-then-partition order")
    require(partCols.size < schema.size,
      "TypedLake: a table cannot consist of partition columns only")
    partCols.foreach { p =>
      val dt = schema(p).dataType
      require(partitionable(dt),
        s"TypedLake: partition column '$p' has type ${dt.simpleString} — " +
          "partition columns must be string/integral/date/boolean (their " +
          "values are path segments and need one canonical rendering)")
    }
  }

  /** The non-partition columns — what the Parquet data files store
    * (partition values live in the directory path, the Spark/Hive
    * convention, so the scan recovers them without reading a byte).
    */
  def dataSchema(schema: StructType, partCols: Seq[String]): StructType =
    StructType(schema.fields.filterNot(f => partCols.contains(f.name)))

  /** The Hadoop conf a Parquet write task needs: the engine's
    * [[ParquetWriteSupport]] reads these keys in `init` (normally set by
    * ParquetFileFormat.prepareWrite from the session conf — here pinned
    * to the modern defaults so executor tasks need no session).
    */
  private[sources] def parquetTaskConf(data: StructType,
      bloomFor: Seq[String] = Nil): Configuration = {
    // copy, not fresh: this conf is mutated below, but the copy
    // constructor clones the already-parsed properties instead of
    // re-reading the default XML resources per writer task
    val conf = new Configuration(LakeIO.conf)
    conf.set("parquet.write.support.class", classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(data, conf)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf.set("parquet.compression", "snappy")
    // BLOOM FILTERS for the stats-tracked columns: min/max prunes point
    // lookups on a high-cardinality key only when the layout is sorted
    // (post-ZORDER); the bloom filter prunes row groups regardless of
    // layout — `WHERE doc_id = <k>` on an unsorted table skips every
    // row group the key cannot be in, at a few bits per distinct value.
    // The engine's parquet READER consults them automatically
    // (parquet.filter.bloom.enabled defaults true) for pushed equality
    // predicates — no read-side change needed.
    bloomFor.foreach(c => conf.set(s"parquet.bloom.filter.enabled#$c", "true"))
    conf
  }

  private def taskAttemptContext(conf: Configuration):
      org.apache.hadoop.mapreduce.TaskAttemptContext = {
    import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
    new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID("graft-typed", 0),
        TaskType.MAP, 0), 0))
  }

  /** Executor-side rolling Parquet writer for ONE task: routes each
    * [[InternalRow]] (full table schema) into its partition directory,
    * writes the DATA columns through the engine's [[ParquetOutputWriter]],
    * rolls at `maxRecordsPerFile` (0 = never), and accumulates per-file
    * min/max for `statsFields` from the typed values (rendered through
    * `CAST(col AS STRING)`, the same comparison domain [[FieldStats]]
    * prunes in). `closeAll()` returns the MANIFEST ENTRY LINES — files
    * are invisible until a manifest lists them, exactly the classic
    * discipline.
    */
  private[sources] final class TypedTaskWriter(basePath: String, op: String,
      schema: StructType, partCols: Seq[String], statsFields: Seq[String],
      maxRecordsPerFile: Long,
      bucketSpec: Option[(String, Int)] = None) {
    // (column index, type, bucket count) of a hash-bucketed table —
    // every row routes to the file of its bucket ([[bucketId]])
    private val bucket: Option[(Int, DataType, Int)] = bucketSpec.map {
      case (c, n) =>
        val i = schema.fieldIndex(c)
        (i, schema(i).dataType, n)
    }
    private val partIdx = partCols.map(schema.fieldIndex).toArray
    private val dataFields = schema.fields.zipWithIndex
      .filterNot { case (_, i) => partIdx.contains(i) }
    private val data = StructType(dataFields.map(_._1))
    private val dataProj = UnsafeProjection.create(dataFields.map {
      case (f, i) => BoundReference(i, f.dataType, f.nullable) }.toSeq)
    // one canonical rendering per partition value: CAST(col AS STRING)
    // (dates → yyyy-MM-dd), escaped with the engine's own path escaping
    // so read-side partition recovery (InMemoryFileIndex unescape)
    // round-trips exactly
    private val partProj = SafeProjection.create(partIdx.toSeq.map { i =>
      Cast(BoundReference(i, schema(i).dataType, schema(i).nullable),
        StringType, Some("UTC"))
    })
    private val statsIdx = statsFields.map(schema.fieldIndex).toArray
    private val statsProj = SafeProjection.create(statsIdx.toSeq.map { i =>
      Cast(BoundReference(i, schema(i).dataType, schema(i).nullable),
        StringType, Some("UTC"))
    })
    // stats-tracked DATA columns also get parquet bloom filters
    // (partition columns live in the path, not in the file). The conf
    // key must carry the data field's EXACT name — a statsField spelled
    // in different case (tolerated everywhere else) would otherwise
    // silently write no bloom filter
    private val conf = parquetTaskConf(data,
      bloomFor = statsFields.flatMap(f =>
        data.fieldNames.find(_.equalsIgnoreCase(f))))
    private val ctx = taskAttemptContext(conf)

    private final class OpenFile(val path: String) {
      val writer = new ParquetOutputWriter(path, ctx)
      var rows = 0L
      // the stats comparison domain is pinned by the DECLARED column type
      // (numeric columns → numeric min/max, everything else → lexical),
      // matching measureStatsTyped — a string column of numeric-looking
      // values must still carry LEXICAL endpoints, because its runtime
      // comparisons are lexical
      val accs: Array[FieldAcc] = statsIdx.map(i => new FieldAcc(
        forceDomain = Some(schema(i).dataType.isInstanceOf[NumericType])))
      def entryLine(): String = {
        val st = statsFields.zip(accs)
          .flatMap { case (f, a) => a.stats.map(f -> _) }.toMap
        if (st.isEmpty) path else s"$path\t${statsToJson(st)}"
      }
    }
    private val open = mutable.Map.empty[String, OpenFile]
    private val entries = mutable.ArrayBuffer.empty[String]

    private def dirOf(row: InternalRow): String = {
      var k = 0
      while (k < partIdx.length) {
        if (row.isNullAt(partIdx(k))) throw new IllegalArgumentException(
          s"TypedLake: NULL in partition column '${partCols(k)}' — " +
            "partition values are path segments and cannot be null")
        k += 1
      }
      if (partIdx.isEmpty) basePath
      else {
        val rendered = partProj(row)
        val sb = new StringBuilder(basePath)
        var i = 0
        while (i < partIdx.length) {
          sb.append('/').append(partCols(i)).append('=')
            .append(ExternalCatalogUtils.escapePathName(
              rendered.getUTF8String(i).toString))
          i += 1
        }
        sb.toString
      }
    }

    def write(row: InternalRow): Unit = {
      val dir = dirOf(row)
      val b = bucket.map { case (i, dt, n) =>
        bucketId(if (row.isNullAt(i)) null else row.get(i, dt), dt, n)
      }
      val key = b.map(k => s"$dir#$k").getOrElse(dir)
      var f = open.getOrElseUpdate(key, newFile(dir, b))
      if (maxRecordsPerFile > 0 && f.rows >= maxRecordsPerFile) {
        f.writer.close()
        entries += f.entryLine()
        f = newFile(dir, b)
        open.update(key, f)
      }
      if (statsIdx.nonEmpty) {
        val rendered = statsProj(row)
        var k = 0
        while (k < statsIdx.length) {
          if (!row.isNullAt(statsIdx(k)))
            f.accs(k).add(rendered.getUTF8String(k).toString)
          k += 1
        }
      }
      f.writer.write(dataProj(row))
      f.rows += 1
    }

    private def newFile(dir: String, b: Option[Int] = None): OpenFile = {
      val fs = new Path(dir).getFileSystem(conf)
      fs.mkdirs(new Path(dir))
      // the count suffix stamps the file's bucket GENERATION — what a
      // later bucket-count evolution classifies files by (legacy
      // unstamped markers resolve to the pre-evolution count)
      val prefix = b.map(k => s"part-b${k}c${bucket.get._3}")
        .getOrElse("part")
      new OpenFile(new Path(dir,
        s"$prefix-$op-${UUID.randomUUID().toString}.parquet").toString)
    }

    /** Close every open file and return all entry lines written by this
      * task (path, or path + TAB + stats JSON).
      */
    def closeAll(): Seq[String] = {
      open.values.foreach { f => f.writer.close(); entries += f.entryLine() }
      open.clear()
      entries.toSeq
    }

    /** Abort: close and delete everything this task wrote (nothing was
      * published — the files would only ever be unreferenced orphans, but
      * a failed task can clean its own mess immediately).
      */
    def abortAll(): Unit = {
      open.values.foreach { f =>
        try f.writer.close() catch { case _: Exception => () }
        val p = new Path(f.path)
        try p.getFileSystem(conf).delete(p, false)
        catch { case _: Exception => () }
      }
      open.clear()
    }
  }

  /** Distributed rewrite used by the typed DML ops: write `df` (full
    * table schema, any column order) as partition-routed Parquet files
    * and return their manifest ENTRY LINES. Rows are shuffled by the
    * partition columns first so each directory's rows land in few tasks
    * (same move as the classic writeRolled's repartition-by-dir).
    */
  private[sources] def writeTypedFrame(df: DataFrame, basePath: String,
      op: String, schema: StructType, partCols: Seq[String],
      statsFields: Seq[String], maxRecordsPerFile: Long,
      bucketSpec: Option[(String, Int)] = None): Seq[String] = {
    val aligned = df.select(schema.fieldNames.map(col).toSeq: _*)
    // bucketed tables (flat on disk) cluster by the routing hash so each
    // bucket's rows land in ONE task → one marked file per bucket per
    // write; identity-partitioned tables shuffle by their directories
    val routed = bucketSpec match {
      case Some((c, n)) =>
        aligned.repartition(n, org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(col(c)), lit(n)))
      case None if partCols.isEmpty => aligned
      case None => aligned.repartition(partCols.map(col): _*)
    }
    val base = basePath
    val sch = schema
    val pc = partCols
    val sf = statsFields
    val mrpf = maxRecordsPerFile
    val bs = bucketSpec
    routed.queryExecution.toRdd.mapPartitions { it =>
      val w = new TypedTaskWriter(base, op, sch, pc, sf, mrpf, bs)
      try {
        it.foreach(w.write)
        w.closeAll().iterator
      } catch { case e: Throwable => w.abortAll(); throw e }
    }.collect().toSeq // bounded: entry lines, O(written files) metadata
  }

  // -----------------------------------------------------------------
  // column RENAME via name mapping (schema-metadata-carried)
  // -----------------------------------------------------------------

  /** Column-metadata key listing a column's HISTORICAL physical names —
    * the Iceberg name-mapping move (`schema.name-mapping.default`)
    * carried INSIDE the schema, so every read path that already threads
    * the [[StructType]] becomes rename-aware with no signature change.
    * `ALTER TABLE … RENAME COLUMN a TO b` is a metadata-only commit: the
    * field becomes `b` with `a` appended here; files written before the
    * rename keep physical `a` and are never rewritten — the read widens
    * its scan schema with the historical names and COALESCEs each
    * logical column over (current, historical…) (exactly one is non-null
    * per file, types are identical — rename never retypes).
    *
    * At 100 TB this is the difference between a marker rewrite and a
    * petabyte rewrite. The trade documented with it: per-file stats and
    * parquet bloom filters written under the OLD name stop matching the
    * new one, so skipping over pre-rename files fails OPEN (kept) until
    * compaction naturally migrates them.
    */
  val HistoricalNamesKey = "graft.historicalNames"

  /** logical column name → its historical physical names (empty map =
    * no rename ever happened; the fast path everywhere).
    */
  def historicalNames(schema: StructType): Map[String, Seq[String]] =
    schema.fields.flatMap { f =>
      if (f.metadata.contains(HistoricalNamesKey)) {
        val hist = f.metadata.getStringArray(HistoricalNamesKey).toSeq
        if (hist.nonEmpty) Some(f.name -> hist) else None
      } else None
    }.toMap

  /** The scan schema a mapped read needs: the declared fields plus one
    * nullable twin per historical name (same type — the parquet reader
    * null-fills whichever spelling a file lacks).
    */
  private[sources] def widenedSchema(schema: StructType): StructType = {
    val hist = historicalNames(schema)
    if (hist.isEmpty) schema
    else StructType(schema.fields ++ hist.toSeq.sortBy(_._1).flatMap {
      case (logical, names) =>
        val dt = schema(logical).dataType
        names.map(n => StructField(n, dt, nullable = true))
    })
  }

  /** The projection that folds historical spellings back into each
    * logical column: `coalesce(current, hist…)` when mapped, the plain
    * column otherwise.
    */
  private[sources] def mappedCol(schema: StructType)(name: String): Column = {
    val hist = historicalNames(schema).getOrElse(name, Seq.empty)
    if (hist.isEmpty) col(name)
    else org.apache.spark.sql.functions
      .coalesce((name +: hist).map(col): _*).as(name)
  }

  /** The committed view (or any explicit file list) as a typed frame via
    * the engine's own Parquet source: `basePath` anchors `k=v` partition
    * recovery, the user schema pins partition-column TYPES, and the
    * result columns follow the DECLARED order (data-then-partition comes
    * back from the source; the select restores the table's order — a
    * no-op for schemas that follow [[validateTyped]]'s suffix rule).
    * Renamed columns resolve through the name mapping
    * ([[HistoricalNamesKey]]): pre-rename files stay readable in place.
    */
  def readTyped(spark: SparkSession, basePath: String, schema: StructType,
      files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else DriverListing.parquetFrame(spark, files, widenedSchema(schema),
        Map("basePath" -> basePath))
      .select(schema.fieldNames.map(mappedCol(schema)).toSeq: _*)

  def readCommittedTyped(spark: SparkSession, basePath: String,
      schema: StructType): DataFrame = {
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "readCommittedTyped")
    // ONE snapshot for files AND delete rows: resolving them separately
    // could mix a racing commit's data with the old delete set
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val files = WeatherLakeV2Sink.filesAsOf(basePath, snapshot)
    val deleteLines = morDeleteLinesOf(basePath, snapshot)
    readResolvedSplit(spark, basePath, schema, files, deleteLines)
  }

  /** Append `df` as one manifest commit (the typed twin of the classic
    * batch append): files are invisible until the manifest renames in; a
    * deterministic `manifestId` gives exactly-once replay short-circuit.
    */
  def appendTyped(spark: SparkSession, basePath: String, df: DataFrame,
      schema: StructType, partCols: Seq[String],
      statsFields: Seq[String] = Nil, manifestId: Option[String] = None,
      maxRecordsPerFile: Long = 0L,
      bucketSpec: Option[(String, Int)] = None): Unit = {
    val id = manifestId.getOrElse(UUID.randomUUID().toString)
    WeatherLakeV2Sink.ReservedIdPrefixes.find(id.startsWith).foreach { p =>
      throw new IllegalArgumentException(
        s"TypedLake: manifestId '$id' uses the reserved maintenance " +
          s"prefix '$p' (see FORMAT.md); pick another id")
    }
    if (manifestId.exists(WeatherLakeV2Sink.manifestExists(basePath, _)))
      return // exactly-once replay: already published
    val entries = writeTypedFrame(df, basePath, "b", schema, partCols,
      statsFields, maxRecordsPerFile, bucketSpec)
    WeatherLakeV2Sink.writeManifest(basePath, id, entries,
      payload = Some(Payload))
  }

  /** Stage `df` on a BRANCH (the function-face twin of the catalog's
    * WAP staging path, [[WeatherLakeV2Sink.branchCommit]]): files land
    * in the data tree, the manifest lands in the branch's own staging
    * dir — invisible to main until `fast_forward` publishes it.
    */
  def appendTypedToBranch(spark: SparkSession, basePath: String,
      branch: String, df: DataFrame, schema: StructType,
      partCols: Seq[String], statsFields: Seq[String] = Nil,
      bucketSpec: Option[(String, Int)] = None): Unit = {
    // bucketed tables stage through the SAME bucket-routing writer as
    // main appends (the catalog's WAP path shares main's writer and
    // only swaps the commit destination) — staged files carry their
    // markers, so the zero-exchange layout survives fast_forward
    val entries = writeTypedFrame(df, basePath, "b", schema, partCols,
      statsFields, maxRecordsPerFile = 0L, bucketSpec = bucketSpec)
    WeatherLakeV2Sink.branchCommit(basePath, branch,
      UUID.randomUUID().toString, entries, payload = Some(Payload))
  }

  /** A typed file's partition values as the LOGICAL (unescaped) values —
    * the typed writer path-escapes (`a b` → `a%20b`), so every typed
    * prune/domain comparison against batch or statement values must
    * unescape first; comparing the raw path segment would silently rule
    * out a file whose value needs escaping (and a merge that cannot see
    * its file duplicates the key). Classic lakes write values RAW and
    * keep using [[WeatherLakeV2Sink.partitionValues]] directly.
    */
  private[sources] def partitionValuesTyped(basePath: String,
      file: String): Map[String, String] =
    partitionValues(basePath, file).map { case (k, v) =>
      k -> ExternalCatalogUtils.unescapePathName(v)
    }

  /** The spellings the engine's `_metadata.file_path` can report for
    * `file`, MOST AUTHORITATIVE FIRST — computed once per file on the
    * DRIVER, so the scan side carries no per-row path normalization at
    * all (`file_path` is constant per reader split; the old
    * `regexp_replace(input_file_name(), …)` paid a regex per data row).
    * The engine reports `scheme:` + URL-ENCODED raw path
    * (probe-verified `file:/…%20…` for an escaped partition dir) —
    * that form leads; the decoded qualified string, the caller's
    * spelling and the bare join key ride along as aliases.
    */
  private def filePathSpellings(file: String,
      fs: org.apache.hadoop.fs.FileSystem): Seq[String] = {
    val p = new Path(file)
    val q = fs.makeQualified(p)
    val u = q.toUri
    val auth = Option(u.getAuthority).map("//" + _).getOrElse("")
    val encodedQualified = s"${u.getScheme}:$auth${u.getRawPath}"
    Seq(encodedQualified, q.toString, file, manifestJoinKey(file)).distinct
  }

  /** The broadcast (reported spelling → manifest entry path) map of a
    * framed read. Alias spellings of one file can collide with another
    * file's authoritative form (a literal `%20` vs an escaped space):
    * each spelling keeps its HIGHEST-priority owner, and the engine
    * always reports the priority-0 form — a lookup can never land on a
    * shadowed alias. ONE Configuration + cached FileSystem for the
    * whole list — constructing a Configuration is an XML parse, and
    * per-file construction turns O(files) driver work into seconds on
    * an accumulated table.
    */
  private def filePathMap(files: Seq[String]): Seq[(String, String)] = {
    if (files.isEmpty) return Seq.empty
    val fs = new Path(files.head).getFileSystem(LakeIO.conf)
    files
      .flatMap { f =>
        filePathSpellings(f, fs).zipWithIndex
          .map { case (s, pri) => (s, f, pri) }
      }
      .groupBy(_._1).valuesIterator
      .map(_.minBy(_._3)).map(t => (t._1, t._2)).toSeq
  }

  /** Candidate files of a typed op as a frame carrying `__file` (the
    * manifest-joinable path) and — when `withPos` — `__pos`, the row's
    * ordinal within its data file (the engine's `_metadata.row_index`,
    * stable under pushed filters and row-group skipping: it is the
    * PHYSICAL position, which is what makes position-delete targeting
    * sound). Reads only `files`, typed. `__file` derives from
    * `_metadata.file_path` — a per-split CONSTANT — against a
    * driver-built broadcast spelling map: zero per-row path work on the
    * scan side.
    */
  private[graft] def framedTyped(spark: SparkSession, basePath: String,
      schema: StructType, files: Seq[String],
      withPos: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val session = spark
    import session.implicits._
    val keyed = filePathMap(files)
    val base = DriverListing.parquetFrame(spark, files,
      widenedSchema(schema), Map("basePath" -> basePath))
    // ONE select over the raw relation: `_metadata` is a metadata column
    // and must be projected before any other Project hides it; renamed
    // columns fold their historical spellings here too
    val cols = (if (withPos)
        Seq(col("_metadata.row_index").as(PosFrameCol)) else Seq.empty) ++
      Seq(col("_metadata.file_path").as("__path")) ++
      schema.fieldNames.toSeq.map(mappedCol(schema))
    // LEFT join + loud per-row guard, not an inner join: an engine
    // spelling the driver map did not anticipate (a Spark/Hadoop upgrade
    // changing SparkPath's encoding or authority rendering) must FAIL the
    // rewrite, never silently drop that file's rows from a DELETE/UPDATE/
    // MERGE (which would be data loss). The guard is a constant-per-split
    // coalesce, zero cost on the matched path.
    base.select(cols: _*)
      .join(broadcast(keyed.toDF("__path", "__file")), Seq("__path"), "left")
      .withColumn("__file", coalesce(col("__file"), raise_error(concat(
        lit("TypedLake.framedTyped: engine-reported file_path spelling " +
          "not in the driver spelling map (path-encoding drift?): "),
        col("__path")))))
      .drop("__path")
  }

  // -----------------------------------------------------------------
  // merge-on-read deletion vectors (typed)
  // -----------------------------------------------------------------

  /** Where mor-delete files live under a table root. Underscore-prefixed
    * so plain directory listings (sweepOrphans' data walk, partition
    * discovery, `convert`'s adoption walk) skip it structurally.
    */
  val MorDeleteDir = "_mor_deletes"

  /** The delete-row column naming the ONE data file the deletion applies
    * to (the manifest entry path — file-scoped targeting, see
    * [[WeatherLakeV2Sink.MorDeletePrefix]]).
    */
  val MorTargetCol = "__target_file"

  /** A delete file's schema: the target-file column plus EVERY table
    * column (partition values materialized as plain columns — delete
    * files are unpartitioned).
    */
  def morDeleteSchema(schema: StructType): StructType =
    StructType(StructField(MorTargetCol, StringType, nullable = false) +:
      schema.fields)

  /** The POSITION-delete row-ordinal column: the deleted row's physical
    * index within its target file (the engine's `_metadata.row_index`).
    */
  val MorPosCol = "__row_pos"

  /** The framed-read ordinal column position deletes join against. */
  private[sources] val PosFrameCol = "__pos"

  /** A POSITION delete file's schema — (target file, row ordinal), the
    * Iceberg v2 position-delete / Delta deletion-vector shape: O(~16
    * bytes) per deleted row REGARDLESS of table width, where an equality
    * delete carries the full old image (on a wide `documents.text` row,
    * nearly the bytes it kills). Position deletes are the default mor
    * form; equality deletes remain the fallback (`morDeletes =
    * 'equality'`) and every reader subtracts BOTH — a table may hold a
    * mix across its history.
    */
  val MorPosSchema: StructType = StructType(Seq(
    StructField(MorTargetCol, StringType, nullable = false),
    StructField(MorPosCol, LongType, nullable = false)))

  /** Delete-file FLAVOR is structural: the typed task writer stamps its
    * op token into every file name (`part-<op>-<uuid>.parquet`), and
    * position-delete files are written with op `morpos` — so one
    * `#mordelete` directive kind covers both flavors and every
    * carry-over / vacuum / conflict rule in the manifest layer applies
    * unchanged (FORMAT.md §Merge-on-read).
    */
  private[graft] def isPosDelete(path: String): Boolean =
    new Path(path).getName.startsWith("part-morpos-")

  /** The live delete rows of `deleteFiles`, columns renamed `__d_<name>`
    * so they join against a framed data read without ambiguity.
    * Pre-rename equality delete files carry old-image columns under the
    * HISTORICAL spelling — the same widen-and-coalesce as every data
    * read, or the null-safe equality would silently miss (and
    * resurrect) their deletions.
    */
  private def readMorDeletesRenamed(spark: SparkSession, schema: StructType,
      deleteFiles: Seq[String]): DataFrame =
    DriverListing.parquetFrame(spark, deleteFiles,
        morDeleteSchema(widenedSchema(schema)))
      .select(col(MorTargetCol) +:
        schema.fieldNames.toSeq.map(n =>
          mappedCol(schema)(n).as(s"__d_$n")): _*)

  /** Subtract delete rows from a FRAMED read (table columns + `__file`,
    * plus `__pos` when any POSITION delete file is present).
    *
    * Position leg: a row dies iff some position-delete row names its
    * (file, ordinal) — an equi-anti-join on two narrow columns, so the
    * probe side needs NO table columns beyond the query's own
    * projection (column pruning survives) and the broadcast side is
    * O(16 bytes × deleted rows) regardless of row width.
    *
    * Equality leg (fallback / legacy files): a row dies iff some delete
    * row targets its file AND equals it on every column (null-safe).
    * For a deterministic delete predicate this is exactly `NOT(pred)`
    * semantics — any row equal to a deleted row matched the same
    * predicate — while file-scoped targeting keeps later re-insertions
    * (new files) alive.
    *
    * Both legs' delete sides are O(deleted rows); AQE elects a
    * broadcast when small, which is the whole point of merge-on-read.
    */
  private[graft] def applyMorDeletes(spark: SparkSession,
      schema: StructType, framed: DataFrame,
      deleteFiles: Seq[String]): DataFrame = {
    val (posFiles, eqFiles) = deleteFiles.partition(isPosDelete)
    val afterPos =
      if (posFiles.isEmpty) framed
      else {
        require(framed.columns.contains(PosFrameCol),
          "TypedLake: position-delete subtraction needs the framed " +
            s"read's $PosFrameCol ordinal column (framedTyped withPos)")
        val pd = DriverListing.parquetFrame(spark, posFiles, MorPosSchema)
          .select(col(MorTargetCol).as("__d_target"),
            col(MorPosCol).as("__d_pos"))
        framed.join(pd,
          framed("__file") === pd("__d_target") &&
            framed(PosFrameCol) === pd("__d_pos"), "left_anti")
      }
    if (eqFiles.isEmpty) afterPos
    else {
      val del = readMorDeletesRenamed(spark, schema, eqFiles)
      val cond = schema.fieldNames.toSeq
        .map(n => afterPos(n) <=> del(s"__d_$n"))
        .foldLeft(afterPos("__file") === del(MorTargetCol))(_ && _)
      afterPos.join(del, cond, "left_anti")
    }
  }

  /** The DISTINCT target data files named by a delete-file list (both
    * flavors). Bounded driver metadata: distinct targets ≤ touched
    * files, the manifest-read class.
    */
  private def morDeleteTargets(spark: SparkSession, schema: StructType,
      deleteFiles: Seq[String]): Array[String] = {
    val (posFiles, eqFiles) = deleteFiles.partition(isPosDelete)
    val sides = Seq(
      if (posFiles.isEmpty) None
      else Some(DriverListing.parquetFrame(spark, posFiles, MorPosSchema)
        .select(col(MorTargetCol))),
      if (eqFiles.isEmpty) None
      else Some(readMorDeletesRenamed(spark, schema, eqFiles)
        .select(col(MorTargetCol)))).flatten
    sides.reduce(_.unionByName(_)).distinct()
      .collect().map(_.getString(0))
  }

  /** The live mor-delete directive PAYLOAD lines (path + optional
    * target-range stats) of a snapshot's manifests.
    */
  private def morDeleteLinesOf(basePath: String,
      manifests: Seq[String]): Seq[String] =
    WeatherLakeV2Sink.morDirectivesOf(basePath, manifests)
      .map(_.stripPrefix(WeatherLakeV2Sink.MorDeletePrefix).trim)

  /** The live mor-delete file paths of a snapshot's manifests. */
  private def morDeleteFilesOf(basePath: String,
      manifests: Seq[String]): Seq[String] =
    morDeleteLinesOf(basePath, manifests).map(entryPath)

  /** Prune a delete-file ENTRY-LINE list to the files that can target
    * any of `dataFiles` — the delete-side skipping leg: delete files
    * carry min/max stats over [[MorTargetCol]] (written like any
    * statsFields), and a reader of a PRUNED data-file subset (a
    * partition-scoped DML candidate set, a CDF changed-file side) need
    * not open delete files whose whole target range lies outside it.
    * Fail-open like every prune here: no stats, non-ASCII values →
    * kept. Driver-side O(delete files × log data files).
    */
  private[graft] def pruneMorDeleteLines(deleteLines: Seq[String],
      dataFiles: Seq[String]): Seq[String] = {
    if (deleteLines.isEmpty) return Seq.empty
    val sorted = dataFiles.sorted.toIndexedSeq
    def ascii(s: String): Boolean = s.forall(_ < 128)
    val filesAscii = sorted.forall(ascii)
    def anyFileIn(lo: String, hi: String): Boolean = {
      // first path >= lo, then check it is <= hi
      var l = 0; var r = sorted.size
      while (l < r) {
        val m = (l + r) >>> 1
        if (sorted(m) < lo) l = m + 1 else r = m
      }
      l < sorted.size && sorted(l) <= hi
    }
    deleteLines.filter { line =>
      lineStats(line).get(MorTargetCol) match {
        case Some(fs) if !fs.numeric && filesAscii && ascii(fs.min) &&
            ascii(fs.max) =>
          anyFileIn(fs.min, fs.max)
        case _ => true // fail open
      }
    }.map(entryPath)
  }

  /** The delete FILES a resolution of `files` must subtract: the live
    * delete lines pruned by target range ([[pruneMorDeleteLines]]) and —
    * when the caller's read re-applies a predicate to every surviving
    * row — by the predicate's own stats domain (`lineKeep`, fail-open).
    * The second leg is SOUND only for reads whose output is filtered by
    * the same predicate the keep-function approximates (a skipped
    * file's unsubtracted ghost rows then never match); rewriting reads
    * (CoW survivors, reconcile, compaction) must keep the default.
    * Equality delete files carry data-column stats for exactly this
    * ([[writeMorDeleteFiles]]); position files have none and always
    * survive `lineKeep` — their broadcast is O(16 B/row) anyway.
    */
  private[graft] def applicableDeleteLines(deleteLines: Seq[String],
      files: Seq[String],
      lineKeep: String => Boolean = _ => true): Seq[String] =
    pruneMorDeleteLines(deleteLines.filter(l =>
      lineStats(l).isEmpty || lineKeep(l)), files)

  /** The data files any live delete file could TARGET, by the delete
    * entry lines' target-range stats — the inverse of
    * [[pruneMorDeleteLines]], and the driver-side split every
    * subtraction-only read uses: files OUTSIDE every range are CLEAN
    * and bypass the anti-join (and its file-key broadcast map)
    * entirely. Fail-SAFE toward "targeted": a delete line without
    * usable stats marks every file (the subtraction still runs —
    * correctness never rides the split). O((files + lines) log files)
    * driver metadata.
    */
  private[graft] def possiblyTargetedFiles(files: Seq[String],
      deleteLines: Seq[String]): Set[String] = {
    if (deleteLines.isEmpty) return Set.empty
    def ascii(s: String): Boolean = s.forall(_ < 128)
    val ranges = deleteLines.map(l => lineStats(l).get(MorTargetCol))
    if (ranges.exists(r => r.isEmpty || r.get.numeric ||
        !ascii(r.get.min) || !ascii(r.get.max)) ||
        !files.forall(ascii))
      return files.toSet // no usable range somewhere: everything targeted
    val rs = ranges.map(_.get)
    files.filter(f => rs.exists(r => r.min <= f && f <= r.max)).toSet
  }

  /** SPLIT-SCAN mor resolution for SUBTRACTION-ONLY reads (SELECT
    * faces, CDF sides, compaction inputs — anything that only needs the
    * resolved ROWS, not per-row `__file` bookkeeping): clean files read
    * PLAIN (no ordinals, no file-key broadcast map, no anti-join probe
    * per row) and union the resolved read of the targeted sliver. At
    * CDC rates deletes touch a small fraction of a 100 TB table's
    * files; the subtraction machinery now costs O(targeted files), not
    * O(table). DML ops keep [[resolvedFramed]] — they need `__file` on
    * every candidate row regardless.
    */
  private[graft] def readResolvedSplit(spark: SparkSession,
      basePath: String, schema: StructType, files: Seq[String],
      deleteLines: Seq[String]): DataFrame = {
    val names = schema.fieldNames.toSeq
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val deletes = pruneMorDeleteLines(deleteLines, files)
    if (deletes.isEmpty) return readTyped(spark, basePath, schema, files)
    val targeted = possiblyTargetedFiles(files,
      deleteLines.filter(l => deletes.contains(entryPath(l))))
    val clean = files.filterNot(targeted)
    val resolved = applyMorDeletes(spark, schema,
        framedTyped(spark, basePath, schema, targeted.toSeq.sorted,
          withPos = deletes.exists(isPosDelete)), deletes)
      .select(names.map(col): _*)
    if (clean.isEmpty) resolved
    else readTyped(spark, basePath, schema, clean).unionByName(resolved)
  }

  /** Resolve `files` through the PRUNED live delete set: one framed
    * read — ordinals included exactly when a position-delete file
    * survives the prune, or when the caller itself needs them (a mor op
    * about to WRITE position deletes) — minus both delete flavors.
    */
  private def resolvedFramed(spark: SparkSession, basePath: String,
      schema: StructType, files: Seq[String], deleteLines: Seq[String],
      needPos: Boolean = false,
      lineKeep: String => Boolean = _ => true): DataFrame = {
    val deletes = applicableDeleteLines(deleteLines, files, lineKeep)
    val withPos = needPos || deletes.exists(isPosDelete)
    applyMorDeletes(spark, schema,
      framedTyped(spark, basePath, schema, files, withPos), deletes)
  }

  /** Deletes at or under this row count collapse to ONE delete file —
    * high-rate CDC must not shed per-task confetti (reconcile/compaction
    * bounds the population either way).
    */
  private val MorDeleteCoalesceRows = 1000000L

  /** Write a frame of delete rows ([[morDeleteSchema]] shape) under
    * `_mor_deletes/` and return the entry lines to publish as
    * `#mordelete` directives — the one write path of both mor DELETE and
    * mor MERGE.
    */
  private def writeMorDeleteFiles(deleteRows: DataFrame, deletedRows: Long,
      basePath: String, schema: StructType,
      maxRecordsPerFile: Long, statsFields: Seq[String] = Nil): Seq[String] = {
    val routed = if (deletedRows <= MorDeleteCoalesceRows)
      deleteRows.coalesce(1) else deleteRows
    // each delete file's entry line carries min/max over its TARGET
    // paths — the delete-side skipping leg ([[pruneMorDeleteLines]]) —
    // plus the table's stats columns over the OLD IMAGES, so a
    // predicate-filtered read can skip whole delete files whose deleted
    // rows provably cannot match ([[applicableDeleteLines]])
    writeTypedFrame(routed, s"$basePath/$MorDeleteDir", "mordelete",
      morDeleteSchema(schema), Seq.empty,
      MorTargetCol +: statsFields.filter(f =>
        schema.fieldNames.exists(_.equalsIgnoreCase(f))),
      maxRecordsPerFile)
  }

  /** Write a frame of POSITION delete rows ([[MorPosSchema]] shape)
    * under `_mor_deletes/` — the op token `morpos` in the file name IS
    * the flavor marker ([[isPosDelete]]); entry lines carry the same
    * target-range stats, published under the same `#mordelete`
    * directive.
    */
  private def writeMorPosDeleteFiles(deleteRows: DataFrame,
      deletedRows: Long, basePath: String,
      maxRecordsPerFile: Long): Seq[String] = {
    val routed = if (deletedRows <= MorDeleteCoalesceRows)
      deleteRows.coalesce(1) else deleteRows
    writeTypedFrame(routed, s"$basePath/$MorDeleteDir", "morpos",
      MorPosSchema, Seq.empty, Seq(MorTargetCol), maxRecordsPerFile)
  }

  /** MERGE-ON-READ DELETE — the rewrite-amplification answer (Delta
    * deletion vectors / Iceberg v2 equality-delete files): a small
    * DELETE publishes O(deleted rows) bytes of DELETE FILES plus one
    * directive-only manifest, rewrites NO data file and supersedes NO
    * manifest. Scans (the catalog face via [[graft.plans
    * .MorScanResolution]], every function-face read, and all typed DML
    * ops' own reads) subtract the delete rows with a file-scoped
    * null-safe anti-join; `CALL lake.system.reconcile` (or any
    * compaction of the affected directories) folds them back into clean
    * files. At CDC rates this is THE difference between O(deleted) and
    * O(touched-files) write amplification per statement.
    *
    * Semantics equal [[deleteTyped]] exactly (same predicate binding,
    * same SQL NULL row-keeping, same fail-open candidate prune, same
    * publish-time read-domain conflict); the matching pass reads the
    * MOR-RESOLVED view, so re-deleting already-deleted rows is a no-op
    * and reported counts stay true. A delete matching nothing publishes
    * nothing. Time travel is exact: directives resolve within the
    * pinned snapshot ([[WeatherLakeV2Sink.morDeleteFilesAsOf]]).
    */
  def deleteTypedMor(spark: SparkSession, basePath: String,
      schema: StructType, partCols: Seq[String],
      predicate: DataFrame => Column,
      prune: (Map[String, String], Map[String, FieldStats]) => Boolean =
        (_, _) => true,
      maxRecordsPerFile: Long = 0L,
      positionDeletes: Boolean = true,
      statsFields: Seq[String] = Nil): WeatherLakeV2Sink.DeleteStats = {
    import org.apache.spark.sql.functions.coalesce
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "deleteTypedMor")
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val committedLines = byManifest.flatMap(_._2)
    def inReadDomain(l: String): Boolean =
      prune(partitionValuesTyped(basePath, entryPath(l)), lineStats(l))
    val candidates = committedLines.collect {
      case l if inReadDomain(l) => entryPath(l)
    }
    if (candidates.isEmpty) return WeatherLakeV2Sink.DeleteStats(0, 0, 0L)
    val liveDeleteLines = morDeleteLinesOf(basePath, snapshot)
    def hit(df: DataFrame) = coalesce(predicate(df), lit(false))
    // the predicate's own stats domain also prunes DELETE files: a
    // delete file whose old images provably cannot match `hit` need not
    // be opened or broadcast — sound here because unsubtracted ghost
    // rows never match `hit` either, and a mor delete rewrites nothing
    val cand = resolvedFramed(spark, basePath, schema, candidates,
      liveDeleteLines, needPos = positionDeletes, lineKeep = inReadDomain)
    val matches = cand.filter(hit(cand))
    val perFile = matches.groupBy(col("__file"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (perFile.isEmpty) return WeatherLakeV2Sink.DeleteStats(0, 0, 0L)
    val deletedRows = perFile.map(_._2).sum
    val newDeleteFiles =
      if (positionDeletes)
        writeMorPosDeleteFiles(matches.select(
          col("__file").as(MorTargetCol), col(PosFrameCol).as(MorPosCol)),
          deletedRows, basePath, maxRecordsPerFile)
      else writeMorDeleteFiles(matches.select(
        col("__file").as(MorTargetCol) +:
          schema.fieldNames.toSeq.map(col): _*),
        deletedRows, basePath, schema, maxRecordsPerFile, statsFields)
    // fileIdentityDependent: the delete rows target data-file PATHS, so
    // a racing compaction/reconcile (which rewrites in-domain rows under
    // new paths) must conflict — only identity-preserving maintenance
    // (checkpoint/measure) is exempt
    WeatherLakeV2Sink.publishCommit(basePath, "mordelete",
      snapshot = snapshot, supersedes = Seq.empty,
      lines = newDeleteFiles.map(l =>
        s"${WeatherLakeV2Sink.MorDeletePrefix}$l"),
      readDomain = Some(inReadDomain), payload = Some(Payload),
      fileIdentityDependent = true)
    WeatherLakeV2Sink.DeleteStats(perFile.length, newDeleteFiles.size,
      deletedRows)
  }

  /** MERGE-ON-READ MERGE — the CDC-rate upsert without rewrite
    * amplification (the reference's whole loader contract is an hourly
    * ON-CONFLICT upsert, load_to_postgres.py:90-102 + etl_openmeteo
    * .py:14; at 100 TB a copy-on-write merge rewrites every touched file
    * per hour). Same action surface and dispatch semantics as
    * [[mergeTyped]], different commit shape: matched UPDATEs emit a
    * DELETE ROW for the old image plus an APPENDED new image (skipped
    * entirely when every column is unchanged — no churn on idempotent
    * re-merges), matched/full-sync DELETEs emit delete rows only,
    * INSERTs append — ONE manifest carries the appended files' entry
    * lines AND the `#mordelete` directives, supersedes NOTHING. Rows the
    * merge does not touch never move; reconcile/compaction folds the
    * delete rows back later.
    */
  def mergeTypedMor(spark: SparkSession, basePath: String,
      schema: StructType, partCols: Seq[String],
      batch: DataFrame, keyCols: Seq[String],
      actions: TypedMergeActions = TypedMergeActions(
        matchedUpdate = Some(None), insert = Some(None)),
      statsFields: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      positionDeletes: Boolean = true,
      bucketSpec: Option[(String, Int)] = None): WeatherLakeV2Sink.MergeStats = {
    import org.apache.spark.sql.functions.{coalesce, when}
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "mergeTypedMor")
    val names = schema.fieldNames.toSeq
    require(keyCols.nonEmpty && keyCols.forall(names.contains),
      s"TypedLake: merge key columns (${keyCols.mkString(", ")}) must be " +
        s"table columns (${names.mkString(", ")})")
    val fullSync = actions.notMatchedBySourceDelete.isDefined

    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val committedLines = byManifest.flatMap(_._2)
    val committed = committedLines.map(entryPath)

    // ---- read domain / candidate pruning: exactly mergeTyped's rules
    val partitionPrunable =
      partCols.nonEmpty && partCols.forall(keyCols.contains) && !fullSync
    val batchParts: Set[Seq[String]] =
      if (!partitionPrunable) Set.empty
      else batch.select(partCols.map(c =>
          col(c).cast(StringType)).toSeq: _*)
        .distinct().collect()
        .map(r => partCols.indices.map(i => r.getString(i)).toSeq).toSet
    def inReadDomain(line: String): Boolean =
      if (!partitionPrunable) true
      else {
        val pv = partitionValuesTyped(basePath, entryPath(line))
        val tuple = partCols.map(pv.get)
        if (tuple.exists(_.isEmpty)) true
        else batchParts(tuple.map(_.get))
      }
    val candidates = committed.filter(inReadDomain)

    val liveDeleteLines = morDeleteLinesOf(basePath, snapshot)
    def resolved(files: Seq[String], needPos: Boolean): DataFrame =
      resolvedFramed(spark, basePath, schema, files, liveDeleteLines,
        needPos = needPos)
    val batchKeys = batch.select(keyCols.map(col).toSeq: _*).distinct()
    val touched: Seq[String] =
      if (candidates.isEmpty) Seq.empty
      else if (fullSync) candidates
      else {
        val cand = resolved(candidates, needPos = false)
        cand.join(batchKeys, keyCols, "left_semi")
          .select(col("__file")).distinct()
          .collect().map(_.getString(0)).toSeq
      }

    // ---- relational classification over ONE joined frame (tgt keeps
    // __file — and, for position deletes, __pos — so every old image
    // knows the (file, ordinal) its delete row targets)
    val tgt = resolved(touched, needPos = positionDeletes)
      .withColumn("__t", lit(true))
    val src = batch
      .select(keyCols.map(col) ++
        batch.columns.toSeq.filterNot(keyCols.contains)
          .map(n => col(n).as(srcCol(n))) :+
        lit(true).as("__s"): _*)
    val joined = tgt.join(src, keyCols, "full_outer")
    def cond(c: Option[DataFrame => Column]): Column =
      c.map(f => coalesce(f(joined), lit(false))).getOrElse(lit(true))
    val matched = joined("__t").isNotNull && joined("__s").isNotNull
    val sourceOnly = joined("__t").isNull
    val targetOnly = joined("__s").isNull

    val matchedDel = actions.matchedDelete.map(c =>
      coalesce(c(joined), lit(false))).getOrElse(lit(false))
    val updCond = cond(actions.matchedUpdateCond)
    val insCond = cond(actions.insertCond)
    val nmbsDel = actions.notMatchedBySourceDelete.map(c =>
      cond(Some(c.getOrElse(_ => lit(true))))).getOrElse(lit(false))

    def updatedValue(n: String): Column = actions.matchedUpdate match {
      case None => joined(n)
      case Some(None) =>
        if (keyCols.contains(n)) joined(n) else joined(srcCol(n))
      case Some(Some(assigns)) =>
        assigns.toMap.get(n).map(_(joined)).getOrElse(joined(n))
    }
    def insertedValue(n: String): Column = actions.insert match {
      case None => lit(null)
      case Some(None) =>
        if (keyCols.contains(n)) joined(n) else joined(srcCol(n))
      case Some(Some(assigns)) =>
        assigns.toMap.get(n).map(_(joined)).getOrElse(
          if (keyCols.contains(n)) joined(n) else joined(srcCol(n)))
    }
    // an UPDATE whose every column is unchanged neither deletes nor
    // appends (idempotent re-merges publish no churn; SQL-visible state
    // is identical, and CDF classifies by value either way)
    val updChanged = names.map(n => updatedValue(n) <=> joined(n))
      .reduce(_ && _).unary_!
    val updates = matched && !matchedDel && updCond &&
      lit(actions.matchedUpdate.isDefined) && updChanged

    val deleteMark =
      (matched && (matchedDel || updates)) || (targetOnly && nmbsDel)
    val appendMark = updates ||
      (sourceOnly && lit(actions.insert.isDefined) && insCond)

    val deleteRows =
      if (positionDeletes) joined.filter(deleteMark)
        .select(joined("__file").as(MorTargetCol),
          joined(PosFrameCol).as(MorPosCol))
      else joined.filter(deleteMark)
        .select(joined("__file").as(MorTargetCol) +:
          names.map(n => joined(n).as(n)): _*)
    val appendRows = joined.filter(appendMark)
      .select(names.map(n =>
        when(matched, updatedValue(n)).otherwise(insertedValue(n)).as(n)): _*)

    val perFile = deleteRows.groupBy(col(MorTargetCol))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val deletedRows = perFile.map(_._2).sum
    val newDeleteFiles =
      if (perFile.isEmpty) Seq.empty[String]
      else if (positionDeletes) writeMorPosDeleteFiles(deleteRows,
        deletedRows, basePath, maxRecordsPerFile)
      else writeMorDeleteFiles(deleteRows, deletedRows, basePath, schema,
        maxRecordsPerFile, statsFields)
    // appended data files carry the table's write-time stats like every
    // other append — mor-merged data must not quietly fall out of the
    // skipping/bloom layer until a compaction
    val newDataFiles = writeTypedFrame(appendRows, basePath, "mormerge",
      schema, partCols, statsFields, maxRecordsPerFile, bucketSpec)
    if (newDeleteFiles.isEmpty && newDataFiles.isEmpty)
      return WeatherLakeV2Sink.MergeStats(0, 0) // true no-op: no commit
    WeatherLakeV2Sink.publishCommit(basePath, "mormerge",
      snapshot = snapshot, supersedes = Seq.empty,
      lines = newDataFiles ++ newDeleteFiles.map(l =>
        s"${WeatherLakeV2Sink.MorDeletePrefix}$l"),
      readDomain = Some(inReadDomain), payload = Some(Payload),
      fileIdentityDependent = true) // see deleteTypedMor's publish note
    WeatherLakeV2Sink.MergeStats(perFile.length,
      newDataFiles.size + newDeleteFiles.size)
  }

  /** MERGE-ON-READ UPDATE — the third mor DML verb: rows where
    * `predicate` is TRUE and at least one assignment actually CHANGES a
    * value emit a delete row (old image) plus an appended new image; no
    * data file is rewritten, nothing is superseded. Identical-value
    * updates publish nothing (idempotent re-runs are free). Semantics
    * otherwise equal [[updateTyped]] (same binding, SQL NULL row-keeping,
    * fail-open prune, partition-column assignments move rows across
    * directories via the appended image's routing).
    */
  def updateTypedMor(spark: SparkSession, basePath: String,
      schema: StructType, partCols: Seq[String],
      predicate: DataFrame => Column,
      assignments: Seq[(String, DataFrame => Column)],
      prune: (Map[String, String], Map[String, FieldStats]) => Boolean =
        (_, _) => true,
      statsFields: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      positionDeletes: Boolean = true,
      bucketSpec: Option[(String, Int)] = None): WeatherLakeV2Sink.UpdateStats = {
    import org.apache.spark.sql.functions.coalesce
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "updateTypedMor")
    val names = schema.fieldNames.toSeq
    assignments.foreach { case (n, _) =>
      require(names.contains(n),
        s"TypedLake: UPDATE assigns unknown column '$n' (schema: " +
          s"${names.mkString(", ")})")
    }
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val committedLines = byManifest.flatMap(_._2)
    def inReadDomain(l: String): Boolean =
      prune(partitionValuesTyped(basePath, entryPath(l)), lineStats(l))
    val candidates = committedLines.collect {
      case l if inReadDomain(l) => entryPath(l)
    }
    if (candidates.isEmpty) return WeatherLakeV2Sink.UpdateStats(0, 0, 0L)
    val liveDeleteLines = morDeleteLinesOf(basePath, snapshot)
    // see deleteTypedMor: the predicate domain prunes delete files too
    val cand = resolvedFramed(spark, basePath, schema, candidates,
      liveDeleteLines, needPos = positionDeletes, lineKeep = inReadDomain)
    val assigned = assignments.toMap
    def newVal(df: DataFrame)(n: String): Column =
      assigned.get(n).map(_(df)).getOrElse(df(n))
    def hit(df: DataFrame) = coalesce(predicate(df), lit(false))
    val changed = names.map(n => newVal(cand)(n) <=> cand(n))
      .reduce(_ && _).unary_!
    val matches = cand.filter(hit(cand) && changed)
    val perFile = matches.groupBy(col("__file"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (perFile.isEmpty) return WeatherLakeV2Sink.UpdateStats(0, 0, 0L)
    val updatedRows = perFile.map(_._2).sum
    val appendRows = matches.select(names.map(n =>
      newVal(matches)(n).as(n)): _*)
    val newDeleteFiles =
      if (positionDeletes) writeMorPosDeleteFiles(matches.select(
        col("__file").as(MorTargetCol), col(PosFrameCol).as(MorPosCol)),
        updatedRows, basePath, maxRecordsPerFile)
      else writeMorDeleteFiles(matches.select(
        col("__file").as(MorTargetCol) +: names.map(col): _*),
        updatedRows, basePath, schema, maxRecordsPerFile, statsFields)
    val newDataFiles = writeTypedFrame(appendRows, basePath, "morupdate",
      schema, partCols, statsFields, maxRecordsPerFile, bucketSpec)
    WeatherLakeV2Sink.publishCommit(basePath, "morupdate",
      snapshot = snapshot, supersedes = Seq.empty,
      lines = newDataFiles ++ newDeleteFiles.map(l =>
        s"${WeatherLakeV2Sink.MorDeletePrefix}$l"),
      readDomain = Some(inReadDomain), payload = Some(Payload),
      fileIdentityDependent = true)
    WeatherLakeV2Sink.UpdateStats(perFile.length,
      newDataFiles.size + newDeleteFiles.size, updatedRows)
  }

  /** RECONCILE: fold every live delete row back into clean data files —
    * rewrite exactly the data files that have applicable delete rows
    * (deletions applied), supersede their manifests plus EVERY live
    * directive-carrying manifest, publish ONE view-preserving commit.
    * After reconcile + vacuum the table is pure copy-on-write again.
    * Returns the number of data files rewritten; a table with no live
    * delete rows publishes nothing. Dangling delete rows (target no
    * longer committed) are consumed without a rewrite.
    */
  def reconcileMor(spark: SparkSession, basePath: String,
      schema: StructType, partCols: Seq[String],
      statsFields: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      bucketSpec: Option[(String, Int)] = None): Int = {
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "reconcileMor")
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val liveDeletes = morDeleteFilesOf(basePath, snapshot)
    if (liveDeletes.isEmpty) return 0
    val committedSet = byManifest.flatMap(_._2).map(entryPath).toSet
    // targets still committed = the files to rewrite (bounded driver
    // metadata: distinct targets ≤ touched files) — both flavors
    val targets = morDeleteTargets(spark, schema, liveDeletes)
      .filter(committedSet).toSeq.sorted
    val morManifests = snapshot.filter(n =>
      WeatherLakeV2Sink.morDirectivesOf(basePath, Seq(n)).nonEmpty)
    val targetSet = targets.toSet
    val touchedManifests = byManifest.collect {
      case (n, ls) if ls.exists(l => targetSet(entryPath(l))) => n
    }
    val supersede = (touchedManifests ++ morManifests).distinct
    // EVERY superseded manifest's untargeted DATA lines are re-listed —
    // a mor-merge manifest is MIXED (appended files + directives): it is
    // superseded for its directives, but its data files live on
    val supersedeSet = supersede.toSet
    val untouched = byManifest
      .filter { case (n, _) => supersedeSet(n) }
      .flatMap(_._2)
      .filterNot(l => targetSet(entryPath(l)))
    val newFiles =
      if (targets.isEmpty) Seq.empty
      else {
        val resolved = applyMorDeletes(spark, schema,
          framedTyped(spark, basePath, schema, targets,
            withPos = liveDeletes.exists(isPosDelete)), liveDeletes)
          .select(schema.fieldNames.toSeq.map(col): _*)
        writeTypedFrame(resolved, basePath, "reconcile", schema, partCols,
          statsFields, maxRecordsPerFile, bucketSpec)
      }
    // every live directive is consumed (all applicable targets rewritten,
    // the rest dangling), so NOTHING is carried over — that is the point.
    // The empty read domain still arms the directive-conflict scan: a mor
    // delete/merge that published since this reconcile's snapshot holds
    // delete rows this rewrite never applied (and whose targets it may
    // have just replaced) — loud conflict, never a silent resurrection.
    WeatherLakeV2Sink.publishCommit(basePath, "reconcile",
      snapshot = snapshot, supersedes = supersede,
      lines = untouched ++ newFiles,
      readDomain = Some(_ => false), payload = Some(Payload))
    targets.size
  }

  /** COMPACT DELETE FILES — rewrite DIRECTIVES, not data (Iceberg's
    * `rewrite_position_delete_files`): consolidate every live delete
    * file into AT MOST ONE position-flavor file (rolled at
    * `maxRecordsPerFile` when positive), CONVERTING equality rows to
    * position form on the way — each still-committed equality old image
    * is resolved to the (file, ordinal) set it kills with ONE bounded
    * framed read of the files it targets (O(targeted files), the
    * split-scan class — never the table). Post-compact a table holds
    * ONLY `part-morpos-*` files, so a read plans ONE anti-join leg no
    * matter how mixed the table's delete history was, and the
    * consolidated footprint is O(16 B/deleted row) even when the
    * equality history carried wide old images. Equality old images read
    * through the NAME MAPPING (widened + coalesced,
    * [[readMorDeletesRenamed]]) so pre-rename delete files convert
    * losslessly — a current-names-only read would null-fill the renamed
    * column and the consolidated subtraction would both resurrect those
    * deletions and kill unrelated null-valued rows. Dangling rows whose
    * target data file is no longer committed drop. ONE manifest
    * supersedes every directive-carrying manifest with its DATA lines
    * re-listed verbatim: ZERO data files rewritten, the committed VIEW
    * unchanged (position form subtracts exactly the rows the equality
    * images matched — the CDF across the commit is empty), data-file
    * identity preserved — concurrent mor publishers tolerate it exactly
    * like checkpoint/measure ([[WeatherLakeV2Sink.publishCommit]]'s
    * `compactdel` classification). At hourly CDC rates this bounds the
    * `_mor_deletes/` population without paying reconcile's data
    * rewrite; vacuum then reclaims the superseded delete files.
    *
    * Returns (live delete files before, after). A table already holding
    * ≤ 1 position-flavor file publishes nothing; ANY live equality file
    * triggers conversion.
    */
  def compactMorDeletes(spark: SparkSession, basePath: String,
      schema: StructType, maxRecordsPerFile: Long = 0L): (Int, Int) = {
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "compactMorDeletes")
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val liveDeleteFiles = morDeleteFilesOf(basePath, snapshot)
    val (posFiles, eqFiles) = liveDeleteFiles.partition(isPosDelete)
    if (eqFiles.isEmpty && posFiles.size <= 1)
      return (liveDeleteFiles.size, liveDeleteFiles.size)
    val session = spark
    import session.implicits._
    // targets resolve against THIS snapshot's committed set; a data file
    // cannot leave it without a commit that either conflicts here
    // (supersede-liveness) or has already applied the deletions
    val committedSet = byManifest.flatMap(_._2).map(entryPath).toSet
    val committedDf = committedSet.toSeq.toDF("__live_file")
    // live position rows pass through, dangling targets dropped
    val posRows =
      if (posFiles.isEmpty) None
      else Some(DriverListing.parquetFrame(spark, posFiles, MorPosSchema)
        .join(broadcast(committedDf),
          col(MorTargetCol) === col("__live_file"), "left_semi"))
    // equality rows RESOLVE to ordinals: frame the still-committed
    // targets with their physical positions and keep exactly the rows
    // some old image kills (file-scoped null-safe equality — the same
    // condition every read's equality leg anti-joins on, so the
    // converted position set subtracts identically by construction)
    val eqRows =
      if (eqFiles.isEmpty) None
      else {
        val del = readMorDeletesRenamed(spark, schema, eqFiles)
        // bounded driver metadata: distinct targets ≤ touched files
        val targets = del.select(col(MorTargetCol)).distinct()
          .collect().map(_.getString(0)).filter(committedSet).toSeq.sorted
        if (targets.isEmpty) None
        else {
          val framed = framedTyped(spark, basePath, schema, targets,
            withPos = true)
          val cond = schema.fieldNames.toSeq
            .map(n => framed(n) <=> del(s"__d_$n"))
            .foldLeft(framed("__file") === del(MorTargetCol))(_ && _)
          Some(framed.join(broadcast(del), cond, "left_semi")
            .select(col("__file").as(MorTargetCol),
              col(PosFrameCol).as(MorPosCol)))
        }
      }
    // an equality image may name a row a live position delete already
    // kills — (target, ordinal) pairs dedup, the view cannot double-drop
    val allRows = (posRows.toSeq ++ eqRows.toSeq)
      .reduceOption(_.unionByName(_)).map(_.distinct())
    val newLines = allRows match {
      case None => Seq.empty
      case Some(rows) =>
        // O(deleted rows) — the artifact being compacted is small by
        // construction; the count sizes the coalesce like every mor write
        val n = rows.count()
        if (n == 0L) Seq.empty
        else writeTypedFrame(
          if (n <= MorDeleteCoalesceRows) rows.coalesce(1) else rows,
          s"$basePath/$MorDeleteDir", "morpos", MorPosSchema, Seq.empty,
          Seq(MorTargetCol), maxRecordsPerFile)
    }
    val directiveManifests = snapshot.filter(n =>
      WeatherLakeV2Sink.morDirectivesOf(basePath, Seq(n)).nonEmpty)
    val dSet = directiveManifests.toSet
    val carried = byManifest
      .filter { case (n, _) => dSet(n) }.flatMap(_._2)
    WeatherLakeV2Sink.publishCommit(basePath, "compactdel",
      snapshot = snapshot, supersedes = directiveManifests,
      lines = carried ++ newLines.map(l =>
        s"${WeatherLakeV2Sink.MorDeletePrefix}$l"),
      payload = Some(Payload))
    (liveDeleteFiles.size, newLines.size)
  }

  // -----------------------------------------------------------------
  // copy-on-write DELETE (typed)
  // -----------------------------------------------------------------

  /** Typed copy-on-write DELETE — [[WeatherLakeV2Sink.deleteCommitted]]'s
    * exact plan shape (driver-side fail-open candidate prune over
    * partition values + entry-line stats; ONE distributed pass counting
    * definite matches per file; survivors rewritten distributed;
    * ONE partially-superseding manifest validated at publish) with the
    * data legs on typed Parquet frames. `predicate` binds over the full
    * table schema; SQL NULL semantics (NULL keeps the row).
    */
  def deleteTyped(spark: SparkSession, basePath: String,
      schema: StructType, partCols: Seq[String],
      predicate: DataFrame => Column,
      prune: (Map[String, String], Map[String, FieldStats]) => Boolean =
        (_, _) => true,
      statsFields: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      bucketSpec: Option[(String, Int)] = None): WeatherLakeV2Sink.DeleteStats = {
    import org.apache.spark.sql.functions.{coalesce, count, not}
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "deleteTyped")
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val committedLines = byManifest.flatMap(_._2)
    def inReadDomain(l: String): Boolean =
      prune(partitionValuesTyped(basePath, entryPath(l)), lineStats(l))
    val candidates = committedLines.collect {
      case l if inReadDomain(l) => entryPath(l)
    }
    if (candidates.isEmpty) return WeatherLakeV2Sink.DeleteStats(0, 0, 0L)
    // every data read resolves through the snapshot's live delete rows
    // (merge-on-read): already-deleted rows neither count nor survive
    val liveDeleteLines = morDeleteLinesOf(basePath, snapshot)
    def resolved(files: Seq[String]): DataFrame =
      resolvedFramed(spark, basePath, schema, files, liveDeleteLines)
    def hit(df: DataFrame) = coalesce(predicate(df), lit(false))
    val cand = resolved(candidates)
    val perFile = cand.filter(hit(cand))
      .groupBy(col("__file")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val touched = perFile.map(_._1).toSeq
    val deletedRows = perFile.map(_._2).sum
    if (touched.isEmpty) return WeatherLakeV2Sink.DeleteStats(0, 0, 0L)
    val touchedSet = touched.toSet
    val touchedManifests = byManifest.collect {
      case (n, ls) if ls.exists(l => touchedSet(entryPath(l))) => n
    }
    val touchedManifestSet = touchedManifests.toSet
    val untouched = byManifest
      .filter { case (n, _) => touchedManifestSet(n) }
      .flatMap(_._2)
      .filterNot(l => touchedSet(entryPath(l)))
    val tf = resolved(touched)
    val survivors = tf.filter(not(hit(tf)))
    val newFiles = writeTypedFrame(survivors, basePath, "delete", schema,
      partCols, statsFields, maxRecordsPerFile, bucketSpec)
    WeatherLakeV2Sink.publishCommit(basePath, "delete", snapshot = snapshot,
      supersedes = touchedManifests,
      // a superseded MIXED manifest's mor directives stay part of the
      // view (their untouched targets still need them); touched-target
      // directives dangle harmlessly
      lines = untouched ++ newFiles ++
        WeatherLakeV2Sink.morDirectivesOf(basePath, touchedManifests),
      readDomain = Some(inReadDomain), payload = Some(Payload))
    WeatherLakeV2Sink.DeleteStats(touched.size, newFiles.size, deletedRows)
  }

  // -----------------------------------------------------------------
  // copy-on-write UPDATE (typed)
  // -----------------------------------------------------------------

  /** Typed copy-on-write UPDATE: rows where `predicate` is TRUE get the
    * `assignments` applied (each maps the framed row to the column's new
    * value; unassigned columns keep their value). Assigning a PARTITION
    * column is supported — the rewrite routes every row by its (possibly
    * new) partition values, so updated rows MOVE directories, which the
    * classic single-payload update could not express.
    */
  def updateTyped(spark: SparkSession, basePath: String,
      schema: StructType, partCols: Seq[String],
      predicate: DataFrame => Column,
      assignments: Seq[(String, DataFrame => Column)],
      prune: (Map[String, String], Map[String, FieldStats]) => Boolean =
        (_, _) => true,
      statsFields: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      bucketSpec: Option[(String, Int)] = None): WeatherLakeV2Sink.UpdateStats = {
    import org.apache.spark.sql.functions.{coalesce, count, when}
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "updateTyped")
    val names = schema.fieldNames.toSeq
    assignments.foreach { case (n, _) =>
      require(names.contains(n),
        s"TypedLake: UPDATE assigns unknown column '$n' (schema: " +
          s"${names.mkString(", ")})")
    }
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val committedLines = byManifest.flatMap(_._2)
    def inReadDomain(l: String): Boolean =
      prune(partitionValuesTyped(basePath, entryPath(l)), lineStats(l))
    val candidates = committedLines.collect {
      case l if inReadDomain(l) => entryPath(l)
    }
    if (candidates.isEmpty) return WeatherLakeV2Sink.UpdateStats(0, 0, 0L)
    val liveDeleteLines = morDeleteLinesOf(basePath, snapshot)
    def resolved(files: Seq[String]): DataFrame =
      resolvedFramed(spark, basePath, schema, files, liveDeleteLines)
    def hit(df: DataFrame) = coalesce(predicate(df), lit(false))
    val cand = resolved(candidates)
    val perFile = cand.filter(hit(cand))
      .groupBy(col("__file")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val touched = perFile.map(_._1).toSeq
    val updatedRows = perFile.map(_._2).sum
    if (touched.isEmpty) return WeatherLakeV2Sink.UpdateStats(0, 0, 0L)
    val touchedSet = touched.toSet
    val touchedManifests = byManifest.collect {
      case (n, ls) if ls.exists(l => touchedSet(entryPath(l))) => n
    }
    val touchedManifestSet = touchedManifests.toSet
    val untouched = byManifest
      .filter { case (n, _) => touchedManifestSet(n) }
      .flatMap(_._2)
      .filterNot(l => touchedSet(entryPath(l)))
    val tf = resolved(touched)
    val assigned = assignments.toMap
    val rewrite = tf.select(names.map { n =>
      assigned.get(n) match {
        case Some(a) => when(hit(tf), a(tf)).otherwise(tf(n)).as(n)
        case None => tf(n)
      }
    }: _*)
    val newFiles = writeTypedFrame(rewrite, basePath, "update", schema,
      partCols, statsFields, maxRecordsPerFile, bucketSpec)
    WeatherLakeV2Sink.publishCommit(basePath, "update", snapshot = snapshot,
      supersedes = touchedManifests,
      lines = untouched ++ newFiles ++
        WeatherLakeV2Sink.morDirectivesOf(basePath, touchedManifests),
      readDomain = Some(inReadDomain), payload = Some(Payload))
    WeatherLakeV2Sink.UpdateStats(touched.size, newFiles.size, updatedRows)
  }

  // -----------------------------------------------------------------
  // copy-on-write MERGE (typed)
  // -----------------------------------------------------------------

  /** What a typed MERGE does per action class; every condition/assignment
    * binds over the JOINED frame, where target columns appear under their
    * own names and source columns under [[srcCol]]'s `__s_`-prefixed
    * names (key columns are the coalesced join keys).
    *
    *  - `matchedDelete` — `WHEN MATCHED [AND cond] THEN DELETE`;
    *  - `matchedUpdate` — `WHEN MATCHED [AND cond] THEN UPDATE SET …`;
    *    `None` assignments = `UPDATE SET *` (replace every data column
    *    with the source's);
    *  - `insert` — `WHEN NOT MATCHED [AND cond] THEN INSERT …`; `None`
    *    assignments = `INSERT *`;
    *  - `notMatchedBySourceDelete` — `WHEN NOT MATCHED BY SOURCE [AND
    *    cond] THEN DELETE`, the full-sync clause: target rows with no
    *    source match are deleted where the condition holds (condition
    *    over TARGET columns only — there is no source row to reference).
    *
    * Action order is SQL's: for a matched row, delete-then-update in the
    * order given; conditions are evaluated with SQL three-valued logic
    * (NULL = action does not apply, the next one is tried).
    */
  final case class TypedMergeActions(
      matchedDelete: Option[DataFrame => Column] = None,
      matchedUpdate: Option[Option[Seq[(String, DataFrame => Column)]]] = None,
      matchedUpdateCond: Option[DataFrame => Column] = None,
      insert: Option[Option[Seq[(String, DataFrame => Column)]]] = None,
      insertCond: Option[DataFrame => Column] = None,
      notMatchedBySourceDelete: Option[Option[DataFrame => Column]] = None)

  /** Source-column name on the joined merge frame. */
  def srcCol(name: String): String = s"__s_$name"

  /** Typed copy-on-write MERGE. `keyCols` are the ON-equality columns
    * (same name both sides — the standard upsert key); `batch` must carry
    * every table column (for INSERT *) under the table's names and be
    * key-unique.
    *
    * Read domain and candidate pruning: when every partition column is a
    * key column and no NOT-MATCHED-BY-SOURCE action exists, candidates
    * prune to the batch's distinct partition tuples (the classic merge's
    * partition-immutability contract); otherwise the domain is the whole
    * table — full-sync semantics genuinely read everything, and a key
    * that does not determine the partition cannot rule any file out.
    */
  def mergeTyped(spark: SparkSession, basePath: String,
      schema: StructType, partCols: Seq[String],
      batch: DataFrame, keyCols: Seq[String],
      actions: TypedMergeActions = TypedMergeActions(
        matchedUpdate = Some(None), insert = Some(None)),
      statsFields: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      bucketSpec: Option[(String, Int)] = None): WeatherLakeV2Sink.MergeStats = {
    import org.apache.spark.sql.functions.{coalesce, when}
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "mergeTyped")
    val names = schema.fieldNames.toSeq
    require(keyCols.nonEmpty && keyCols.forall(names.contains),
      s"TypedLake: merge key columns (${keyCols.mkString(", ")}) must be " +
        s"table columns (${names.mkString(", ")})")
    val dataCols = names.filterNot(keyCols.contains)
    val fullSync = actions.notMatchedBySourceDelete.isDefined

    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val committedLines = byManifest.flatMap(_._2)
    val committed = committedLines.map(entryPath)

    // ---- read domain / candidate pruning (driver, O(files) metadata)
    val partitionPrunable =
      partCols.nonEmpty && partCols.forall(keyCols.contains) && !fullSync
    val batchParts: Set[Seq[String]] =
      if (!partitionPrunable) Set.empty
      else batch.select(partCols.map(c =>
          col(c).cast(StringType)).toSeq: _*)
        .distinct().collect()
        .map(r => partCols.indices.map(i => r.getString(i)).toSeq).toSet
    def inReadDomain(line: String): Boolean =
      if (!partitionPrunable) true
      else {
        val pv = partitionValuesTyped(basePath, entryPath(line))
        val tuple = partCols.map(pv.get)
        if (tuple.exists(_.isEmpty)) true // can't rule out, fail open
        else batchParts(tuple.map(_.get))
      }
    val candidates = committed.filter(inReadDomain)

    // ---- one distributed pass: which candidate files are touched
    val liveDeleteLines = morDeleteLinesOf(basePath, snapshot)
    def resolved(files: Seq[String]): DataFrame =
      resolvedFramed(spark, basePath, schema, files, liveDeleteLines)
    val batchKeys = batch.select(keyCols.map(col).toSeq: _*).distinct()
    val touched: Seq[String] =
      if (candidates.isEmpty) Seq.empty
      else if (fullSync) candidates // full-sync rewrites its whole domain
      else {
        // no broadcast hint: the merge source can be arbitrarily large
        // (CDC backfills), and a forced broadcast of its whole key set
        // would OOM the driver — AQE elects broadcast when small
        val cand = resolved(candidates)
        cand.join(batchKeys, keyCols, "left_semi")
          .select(col("__file")).distinct()
          .collect().map(_.getString(0)).toSeq
      }
    val touchedSet = touched.toSet
    val touchedManifests = byManifest.collect {
      case (n, ls) if ls.exists(l => touchedSet(entryPath(l))) => n
    }
    val touchedManifestSet = touchedManifests.toSet
    val untouched = byManifest
      .filter { case (n, _) => touchedManifestSet(n) }
      .flatMap(_._2)
      .filterNot(l => touchedSet(entryPath(l)))

    // ---- relational rewrite: target rows of touched files ⟗ batch
    // (MOR-resolved: a delete-vectored row must not present as matched —
    // its key has to INSERT, not update a ghost)
    val tgt = resolved(touched).drop("__file")
      .withColumn("__t", lit(true))
    // EVERY non-key batch column rides prefixed — extra source columns
    // (CDC op markers etc.) are legal condition inputs in SQL MERGE
    val src = batch
      .select(keyCols.map(col) ++
        batch.columns.toSeq.filterNot(keyCols.contains)
          .map(n => col(n).as(srcCol(n))) :+
        lit(true).as("__s"): _*)
    val joined = tgt.join(src, keyCols, "full_outer")
    def cond(c: Option[DataFrame => Column]): Column =
      c.map(f => coalesce(f(joined), lit(false))).getOrElse(lit(true))
    val matched = joined("__t").isNotNull && joined("__s").isNotNull
    val sourceOnly = joined("__t").isNull
    val targetOnly = joined("__s").isNull

    // per-column value of the output row, action semantics in ONE
    // codegen'd when-chain per column (no per-action passes)
    val matchedDel = actions.matchedDelete.map(c =>
      matched && coalesce(c(joined), lit(false)))
    val updCond = cond(actions.matchedUpdateCond)
    val insCond = cond(actions.insertCond)
    val nmbsDel = actions.notMatchedBySourceDelete.map(c =>
      targetOnly && cond(Some(c.getOrElse(_ => lit(true)))))

    def updatedValue(n: String): Column = actions.matchedUpdate match {
      case None => joined(n) // no update action: keep the target value
      case Some(None) => // UPDATE SET *: replace data cols by source
        if (keyCols.contains(n)) joined(n) else joined(srcCol(n))
      case Some(Some(assigns)) =>
        assigns.toMap.get(n).map(_(joined)).getOrElse(joined(n))
    }
    def insertedValue(n: String): Column = actions.insert match {
      case None => lit(null) // row dropped below; placeholder
      case Some(None) =>
        if (keyCols.contains(n)) joined(n) else joined(srcCol(n))
      case Some(Some(assigns)) =>
        assigns.toMap.get(n).map(_(joined)).getOrElse(
          if (keyCols.contains(n)) joined(n) else joined(srcCol(n)))
    }

    val keepRow =
      when(matched,
        matchedDel.map(d => !when(d, lit(true)).otherwise(lit(false)))
          .getOrElse(lit(true)))
      .when(sourceOnly, lit(actions.insert.isDefined) && insCond)
      .otherwise( // target only
        nmbsDel.map(d => !when(d, lit(true)).otherwise(lit(false)))
          .getOrElse(lit(true)))
    val outCols = names.map { n =>
      when(matched,
        when(matchedDel.getOrElse(lit(false)), joined(n)) // dropped anyway
          .when(updCond, updatedValue(n))
          .otherwise(joined(n)))
      .when(sourceOnly, insertedValue(n))
      .otherwise(joined(n))
      .as(n)
    }
    val rewrite = joined.filter(keepRow).select(outCols: _*)
    val newFiles = writeTypedFrame(rewrite, basePath, "merge", schema,
      partCols, statsFields, maxRecordsPerFile, bucketSpec)
    WeatherLakeV2Sink.publishCommit(basePath, "merge", snapshot = snapshot,
      supersedes = touchedManifests,
      lines = untouched ++ newFiles ++
        WeatherLakeV2Sink.morDirectivesOf(basePath, touchedManifests),
      readDomain = Some(inReadDomain), payload = Some(Payload))
    WeatherLakeV2Sink.MergeStats(touched.size, newFiles.size)
  }

  // -----------------------------------------------------------------
  // change-data feed (typed, snapshot-diff)
  // -----------------------------------------------------------------

  /** CHANGE DATA FEED between two captured snapshots of a typed table —
    * [[WeatherLakeV2Sink.changesBetween]]'s semantics on typed frames,
    * derived from the copy-on-write commit structure (no written change
    * files needed): rows are compared only inside the file-set
    * DIFFERENCE, so the cost is O(changed files), never O(table).
    * `keyCols` is the row identity (unique per snapshot). Returns the
    * table columns plus `_change` ∈ insert / delete / update_preimage /
    * update_postimage; a copy-on-write survivor rewrite (same key, all
    * columns equal) emits nothing.
    */
  def changesBetweenTyped(spark: SparkSession, basePath: String,
      schema: StructType, keyCols: Seq[String],
      from: Seq[String], to: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{array, explode, struct, when}
    val names = schema.fieldNames.toSeq
    require(keyCols.nonEmpty && keyCols.forall(names.contains),
      s"TypedLake: CDF key columns (${keyCols.mkString(", ")}) must be " +
        s"table columns (${names.mkString(", ")})")
    val dataCols = names.filterNot(keyCols.contains)
    val fromFiles = WeatherLakeV2Sink.filesAsOf(basePath, from).toSet
    val toFiles = WeatherLakeV2Sink.filesAsOf(basePath, to).toSet
    val fromDeleteLines = WeatherLakeV2Sink.morDeleteLinesAsOf(basePath, from)
    val toDeleteLines = WeatherLakeV2Sink.morDeleteLinesAsOf(basePath, to)
    val fromDeletes = fromDeleteLines.map(entryPath)
    val toDeletes = toDeleteLines.map(entryPath)
    val removed = (fromFiles -- toFiles).toSeq.sorted
    val added = (toFiles -- fromFiles).toSeq.sorted
    // MERGE-ON-READ widening: a mor delete changes NO file set — its
    // effect lives in the delete-file DIFFERENCE. Files present on BOTH
    // sides whose applicable delete rows changed are re-read on both
    // sides (each side resolved through ITS OWN delete set) and
    // key-diffed like rewritten files; cost stays O(changed files +
    // delete bytes), never O(table).
    val deleteDiff = ((fromDeletes.toSet -- toDeletes.toSet) ++
      (toDeletes.toSet -- fromDeletes.toSet)).toSeq.sorted
    val changedTargets: Seq[String] =
      if (deleteDiff.isEmpty) Seq.empty
      else morDeleteTargets(spark, schema, deleteDiff)
        .filter(t => fromFiles(t) && toFiles(t)).toSeq.sorted
    def resolvedSide(files: Seq[String], deleteLines: Seq[String]): DataFrame =
      readResolvedSplit(spark, basePath, schema, files, deleteLines)
    def tagged(df: DataFrame, change: String): DataFrame =
      df.select(lit(change).as("_change") +: names.map(col): _*)
    val oldOnlyEmpty = removed.isEmpty && changedTargets.isEmpty
    val newOnlyEmpty = added.isEmpty && changedTargets.isEmpty
    if (oldOnlyEmpty && newOnlyEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(StructField("_change", StringType, nullable = false) +:
          schema.fields))
    else if (oldOnlyEmpty)
      tagged(resolvedSide(added, toDeleteLines), "insert")
    else if (newOnlyEmpty)
      tagged(resolvedSide(removed, fromDeleteLines), "delete")
    else {
      def side(files: Seq[String], deleteLines: Seq[String], tag: String): DataFrame =
        resolvedSide(files, deleteLines).select(
          keyCols.map(col) :+
            struct(names.map(col): _*).as(s"__row_$tag"): _*)
      val joined = side(removed ++ changedTargets, fromDeleteLines, "old")
        .join(side(added ++ changedTargets, toDeleteLines, "new"),
          keyCols, "full_outer")
      val old = col("__row_old"); val neu = col("__row_new")
      // all-column equality decides "changed" — dataCols compared
      // null-safely; key-only rows (no data columns) never differ
      val same = dataCols.map(c => old(c) <=> neu(c))
        .foldLeft(lit(true))(_ && _)
      joined.select(explode(
          when(old.isNull,
            array(struct(lit("insert").as("change"), neu.as("row"))))
          .when(neu.isNull,
            array(struct(lit("delete").as("change"), old.as("row"))))
          .when(!same, array(
            struct(lit("update_preimage").as("change"), old.as("row")),
            struct(lit("update_postimage").as("change"), neu.as("row"))))
          .otherwise(array())).as("c"))
        .select(col("c.change").as("_change") +:
          names.map(n => col(s"c.row.$n").as(n)): _*)
    }
  }

  /** Incremental typed CHANGE feed over a manifest cursor —
    * [[WeatherLakeV2Sink.readNewChanges]]' contract on typed frames: the
    * exact NET row deltas between the consumer's integrated view and the
    * view after the fresh commits (several commits collapse to their net
    * effect; layout-only rewrites emit nothing). Returns (changes frame,
    * the live resolution of the new view-set) — process, then
    * [[WeatherLakeV2Sink.replaceCursor]] with the returned set; an
    * unreplaced cursor re-derives the same delta (never skips), and a
    * caught-up consumer survives routine vacuum.
    */
  def readNewChangesTyped(spark: SparkSession, basePath: String,
      schema: StructType, keyCols: Seq[String], cursorPath: String):
      (DataFrame, Seq[String]) = {
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "readNewChangesTyped")
    val consumed = WeatherLakeV2Sink.consumedManifests(cursorPath).toSeq.sorted
    // every manifest since the cursor, including already-superseded
    // intermediates: they carry the supersedes CHAIN that tombstones the
    // consumer's old manifests inside the `to` resolution (the classic
    // reader's double-count rule, spec-pinned there)
    val fresh = WeatherLakeV2Sink.manifestNames(basePath)
      .filterNot(consumed.toSet)
    val to = (consumed ++ fresh).distinct
    (changesBetweenTyped(spark, basePath, schema, keyCols,
      from = consumed, to = to),
      WeatherLakeV2Sink.liveWithinForTyped(basePath, to))
  }

  // -----------------------------------------------------------------
  // maintenance (typed)
  // -----------------------------------------------------------------

  /** Typed stats backfill — [[WeatherLakeV2Sink.measureStats]]'s role
    * (ANALYZE: stats live in manifest entry lines, so re-measuring is a
    * metadata-only commit) with the measurement as ONE distributed
    * aggregation over the typed columns: per-file min/max via
    * `groupBy(input_file_name)`, numeric comparison domain decided by the
    * column TYPE (not per-value parsing — the typed schema already knows).
    */
  def measureStatsTyped(spark: SparkSession, basePath: String,
      schema: StructType, fields: Seq[String]): Int = {
    import org.apache.spark.sql.functions.{max, min}
    require(fields.nonEmpty,
      "measureStatsTyped needs at least one column name to measure")
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "measureStatsTyped")
    val names = schema.fieldNames.toSeq
    fields.foreach { f =>
      require(names.contains(f),
        s"TypedLake: measure of unknown column '$f' (schema: " +
          s"${names.mkString(", ")})")
    }
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val lines = byManifest.flatMap(_._2)
    if (lines.isEmpty) return 0
    val files = lines.map(entryPath)
    val numericOf = fields.map(f =>
      f -> schema(f).dataType.isInstanceOf[NumericType]).toMap
    // aggregate the NATIVE values and render driver-side with the
    // writer's exact canonical cast (`Cast(x AS STRING)` with the zone
    // PINNED to UTC — statsProj's rendering). A DataFrame-level
    // `.cast(StringType)` renders timestamps in the SESSION zone, so a
    // non-UTC session's ANALYZE would write endpoints in a different
    // domain than the write-time stats, the pruning layer's render()
    // and the manifest-stats answer path (all UTC-pinned) — silently
    // unsound pruning and wrong manifest-answered aggregates there.
    val aggs = fields.flatMap(f => Seq(
      min(col(f)).as(s"__min_$f"), max(col(f)).as(s"__max_$f")))
    def canon(v: Any): Option[String] = Option(v).flatMap { x =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(x)
      Option(Cast(lit, StringType, Some("UTC")).eval(null)).map(_.toString)
    }
    val perFile = framedTyped(spark, basePath, schema, files)
      .groupBy(col("__file")).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val stats = fields.zipWithIndex.flatMap { case (f, i) =>
          val mn = canon(r.get(1 + 2 * i))
          val mx = canon(r.get(2 + 2 * i))
          (mn, mx) match {
            case (Some(lo), Some(hi)) =>
              // NaN poisons a numeric range (the engine orders NaN
              // greatest and NaN = NaN holds, so no finite endpoint
              // witnesses NaN rows): emit no stats for the field — fail
              // open (FieldAcc applies the same rule at write time)
              if (numericOf(f) && (lo == "NaN" || hi == "NaN")) None
              else Some(f -> FieldStats(lo, hi, numericOf(f)))
            case _ => None
          }
        }.toMap
        r.getString(0) -> stats
      }.toMap // O(files x fields) driver metadata, the manifest-read class
    val newLines = lines.map { l =>
      val p = entryPath(l)
      val merged = lineStats(l) ++ perFile.getOrElse(manifestJoinKey(p),
        perFile.getOrElse(p, Map.empty))
      if (merged.isEmpty) p else s"$p\t${statsToJson(merged)}"
    }
    // stats are measured from FILE bytes, mor-unresolved — sound (a
    // superset's min/max bounds the resolved rows); the directives
    // themselves MUST ride the rollup or deleted rows would resurrect
    WeatherLakeV2Sink.publishCommit(basePath, "measure", snapshot = snapshot,
      supersedes = snapshot,
      lines = newLines ++ WeatherLakeV2Sink.morDirectivesOf(basePath, snapshot),
      payload = Some(Payload))
    files.size
  }

  /** Typed small-file compaction — the classic [[WeatherLakeV2Sink
    * .compact]] candidacy rule (directories with >1 file under half the
    * byte target; `clusterExpr` widens candidacy and sorts-within for
    * the OPTIMIZE ZORDER move) with the rewrite on typed frames. Rolls
    * at `maxRecordsPerFile` when positive.
    */
  /** BUCKET-PRESERVING compaction for hash-bucketed tables: every
    * append lands one file per bucket, so after k inserts each bucket
    * holds k small files — exactly the population a log-structured
    * append table needs folded. Candidacy per BUCKET (more than one
    * file, or any unmarked stray); each candidate bucket's rows rewrite
    * through the bucket-routing writer (markers preserved — the
    * storage-partitioned join layout survives), one partially-
    * superseding commit. Unmarked files (pre-bucketing adoption,
    * foreign writers) are folded INTO their hash bucket, upgrading the
    * table back to the zero-exchange join layout. Bucketed tables take
    * the FULL DML surface including `dmlMode = 'mor'`, so victims are
    * read MOR-RESOLVED (live deletions applied — a bucket's compaction
    * doubles as its reconcile, same as [[compactTyped]]) and the touched
    * manifests' `#mordelete` directives ride the superseding commit
    * verbatim — deletions against UNTOUCHED buckets' files must stay
    * live, never silently dropped. Returns the number of compacted
    * buckets.
    */
  def compactTypedBucketed(spark: SparkSession, basePath: String,
      schema: StructType, bucketCol: String, numBuckets: Int,
      statsFields: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      priorCount: Option[Int] = None): Int = {
    WeatherLakeV2Sink.requirePayload(basePath, Payload,
      "compactTypedBucketed")
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val files = byManifest.flatMap(_._2).map(entryPath)
    val tagged = files.map(f => f -> bucketGenOfFile(f))
    // a file's bucket GENERATION: the stamped count, else the table's
    // pre-evolution count (legacy markers), else the current count
    def genOf(cnt: Option[Int]): Int =
      cnt.orElse(priorCount).getOrElse(numBuckets)
    // candidates: unmarked strays (re-bucketing restores the layout),
    // WRONG-GENERATION files (a bucket-count evolution's migration —
    // the rewrite routes their rows by the CURRENT hash, so one compact
    // returns the table to a uniform generation and the zero-exchange
    // join layout), and current-generation buckets holding >1 file
    val strays = tagged.collect { case (f, None) => f }
    val wrongGen = tagged.collect {
      case (f, Some((_, cnt))) if genOf(cnt) != numBuckets => f
    }
    val multi = tagged.collect {
      case (f, Some((b, cnt))) if genOf(cnt) == numBuckets => b -> f
    }.groupBy(_._1).collect {
      case (b, fs) if fs.size > 1 => b -> fs.map(_._2)
    }
    if (strays.isEmpty && wrongGen.isEmpty && multi.isEmpty) return 0
    val victims = (multi.values.flatten ++ strays ++ wrongGen).toSeq
    val victimSet = victims.toSet
    val touchedManifests = byManifest.collect {
      case (n, ls) if ls.exists(l => victimSet(entryPath(l))) => n
    }
    val touchedSet = touchedManifests.toSet
    val keep = byManifest
      .filter { case (n, _) => touchedSet(n) }
      .flatMap(_._2)
      .filterNot(l => victimSet(entryPath(l)))
    // victims read MOR-RESOLVED: a bucketed table with dmlMode='mor'
    // holds live delete files, and rewriting raw file bytes would bake
    // resurrected ghost rows into new files no delete targets
    val rows = readResolvedSplit(spark, basePath, schema, victims,
      morDeleteLinesOf(basePath, snapshot))
    // route through the bucket writer: one task per bucket, markers on
    val base = basePath; val sch = schema; val sf = statsFields
    val mrpf = maxRecordsPerFile; val bc = bucketCol; val n = numBuckets
    val bucketExpr = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.hash(col(bc)), lit(n))
    val newFiles = rows.select(schema.fieldNames.map(col).toSeq: _*)
      .repartition(n, bucketExpr)
      .queryExecution.toRdd.mapPartitions { it =>
        val w = new TypedTaskWriter(base, "compact", sch, Seq.empty, sf,
          mrpf, bucketSpec = Some((bc, n)))
        try { it.foreach(w.write); w.closeAll().iterator }
        catch { case e: Throwable => w.abortAll(); throw e }
      }.collect().toSeq
    // directives of TOUCHED manifests re-list verbatim (compactTyped's
    // rule): a delete may target an UNTOUCHED bucket's file whose only
    // live listing rides a manifest this rewrite supersedes — dropping
    // the directive would resurrect those deletions table-wide
    WeatherLakeV2Sink.publishCommit(basePath, "compact",
      snapshot = snapshot, supersedes = touchedManifests,
      lines = keep ++ newFiles ++
        WeatherLakeV2Sink.morDirectivesOf(basePath, touchedManifests),
      readDomain = Some(_ => false), payload = Some(Payload))
    multi.size + (if (strays.nonEmpty) 1 else 0) +
      (if (wrongGen.nonEmpty) 1 else 0)
  }

  def compactTyped(spark: SparkSession, basePath: String,
      schema: StructType, partCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024,
      clusterExpr: Option[DataFrame => Column] = None,
      statsFields: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    WeatherLakeV2Sink.requirePayload(basePath, Payload, "compactTyped")
    val fs = new Path(basePath).getFileSystem(LakeIO.conf)
    val snapshot = WeatherLakeV2Sink.liveManifests(basePath)
    val byManifest = WeatherLakeV2Sink.entryLinesByManifest(basePath, snapshot)
    val entriesByDir = byManifest.flatMap(_._2)
      .groupBy(l => new Path(entryPath(l)).getParent.toString)
    // NAME-MAPPING STATS MIGRATION: post-rename, files written under a
    // historical spelling carry their per-file stats under the OLD key,
    // so predicate pruning on the renamed column fails open for them
    // forever. A file whose entry-line stats use a historical spelling
    // is a compaction candidate regardless of size — the rewrite lands
    // under the CURRENT schema with stats re-measured under the current
    // name, and pruning returns as maintenance proceeds (the rename
    // itself stays metadata-only; this is the lazy migration).
    val histSpellings = historicalNames(schema).values.flatten
      .map(_.toLowerCase).toSet
    def oldSpelling(line: String): Boolean =
      histSpellings.nonEmpty &&
        lineStats(line).keysIterator.exists(k => histSpellings(k.toLowerCase))
    val multi = entriesByDir.view.filter {
      case (_, ls) =>
        val fls = ls.map(entryPath)
        val sizes = fls.map(f => fs.getFileStatus(new Path(f)).getLen)
        ls.exists(oldSpelling) || {
          if (clusterExpr.isDefined) fls.size > 1 || sizes.sum > targetBytes
          else fls.size > 1 && sizes.sum.toDouble / fls.size < targetBytes / 2.0
        }
    }.mapValues(_.map(entryPath)).toMap
    if (multi.isEmpty) return 0
    val compactedDirs = multi.keySet
    def inCompactedDir(l: String): Boolean =
      compactedDirs(new Path(entryPath(l)).getParent.toString)
    val touchedManifests = byManifest.collect {
      case (n, ls) if ls.exists(inCompactedDir) => n
    }
    val touchedManifestSet = touchedManifests.toSet
    val keep = byManifest
      .filter { case (n, _) => touchedManifestSet(n) }
      .flatMap(_._2)
      .filterNot(inCompactedDir)
    // compaction reads MOR-RESOLVED rows (deletions applied), so
    // compacting a directory doubles as its reconcile; the affected
    // delete rows dangle afterwards and vacuum/reconcile clears them
    val liveDeleteLines = morDeleteLinesOf(basePath, snapshot)
    val rows = readResolvedSplit(spark, basePath, schema,
      multi.values.flatten.toSeq, liveDeleteLines)
    // honor targetBytes in the OUTPUT too, not only in candidacy: the
    // typed task writer rolls on maxRecordsPerFile alone, so without a
    // cap a clustered compaction would write ONE unbounded file per
    // partition per task — inert file-list pruning (one file spans the
    // whole key range) and an over-target file at scale. When the caller
    // set no explicit cap, derive one from the candidates' own
    // bytes-per-row (same format + compression in and out, so the
    // estimate tracks): cap = targetBytes / (inputBytes / inputRows).
    // Row counts come from the candidates' PARQUET FOOTERS — driver
    // metadata in the same class as the size stat, never a data pass
    // (a full count() would double compaction's dominant IO). Footer
    // counts ignore mor-resolved deletions, which only makes the cap
    // conservative (slightly larger files cannot result).
    val effectiveMrpf: Long =
      if (maxRecordsPerFile > 0) maxRecordsPerFile
      else {
        val inputBytes = multi.values.flatten
          .map(f => fs.getFileStatus(new Path(f)).getLen).sum
        if (inputBytes <= targetBytes) 0L // can't exceed the target anyway
        else {
          val conf = LakeIO.conf
          val inputRows = multi.values.flatten.map { f =>
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                new Path(f), conf))
            try r.getRecordCount finally r.close()
          }.sum
          if (inputRows <= 0) 0L
          else math.max(1L,
            (targetBytes.toDouble / (inputBytes.toDouble / inputRows)).toLong)
        }
      }
    val arranged = clusterExpr match {
      case Some(e) if partCols.nonEmpty =>
        rows.repartition(partCols.map(col): _*)
          .sortWithinPartitions(partCols.map(col) :+ e(rows): _*)
      case Some(e) => rows.repartition(1).sortWithinPartitions(e(rows))
      case None => rows
    }
    // writeTypedFrame re-shuffles only when clusterExpr is absent (its
    // own repartition); for clustered runs write the arranged frame
    // directly so the sort survives into the rolled files
    val newFiles =
      if (clusterExpr.isDefined) {
        val base = basePath; val sch = schema; val pc = partCols
        val sf = statsFields; val mrpf = effectiveMrpf
        arranged.select(schema.fieldNames.map(col).toSeq: _*)
          .queryExecution.toRdd.mapPartitions { it =>
            val w = new TypedTaskWriter(base, "compact", sch, pc, sf, mrpf)
            try { it.foreach(w.write); w.closeAll().iterator }
            catch { case e: Throwable => w.abortAll(); throw e }
          }.collect().toSeq
      } else writeTypedFrame(rows, basePath, "compact", schema, partCols,
        statsFields, effectiveMrpf)
    // the empty read domain arms the directive-conflict scan: a mor
    // delete/merge publishing since this compaction's snapshot targets
    // data-file paths this rewrite may have just replaced — loud
    // conflict instead of silently resurrecting its deletions
    WeatherLakeV2Sink.publishCommit(basePath, "compact", snapshot = snapshot,
      supersedes = touchedManifests,
      lines = keep ++ newFiles ++
        WeatherLakeV2Sink.morDirectivesOf(basePath, touchedManifests),
      readDomain = Some(_ => false), payload = Some(Payload))
    multi.size
  }
}
