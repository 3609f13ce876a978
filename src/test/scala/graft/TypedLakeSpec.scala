package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** The typed, Parquet-backed lake: arbitrary user schemas under the SAME
  * manifest layer (FORMAT.md v2 — `#format 2` + `#payload parquet`).
  */
class TypedLakeSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("region", StringType, nullable = false),
    StructField("day", DateType, nullable = false)))
  private val partCols = Seq("region", "day")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, s"name-$i", i * 1.5, s"r${i % 3}",
        java.sql.Date.valueOf(if (i % 2 == 0) "2024-01-01" else "2024-01-02"))
    }.toDF("id", "name", "score", "region", "day")
  }

  private def state(lake: String): Map[Long, (String, Double)] =
    TypedLake.readCommittedTyped(spark, lake, schema)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap

  test("typed append + read round-trips every column through Parquet " +
      "files under k=v partition directories, with per-file stats from " +
      "typed values in the manifest entry lines") {
    val lake = tmp("typedlake")
    TypedLake.appendTyped(spark, lake, rows(20), schema, partCols,
      statsFields = Seq("id", "name"), manifestId = Some("base"))
    // exactly-once: the replay short-circuits (same manifestId)
    TypedLake.appendTyped(spark, lake, rows(20), schema, partCols,
      statsFields = Seq("id"), manifestId = Some("base"))
    val back = TypedLake.readCommittedTyped(spark, lake, schema)
    assert(back.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(back.count() == 20)
    val r7 = back.filter(col("id") === 7).collect().head
    assert(r7.getString(1) == "name-7" && r7.getDouble(2) == 10.5 &&
      r7.getString(3) == "r1" &&
      r7.getDate(4) == java.sql.Date.valueOf("2024-01-02"))
    // files are Parquet under hive-style partition dirs
    val files = WeatherLakeV2Sink.committedFiles(lake)
    assert(files.nonEmpty && files.forall(_.endsWith(".parquet")))
    assert(files.forall(f => f.contains("region=") && f.contains("day=")))
    // manifest stamps #format 2 + #payload parquet; v1 sees version 2
    assert(WeatherLakeV2Sink.payloadFormat(lake) == "parquet")
    // per-file stats came from the typed columns (numeric id range)
    val stats = WeatherLakeV2Sink.committedEntryLines(lake)
      .map(WeatherLakeV2Sink.lineStats)
    assert(stats.forall(_.contains("id")))
    assert(stats.forall(_.get("id").exists(_.numeric)))
    assert(stats.forall(_.get("name").exists(!_.numeric)))
    // a read pruned by the id stats opens only matching files
    val lo = stats.map(_("id").min.toDouble).min
    assert(lo == 0.0)
  }

  test("the payload gate is loud BOTH ways: JSON-line readers refuse a " +
      "typed lake, typed readers refuse a classic lake, and a mixed " +
      "publish is refused") {
    val lake = tmp("typedlakeguard")
    TypedLake.appendTyped(spark, lake, rows(5), schema, partCols)
    val e1 = intercept[IllegalStateException] {
      WeatherLakeV2Sink.readCommitted(spark, lake)
    }
    assert(e1.getMessage.contains("parquet"), e1.getMessage)
    // view face refuses too (it would scan Parquet bytes as text)
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.WeatherLakeV2StreamSource")
        .option("path", lake).load().collect()
    }
    assert(e2.getMessage != null)
    // classic append into the typed lake is refused at publish
    val s = spark
    import s.implicits._
    val e3 = intercept[Exception] {
      Seq(("a", "2024-01-01", "00", """{"k":1}"""))
        .toDF("city", "ds", "hour", "raw_json")
        .write.format("graft.sources.WeatherLakeV2Sink")
        .mode("append").save(lake)
    }
    val chain = Iterator.iterate(e3: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("payload") || chain.contains("parquet"), chain)
    // and the typed reader refuses a classic lake
    val classic = tmp("classiclake")
    Seq(("a", "2024-01-01", "00", """{"k":1}"""))
      .toDF("city", "ds", "hour", "raw_json")
      .write.format("graft.sources.WeatherLakeV2Sink")
      .mode("append").save(classic)
    val e4 = intercept[IllegalStateException] {
      TypedLake.readCommittedTyped(spark, classic, schema)
    }
    assert(e4.getMessage.contains("json"), e4.getMessage)
  }

  test("typed DELETE: copy-on-write with partial superseding, NULL " +
      "predicate keeps the row, partition prune skips foreign files") {
    val lake = tmp("typedlakedel")
    TypedLake.appendTyped(spark, lake, rows(20), schema, partCols,
      statsFields = Seq("id"))
    val st = TypedLake.deleteTyped(spark, lake, schema, partCols,
      predicate = df => df("id") % 4 === 1,
      statsFields = Seq("id"))
    assert(st.deletedRows == 5, st)
    assert(state(lake).keySet == (0 until 20).filter(_ % 4 != 1)
      .map(_.toLong).toSet)
    // NULL predicate keeps rows: score > X where score is null for none
    // here, so use a predicate NULL on some rows via nullif
    val st2 = TypedLake.deleteTyped(spark, lake, schema, partCols,
      predicate = df => nullif(df("name"), lit("name-2")) === "name-6")
    assert(st2.deletedRows == 1) // name-2 row: NULL predicate → kept
    assert(state(lake).contains(2L) && !state(lake).contains(6L))
    // a no-match delete publishes nothing
    val before = WeatherLakeV2Sink.manifestNames(lake).size
    val st3 = TypedLake.deleteTyped(spark, lake, schema, partCols,
      predicate = df => df("id") === -999L)
    assert(st3.touchedFiles == 0 &&
      WeatherLakeV2Sink.manifestNames(lake).size == before)
  }

  test("typed UPDATE: multi-column assignments, rows keep unassigned " +
      "columns, and assigning a PARTITION column moves the row's " +
      "directory") {
    val lake = tmp("typedlakeupd")
    TypedLake.appendTyped(spark, lake, rows(12), schema, partCols)
    val st = TypedLake.updateTyped(spark, lake, schema, partCols,
      predicate = df => df("id") % 3 === 0,
      assignments = Seq(
        "score" -> (df => df("score") * 10),
        "name" -> (df => concat(df("name"), lit("!")))))
    assert(st.updatedRows == 4, st)
    val m = state(lake)
    assert(m(3L) == ("name-3!", 45.0) && m(4L) == ("name-4", 6.0))
    // partition-column assignment: move id=0 to region r9
    TypedLake.updateTyped(spark, lake, schema, partCols,
      predicate = df => df("id") === 0L,
      assignments = Seq("region" -> (_ => lit("r9"))))
    val moved = TypedLake.readCommittedTyped(spark, lake, schema)
      .filter(col("id") === 0L).collect().head
    assert(moved.getString(3) == "r9")
    assert(WeatherLakeV2Sink.committedFiles(lake)
      .exists(_.contains("region=r9")))
  }

  test("typed MERGE upserts by key (UPDATE SET * / INSERT *), prunes " +
      "candidates by the batch's partition tuples when the key " +
      "determines the partition, and supports WHEN NOT MATCHED BY " +
      "SOURCE THEN DELETE (full-sync)") {
    val lake = tmp("typedlakemerge")
    // partition by region only so (id, region) keys determine partitions
    val sch = StructType(schema.fields.filterNot(_.name == "day") )
    val pc = Seq("region")
    val s = spark
    import s.implicits._
    def mk(ids: Seq[Long], scoreOf: Long => Double): DataFrame =
      ids.map(i => (i, s"name-$i", scoreOf(i), s"r${i % 3}"))
        .toDF("id", "name", "score", "region")
    TypedLake.appendTyped(spark, lake, mk(0L until 10L, _ * 1.0), sch, pc)
    // upsert: ids 0..4 doubled, ids 100..102 new
    val batch = mk(Seq(0L, 1L, 2L, 3L, 4L, 100L, 101L, 102L),
      i => if (i >= 100) i * 1.0 else i * 2.0)
    val st = TypedLake.mergeTyped(spark, lake, sch, pc, batch,
      keyCols = Seq("id", "region"))
    assert(st.newFiles > 0)
    def scores: Map[Long, Double] =
      TypedLake.readCommittedTyped(spark, lake, sch)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val m = scores
    assert(m(3L) == 6.0 && m(7L) == 7.0 && m(101L) == 101.0 && m.size == 13)
    // full-sync: keep only ids 0..4, delete everything not in the batch
    val sync = mk(0L until 5L, _ * 2.0)
    TypedLake.mergeTyped(spark, lake, sch, pc, sync,
      keyCols = Seq("id", "region"),
      actions = TypedLake.TypedMergeActions(
        matchedUpdate = Some(None), insert = Some(None),
        notMatchedBySourceDelete = Some(None)))
    assert(scores.keySet == (0L until 5L).toSet)
    // conditional NOT MATCHED BY SOURCE: spare small ids
    TypedLake.appendTyped(spark, lake, mk(Seq(50L, 51L), _ * 1.0), sch, pc)
    TypedLake.mergeTyped(spark, lake, sch, pc, mk(Seq(0L), _ => 0.0),
      keyCols = Seq("id", "region"),
      actions = TypedLake.TypedMergeActions(
        matchedUpdate = Some(None), insert = Some(None),
        notMatchedBySourceDelete = Some(Some(df => df("id") >= 51L))))
    assert(scores.keySet == Set(0L, 1L, 2L, 3L, 4L, 50L))
  }

  test("typed MERGE: matched-DELETE with condition over source columns, " +
      "guarded INSERT, and a time-travel read of the pre-merge version " +
      "via the format-agnostic snapshot machinery") {
    val lake = tmp("typedlakecdc")
    val sch = StructType(schema.fields.filterNot(_.name == "day"))
    val pc = Seq("region")
    val s = spark
    import s.implicits._
    def mk(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, s"name-$i", i * 1.0, s"r${i % 3}"))
        .toDF("id", "name", "score", "region")
    TypedLake.appendTyped(spark, lake, mk(0L until 8L), sch, pc,
      manifestId = Some("base"))
    val v0 = WeatherLakeV2Sink.snapshotAt(lake, 0)
    // CDC batch: op=d deletes ids 0,1; others upsert (id 2 update, 9 new)
    val cdc = Seq((0L, "d"), (1L, "d"), (2L, "u"), (9L, "u")).map {
      case (i, op) => (i, s"cdc-$i", i * 100.0, s"r${i % 3}", op)
    }.toDF("id", "name", "score", "region", "op")
    TypedLake.mergeTyped(spark, lake, sch, pc, cdc,
      keyCols = Seq("id", "region"),
      actions = TypedLake.TypedMergeActions(
        matchedDelete = Some(df => df(TypedLake.srcCol("op")) === "d"),
        matchedUpdate = Some(None),
        insert = Some(None),
        insertCond = Some(df => df(TypedLake.srcCol("op")) =!= "d")))
    val m = TypedLake.readCommittedTyped(spark, lake, sch)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!m.contains(0L) && !m.contains(1L))
    assert(m(2L) == "cdc-2" && m(9L) == "cdc-9" && m(5L) == "name-5")
    // the pinned snapshot still reads the pre-merge corpus (Parquet files
    // survive until vacuum), through the format-agnostic filesAsOf
    val back = TypedLake.readTyped(spark, lake, sch,
      WeatherLakeV2Sink.filesAsOf(lake, v0))
    assert(back.count() == 8)
    // checkpoint preserves the payload declaration; vacuum then reclaims
    TypedLake.appendTyped(spark, lake, mk(Seq(70L)), sch, pc)
    assert(WeatherLakeV2Sink.checkpointManifests(lake) >= 2)
    assert(WeatherLakeV2Sink.payloadFormat(lake) == "parquet")
    assert(WeatherLakeV2Sink.vacuum(lake, minAgeMs = 0L, force = true) > 0)
    // 8 base − 2 CDC deletes + 1 CDC insert + 1 post-merge append = 8
    assert(TypedLake.readCommittedTyped(spark, lake, sch).count() == 8)
  }

  test("ESCAPED partition values round-trip through the whole typed DML " +
      "surface: a merge/delete/overwrite into a partition whose value " +
      "needs path escaping (space, percent) still finds its files — the " +
      "candidate prune compares UNESCAPED values") {
    val lake = tmp("typedlakeesc")
    val sch = StructType(schema.fields.filterNot(_.name == "day"))
    val pc = Seq("region")
    val s = spark
    import s.implicits._
    def mk(rows: (Long, Double, String)*): DataFrame =
      rows.map { case (k, v, r) => (k, s"name-$k", v, r) }
        .toDF("id", "name", "score", "region")
    TypedLake.appendTyped(spark, lake,
      mk((1L, 10.0, "north east"), (2L, 20.0, "100% west")), sch, pc)
    // the directories are escaped on disk (Hive escaping: '%' escapes,
    // spaces stay raw)…
    assert(WeatherLakeV2Sink.committedFiles(lake)
      .exists(_.contains("region=100%25 west")))
    // …and the read face unescapes them
    def scores: Map[Long, (Double, String)] =
      TypedLake.readCommittedTyped(spark, lake, sch)
        .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getString(3))))
        .toMap
    assert(scores(1L) == ((10.0, "north east")))
    // MERGE keyed on (id, region) must UPDATE the stored row, not
    // duplicate it (the prune must not rule out the escaped directory)
    TypedLake.mergeTyped(spark, lake, sch, pc,
      mk((1L, 100.0, "north east"), (3L, 30.0, "100% west")),
      keyCols = Seq("id", "region"))
    val m = scores
    assert(m(1L) == ((100.0, "north east")), m)
    assert(m(3L) == ((30.0, "100% west")))
    assert(TypedLake.readCommittedTyped(spark, lake, sch).count() == 3)
    // DELETE with a partition-equality prune on the escaped value
    val st = TypedLake.deleteTyped(spark, lake, sch, pc,
      predicate = df => df("region") === "100% west" && df("id") === 2L,
      prune = (pv, _) => pv.get("region").forall(_ == "100% west"))
    assert(st.deletedRows == 1, st)
    assert(scores.keySet == Set(1L, 3L))
  }

  test("typed compact collapses small files per directory and ZORDER-" +
      "style clustered rewrite keeps content; stats refresh on rewrite") {
    val lake = tmp("typedlakecompact")
    val sch = StructType(schema.fields.filterNot(_.name == "day"))
    val pc = Seq("region")
    // 4 interleaved appends → many small files per region dir
    (0 until 4).foreach { k =>
      val s = spark
      import s.implicits._
      val df = (0 until 40).filter(_ % 4 == k)
        .map(i => (i.toLong, s"name-$i", i * 1.0, s"r${i % 2}"))
        .toDF("id", "name", "score", "region")
      TypedLake.appendTyped(spark, lake, df, sch, pc)
    }
    // i%4==k fixes i%2, so appends k=0,2 land in r0 and k=1,3 in r1:
    // two small files per region directory — both dirs are candidates
    val before = WeatherLakeV2Sink.committedFiles(lake).size
    assert(before >= 4)
    val dirs = TypedLake.compactTyped(spark, lake, sch, pc,
      clusterExpr = Some(df => df("id")), statsFields = Seq("id"))
    assert(dirs == 2, s"expected both region dirs compacted, got $dirs")
    val after = WeatherLakeV2Sink.committedFiles(lake)
    assert(after.size < before)
    val all = TypedLake.readCommittedTyped(spark, lake, sch)
    assert(all.count() == 40)
    assert(WeatherLakeV2Sink.committedEntryLines(lake)
      .forall(l => WeatherLakeV2Sink.lineStats(l).contains("id")))
  }

  test("statsFields columns carry parquet BLOOM FILTERS: the footer " +
      "holds one for the tracked data column and none for untracked " +
      "columns, and a point lookup still answers exactly") {
    val lake = tmp("typedlakebloom")
    val sch = StructType(schema.fields.filterNot(_.name == "day"))
    val pc = Seq("region")
    val s = spark
    import s.implicits._
    TypedLake.appendTyped(spark, lake,
      (0 until 500).map(i => (i.toLong, s"name-$i", i * 1.0, "r0"))
        .toDF("id", "name", "score", "region"),
      sch, pc, statsFields = Seq("id"))
    val file = WeatherLakeV2Sink.committedFiles(lake).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), conf))
    try {
      import scala.jdk.CollectionConverters._
      val block = reader.getFooter.getBlocks.get(0)
      val bfReader = reader.getBloomFilterDataReader(block)
      def bloomOf(colName: String) = block.getColumns.asScala
        .find(_.getPath.toDotString == colName)
        .map(bfReader.readBloomFilter)
      assert(bloomOf("id").exists(_ != null),
        "stats-tracked column must carry a bloom filter")
      assert(bloomOf("name").forall(_ == null),
        "untracked column must not pay for a bloom filter")
    } finally reader.close()
    // the point-lookup path still answers exactly (reader consults the
    // filter automatically for pushed equality predicates)
    val hit = TypedLake.readCommittedTyped(spark, lake, sch)
      .filter(col("id") === 123L).collect()
    assert(hit.length == 1 && hit.head.getString(1) == "name-123")
    assert(TypedLake.readCommittedTyped(spark, lake, sch)
      .filter(col("id") === 100000L).isEmpty)
  }

  test("typed compact honors target_bytes in the OUTPUT: a clustered " +
      "rewrite rolls files at the byte target (records-per-file cap " +
      "derived from the candidates' own bytes-per-row) instead of one " +
      "unbounded file per partition") {
    val lake = tmp("typedlakeroll")
    val sch = StructType(schema.fields.filterNot(_.name == "day"))
    val pc = Seq("region")
    val s = spark
    import s.implicits._
    // 2 small files in ONE region dir, ~2000 rows total
    (0 until 2).foreach { k =>
      val df = (0 until 2000).filter(_ % 2 == k)
        .map(i => (i.toLong, s"name-$i-padpadpadpad", i * 1.0, "r0"))
        .toDF("id", "name", "score", "region")
      TypedLake.appendTyped(spark, lake, df, sch, pc)
    }
    val inputBytes = {
      val fs = new org.apache.hadoop.fs.Path(lake)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      WeatherLakeV2Sink.committedFiles(lake)
        .map(f => fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
        .sum
    }
    // a byte target of ~1/4 the input must produce SEVERAL rolled files
    val dirs = TypedLake.compactTyped(spark, lake, sch, pc,
      targetBytes = inputBytes / 4,
      clusterExpr = Some(df => df("id")), statsFields = Seq("id"))
    assert(dirs == 1)
    val after = WeatherLakeV2Sink.committedFiles(lake)
    assert(after.size >= 3, s"expected rolled output, got ${after.size} files")
    // content intact, and the per-file stats now cover DISJOINT id
    // ranges (the dual-skipping claim: clustering + rolling together
    // make the file list prunable)
    assert(TypedLake.readCommittedTyped(spark, lake, sch).count() == 2000)
    val ranges = WeatherLakeV2Sink.committedEntryLines(lake)
      .flatMap(l => WeatherLakeV2Sink.lineStats(l).get("id"))
      .map(fs => (fs.min.toDouble, fs.max.toDouble)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"overlapping post-ZORDER ranges: $ranges")
      case _ => ()
    }
  }
}
