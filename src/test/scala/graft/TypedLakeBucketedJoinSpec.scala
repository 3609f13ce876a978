package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** HASH-BUCKETED lake tables + storage-partitioned joins: two tables
  * `PARTITIONED BY (bucket(n, key))` report KeyGroupedPartitioning from
  * their scans (one input partition per bucket, keys carried), the
  * catalog's own V2 `bucket` function ties both sides to the writer's
  * routing hash, and the join plans with ZERO exchange on either side —
  * the 100 TB fact-fact join posture copy-shuffling could never afford.
  */
class TypedLakeBucketedJoinSpec extends SparkSpec {

  private def withSpjConfs[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // let AQE finalize
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }) + p.children.map(count).sum +
        (p.subqueries.map(count).sum) +
        (p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => count(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => count(q.plan) // a shuffle stage's own
              // ShuffleExchangeExec is inside q.plan and counted there
          case _ => 0
        })
    count(df.queryExecution.executedPlan)
  }

  test("two bucketed lake tables JOIN with zero exchange, the writer " +
      "lands one file per bucket, and the answer matches the plain " +
      "shuffled join bit for bit") {
    val w = Files.createTempDirectory("spj").toString
    spark.conf.set("spark.sql.catalog.spjlake", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.spjlake.warehouse", w)
    spark.sql("""CREATE TABLE spjlake.facts (k BIGINT, v BIGINT)
      USING lake PARTITIONED BY (bucket(4, k))""")
    spark.sql("""CREATE TABLE spjlake.dims (k BIGINT, name STRING)
      USING lake PARTITIONED BY (bucket(4, k))""")
    spark.sql("""INSERT INTO spjlake.facts
      SELECT id % 50, id * 3 FROM range(400)""")
    spark.sql("""INSERT INTO spjlake.dims
      SELECT id, concat('d-', id) FROM range(50)""")

    // the clustered write landed ONE file per non-empty bucket, bucket
    // ids structural in the file names
    val factFiles = WeatherLakeV2Sink.committedFiles(s"$w/facts")
    val buckets = factFiles.flatMap(TypedLake.bucketOfFile)
    assert(buckets.size == factFiles.size, s"unmarked files in $factFiles")
    assert(buckets.distinct.size == buckets.size,
      s"one file per bucket expected, got $factFiles")

    withSpjConfs {
      val joined = spark.sql("""SELECT f.k, count(*) AS n,
          CAST(sum(f.v) AS BIGINT) AS sv, max(d.name) AS dn
        FROM spjlake.facts f JOIN spjlake.dims d ON f.k = d.k
        GROUP BY f.k""")
      // zero exchange: the join aligns the reported bucket partitions,
      // and the same-key aggregate reuses the clustering
      assert(shuffles(joined) == 0,
        joined.queryExecution.executedPlan.toString)
      val rows = joined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      // parity with the plain (shuffled) computation
      val plain = spark.range(400).selectExpr("id % 50 AS k", "id * 3 AS v")
        .groupBy("k").agg(count(lit(1)).as("n"),
          sum(col("v")).cast("long").as("sv"))
        .withColumn("dn", concat(lit("d-"), col("k")))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(rows == plain)
    }

    // a second insert doubles the per-bucket file count; CALL compact
    // folds each bucket back to ONE file with the markers preserved —
    // the layout (and the zero-exchange join) survives maintenance
    spark.sql("""INSERT INTO spjlake.facts
      SELECT id % 50, id * 3 FROM range(400)""")
    assert(WeatherLakeV2Sink.committedFiles(s"$w/facts").size
      > buckets.distinct.size)
    val compacted = spark.sql("CALL spjlake.system.compact('facts')")
      .head.getInt(0)
    assert(compacted > 0)
    val after = WeatherLakeV2Sink.committedFiles(s"$w/facts")
    val afterBuckets = after.flatMap(TypedLake.bucketOfFile)
    assert(afterBuckets.size == after.size &&
      afterBuckets.distinct.size == afterBuckets.size,
      s"one marked file per bucket after compact, got $after")
    assert(spark.table("spjlake.facts").count() == 800)
    withSpjConfs {
      val joined2 = spark.sql("""SELECT f.k, count(*) AS n
        FROM spjlake.facts f JOIN spjlake.dims d ON f.k = d.k
        GROUP BY f.k""")
      assert(shuffles(joined2) == 0,
        joined2.queryExecution.executedPlan.toString)
    }
    // FULL DML, layout preserved: a copy-on-write DELETE rewrites the
    // touched buckets THROUGH the bucket writer — markers survive, the
    // join stays zero-exchange. (800 rows here; v=3 matches the two
    // duplicate id=1 rows.)
    spark.sql("DELETE FROM spjlake.facts WHERE v = 3")
    assert(spark.table("spjlake.facts").count() == 798)
    val afterDelete = WeatherLakeV2Sink.committedFiles(s"$w/facts")
    assert(afterDelete.flatMap(TypedLake.bucketOfFile).size
      == afterDelete.size, s"unmarked rewrite in $afterDelete")
    withSpjConfs {
      val j = spark.sql("""SELECT f.k, count(*) AS n FROM spjlake.facts f
        JOIN spjlake.dims d ON f.k = d.k GROUP BY f.k""")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
    }
    // merge-on-read DML: delete files only, data files untouched — and
    // the join stays ZERO-EXCHANGE anyway: position deletes never move
    // a row across buckets, so the scan subtracts them INSIDE the
    // bucketed partition readers (ordinal skip sets) and keeps
    // reporting KeyGroupedPartitioning. The two headline scale
    // features — SPJ and mor — compose on the same CDC-rate fact table.
    spark.sql("ALTER TABLE spjlake.facts SET TBLPROPERTIES " +
      "('dmlMode' = 'mor')")
    val dataBefore = WeatherLakeV2Sink.committedFiles(s"$w/facts").toSet
    spark.sql("DELETE FROM spjlake.facts WHERE v = 6")
    assert(WeatherLakeV2Sink.committedFiles(s"$w/facts").toSet
      == dataBefore, "mor DELETE must rewrite no data file")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(s"$w/facts").nonEmpty,
      "live position delete files expected")
    assert(spark.table("spjlake.facts").count() == 796)
    withSpjConfs {
      val jm = spark.sql("""SELECT f.k, count(*) AS n FROM spjlake.facts f
        JOIN spjlake.dims d ON f.k = d.k GROUP BY f.k""")
      assert(shuffles(jm) == 0,
        s"SPJ must survive live position deletes:\n" +
          jm.queryExecution.executedPlan.toString)
      // parity: k=2 held 16 rows (8 per insert); the mor DELETE killed
      // its two v=6 rows (id=2 from each insert) — the zero-exchange
      // result must see 14
      val n = jm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(n(2L) == 14L, s"expected 14 rows for k=2, got ${n.get(2L)}")
    }
    spark.sql("CALL spjlake.system.reconcile('facts')")
    val afterRec = WeatherLakeV2Sink.committedFiles(s"$w/facts")
    assert(afterRec.flatMap(TypedLake.bucketOfFile).size == afterRec.size,
      s"reconcile must keep bucket markers, got $afterRec")
    withSpjConfs {
      val j = spark.sql("""SELECT f.k, count(*) AS n FROM spjlake.facts f
        JOIN spjlake.dims d ON f.k = d.k GROUP BY f.k""")
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
    }
    assert(spark.table("spjlake.facts").count() == 796)
    // cluster_expr has no meaning on a bucketed table — loud
    val e2 = intercept[Exception](spark.sql(
      "CALL spjlake.system.compact('facts', cluster_expr => 'k')"))
    assert(e2.getMessage.contains("bucket"), e2.getMessage)
    // INSERT OVERWRITE stays legal and re-buckets
    spark.sql("""INSERT OVERWRITE spjlake.facts
      SELECT id % 10, id FROM range(100)""")
    assert(spark.table("spjlake.facts").count() == 100)
    spark.sql("DROP TABLE spjlake.facts")
    spark.sql("DROP TABLE spjlake.dims")
  }

  test("compact on a bucketed mor table resolves live deletions and " +
      "carries touched manifests' delete directives — no resurrection") {
    val w = Files.createTempDirectory("spjm").toString
    spark.conf.set("spark.sql.catalog.spjm", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.spjm.warehouse", w)
    spark.sql("""CREATE TABLE spjm.f (k BIGINT, v BIGINT) USING lake
      PARTITIONED BY (bucket(4, k))
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("INSERT INTO spjm.f SELECT id % 20, id FROM range(200)")
    spark.sql("INSERT INTO spjm.f SELECT id % 20, id + 200 FROM range(200)")
    // mor DELETE: data files untouched, delete files live
    val dataBefore = WeatherLakeV2Sink.committedFiles(s"$w/f").toSet
    spark.sql("DELETE FROM spjm.f WHERE v < 50")
    assert(WeatherLakeV2Sink.committedFiles(s"$w/f").toSet == dataBefore,
      "mor DELETE must rewrite no data file")
    assert(spark.table("spjm.f").count() == 350)
    // every bucket now holds 2 files -> all candidates; the rewrite MUST
    // read mor-resolved (else the 50 deleted rows bake back in) and the
    // touched manifests' directives MUST ride the superseding commit
    val compacted = spark.sql("CALL spjm.system.compact('f')").head.getInt(0)
    assert(compacted > 0)
    assert(spark.table("spjm.f").count() == 350,
      "compact resurrected mor-deleted rows")
    assert(spark.sql("SELECT count(*) FROM spjm.f WHERE v < 50")
      .head.getLong(0) == 0L, "deleted rows visible after compact")
    val after = WeatherLakeV2Sink.committedFiles(s"$w/f")
    assert(after.flatMap(TypedLake.bucketOfFile).size == after.size,
      s"compact must keep bucket markers, got $after")
    // a SECOND mor delete against the compacted files, then a partial
    // compact (only some buckets multi-file): untouched buckets'
    // deletions stay subtracted through the carried directives
    spark.sql("DELETE FROM spjm.f WHERE v >= 390")
    assert(spark.table("spjm.f").count() == 340)
    spark.sql("INSERT INTO spjm.f SELECT 0, 1000 + id FROM range(4)")
    spark.sql("CALL spjm.system.compact('f')")
    assert(spark.table("spjm.f").count() == 344,
      "partial compact dropped live delete directives")
    assert(spark.sql("SELECT count(*) FROM spjm.f WHERE v >= 390 AND v < 1000")
      .head.getLong(0) == 0L)
    spark.sql("DROP TABLE spjm.f")
  }

  test("bucketing guards: bucket() must be the only transform, the " +
      "column must exist, and an unbucketed table still reports unknown " +
      "partitioning (no mis-grouping)") {
    val w = Files.createTempDirectory("spjg").toString
    spark.conf.set("spark.sql.catalog.spjg", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.spjg.warehouse", w)
    val e1 = intercept[Exception](spark.sql(
      """CREATE TABLE spjg.bad (k BIGINT, p STRING) USING lake
        PARTITIONED BY (bucket(4, k), p)"""))
    assert(e1.getMessage.contains("ONLY transform"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      """CREATE TABLE spjg.bad2 (k BIGINT) USING lake
        PARTITIONED BY (bucket(4, nope))"""))
    // the engine's own resolution catches it first; either message is a
    // loud refusal of the unknown bucket column
    assert(e2.getMessage.contains("not a table column") ||
      e2.getMessage.contains("nope"), e2.getMessage)
    // the catalog exposes its bucket function for SPJ resolution
    val fn = new graft.sources.LakeCatalog()
    val bound = graft.sources.LakeCatalog.BucketFunction.bind(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](4, 123L))
    assert(bound.asInstanceOf[org.apache.spark.sql.connector.catalog
        .functions.ScalarFunction[Integer]].produceResult(row)
      == TypedLake.bucketId(123L,
        org.apache.spark.sql.types.LongType, 4))
  }
}
