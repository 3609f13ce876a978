package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** BUCKET-COUNT EVOLUTION (metadata-only — the Iceberg partition-spec-
  * evolution model on the one axis a flat bucketed table has):
  * `CALL lake.system.evolve_bucketing('t', n)` flips the declared count;
  * old files keep their GENERATION (the count rides the file-name
  * marker `part-b<id>c<count>`; legacy un-stamped markers resolve to
  * the pre-evolution count), new writes route and stamp under the new
  * count. Reads and DML stay CORRECT over mixed generations — the
  * bucket column is a data column and every DML candidate set is
  * content-driven — but the scan withholds its KeyGroupedPartitioning
  * claim (mis-grouping a count-4 file under count-8 ids would be wrong
  * SPJ answers, not a lost optimization). `compact` migrates
  * wrong-generation files through the current-count router and the
  * zero-exchange join layout returns.
  */
class TypedLakeBucketEvolutionSpec extends SparkSpec {

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
    df.collect()
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }) + p.children.map(count).sum + p.subqueries.map(count).sum +
        (p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => count(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => count(q.plan)
          case _ => 0
        })
    count(df.queryExecution.executedPlan)
  }

  test("evolve 4→8: reads and DML stay correct over mixed generations, " +
      "the SPJ claim is withheld while mixed, compact migrates (markers " +
      "re-stamped), and the zero-exchange join returns") {
    val w = Files.createTempDirectory("bevo").toString
    spark.conf.set("spark.sql.catalog.bevo", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.bevo.warehouse", w)
    spark.sql("""CREATE TABLE bevo.t (k BIGINT, v BIGINT)
      USING lake PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO bevo.t SELECT id, id * 10 FROM range(40)")
    val loc = spark.sql("CALL bevo.system.detail('t')").head.getString(0)
    // generation stamps ride the markers from day one
    assert(WeatherLakeV2Sink.committedFiles(loc).forall(f =>
      TypedLake.bucketGenOfFile(f).exists(_._2.contains(4))))
    def joined = spark.sql(
      "SELECT a.k, a.v, b.v AS v2 FROM bevo.t a JOIN bevo.t b ON a.k = b.k")
    withSpjConfs { assert(shuffles(joined) == 0, "uniform c4: SPJ") }

    val ev = spark.sql("CALL bevo.system.evolve_bucketing('t', 8)").head
    assert(ev.getInt(0) == 4 && ev.getInt(1) == 8 && ev.getInt(2) > 0, ev)
    // observability: detail's stale_bucket_files sizes the migration
    val det = spark.sql("CALL bevo.system.detail('t')").head
    assert(det.getInt(det.fieldIndex("stale_bucket_files")) ==
      ev.getInt(2), det.toString)
    spark.sql("INSERT INTO bevo.t SELECT id, id * 10 FROM range(40, 60)")
    val gens = WeatherLakeV2Sink.committedFiles(loc)
      .flatMap(f => TypedLake.bucketGenOfFile(f)).flatMap(_._2).distinct
    assert(gens.sorted == Seq(4, 8), s"both generations live: $gens")

    // reads over MIXED generations are exact
    assert(spark.table("bevo.t").count() == 60)
    assert(spark.sql("SELECT CAST(sum(v) AS BIGINT) FROM bevo.t")
      .head.getLong(0) == (0L until 60L).map(_ * 10).sum)

    // the SPJ claim is WITHHELD while mixed (wrong grouping would be
    // wrong answers) — the join shuffles and stays correct. Probed
    // BEFORE any DML: a copy-on-write rewrite re-routes touched rows
    // through the CURRENT-count writer, which can itself retire the
    // old generation.
    withSpjConfs {
      assert(shuffles(joined) > 0, "mixed generations must not SPJ")
      assert(joined.count() == 60)
    }

    // DML over mixed generations is exact (candidates are content-
    // driven, never marker-driven): touch rows in BOTH generations.
    // The rewrite itself routes through the CURRENT-count writer, so
    // the touched old-generation files retire as a side effect.
    spark.sql("UPDATE bevo.t SET v = v + 1 WHERE k % 2 = 0")
    spark.sql("DELETE FROM bevo.t WHERE k = 7")
    assert(spark.sql("SELECT CAST(sum(v) AS BIGINT) FROM bevo.t")
      .head.getLong(0) ==
      (0L until 60L).filterNot(_ == 7).map(k =>
        k * 10 + (if (k % 2 == 0) 1 else 0)).sum)

    // SECOND evolution (8→16, history grows): every live file is now
    // wrong-generation, and compact is the migration — it rewrites
    // them all through the count-16 router, markers re-stamp c16, and
    // the zero-exchange join returns at the new count
    val before = WeatherLakeV2Sink.committedFiles(loc)
    val ev2 = spark.sql("CALL bevo.system.evolve_bucketing('t', 16)").head
    assert(ev2.getInt(0) == 8 && ev2.getInt(1) == 16 &&
      ev2.getInt(2) == before.size, ev2)
    withSpjConfs {
      assert(shuffles(joined) > 0, "wrong-generation files must not SPJ")
    }
    assert(spark.sql("CALL bevo.system.compact('t')").head.getInt(0) > 0)
    val after = WeatherLakeV2Sink.committedFiles(loc)
    assert(after.nonEmpty && after.forall(f =>
      TypedLake.bucketGenOfFile(f).exists { case (b, c) =>
        b >= 0 && b < 16 && c.contains(16) }),
      s"every file must be current-generation after compact: $after")
    withSpjConfs {
      assert(shuffles(joined) == 0, "uniform c16: SPJ returns")
      assert(joined.count() == 59)
    }
    val det2 = spark.sql("CALL bevo.system.detail('t')").head
    assert(det2.getInt(det2.fieldIndex("stale_bucket_files")) == 0,
      "post-migration detail must report zero stale bucket files")
    assert(spark.table("bevo.t").count() == 59)
    spark.sql("DROP TABLE bevo.t")
  }

  test("legacy un-stamped markers resolve to the pre-evolution count: " +
      "gated from SPJ after an evolution, migrated by compact with " +
      "their rows intact") {
    val w = Files.createTempDirectory("bleg").toString
    spark.conf.set("spark.sql.catalog.bleg", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.bleg.warehouse", w)
    spark.sql("""CREATE TABLE bleg.t (k BIGINT, v BIGINT)
      USING lake PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO bleg.t SELECT id, id FROM range(20)")
    val loc = spark.sql("CALL bleg.system.detail('t')").head.getString(0)
    // craft a LEGACY file (pre-count-stamp writer): plain part-b<id>-
    // marker, adopted via a test publish — k=100 hashes wherever, the
    // marker id is what the reader trusts
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("blegtmp").toString
    Seq((100L, 100L)).toDF("k", "v").coalesce(1).write
      .mode("overwrite").parquet(tmp)
    val fs = new Path(tmp).getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.startsWith("part-")).get
    val legacy = new Path(loc, "part-b0-legacy-adopt.parquet")
    assert(fs.rename(part, legacy))
    WeatherLakeV2Sink.publishForTest(loc, "append",
      snapshot = WeatherLakeV2Sink.liveManifests(loc),
      supersedes = Seq.empty, lines = Seq(legacy.toString),
      payload = Some("parquet"))
    assert(spark.table("bleg.t").count() == 21)
    assert(TypedLake.bucketGenOfFile(legacy.toString) == Some((0, None)))

    spark.sql("CALL bleg.system.evolve_bucketing('t', 8)")
    // the legacy file's generation resolves to 4 (pre-evolution head):
    // wrong generation → SPJ withheld even after stamped files migrate
    def joined = spark.sql(
      "SELECT a.k FROM bleg.t a JOIN bleg.t b ON a.k = b.k")
    withSpjConfs { assert(shuffles(joined) > 0) }
    assert(spark.sql("CALL bleg.system.compact('t')").head.getInt(0) > 0)
    assert(WeatherLakeV2Sink.committedFiles(loc).forall(f =>
      TypedLake.bucketGenOfFile(f).exists(_._2.contains(8))))
    assert(spark.table("bleg.t").count() == 21, "legacy rows must survive")
    assert(spark.sql("SELECT count(*) FROM bleg.t WHERE k = 100")
      .head.getLong(0) == 1)
    withSpjConfs { assert(shuffles(joined) == 0, "uniform c8 after") }
    spark.sql("DROP TABLE bleg.t")
  }

  test("property: random append/merge/delete/update/evolve/compact " +
      "sequences — the resolved view equals the model after every op, " +
      "and the SPJ claim appears IFF the live generation is uniform") {
    for (trial <- 1 to 2) {
      val rng = new scala.util.Random(20260816 + trial)
      val w = Files.createTempDirectory(s"bprop$trial").toString
      val cat = s"bprop$trial"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
      spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, v BIGINT)
        USING lake PARTITIONED BY (bucket(4, k))""")
      var model = Map.empty[Long, Long]
      var nextKey = 0L
      var count = 4
      val counts = Seq(4, 8, 16)
      def fresh(n: Int): Seq[(Long, Long)] =
        (0 until n).map { _ => nextKey += 1; (nextKey, rng.between(0L, 99L)) }
      def insert(rows: Seq[(Long, Long)]): Unit =
        spark.sql(s"INSERT INTO $cat.t VALUES " +
          rows.map { case (k, v) => s"($k, $v)" }.mkString(", "))
      locally { val seed = fresh(6); insert(seed); model ++= seed }
      val loc = spark.sql(s"CALL $cat.system.detail('t')").head.getString(0)
      for (i <- 1 to 12) {
        val op = rng.nextInt(6)
        op match {
          case 0 => // append fresh keys
            val rows = fresh(1 + rng.nextInt(3))
            insert(rows); model ++= rows
          case 1 => // merge upsert: existing + one fresh
            val existing = rng.shuffle(model.keys.toSeq)
              .take(rng.nextInt(3)).map(k => (k, rng.between(0L, 99L)))
            val rows = existing ++ fresh(1)
            spark.sql(s"""MERGE INTO $cat.t t USING (SELECT * FROM VALUES
              ${rows.map { case (k, v) => s"($k, $v)" }.mkString(", ")}
              AS s(k, v)) s ON t.k = s.k
              WHEN MATCHED THEN UPDATE SET *
              WHEN NOT MATCHED THEN INSERT *""")
            model ++= rows
          case 2 => // delete a residue class
            val r = rng.nextInt(4)
            spark.sql(s"DELETE FROM $cat.t WHERE k % 4 = $r")
            model = model.filter { case (k, _) => k % 4 != r }
          case 3 => // update to a key-derived value
            val r = rng.nextInt(3)
            spark.sql(s"UPDATE $cat.t SET v = k * 7 + $r WHERE k % 3 = $r")
            model = model.map { case (k, v) =>
              k -> (if (k % 3 == r) k * 7 + r else v) }
          case 4 => // evolve to a different count
            val next = rng.shuffle(counts.filterNot(_ == count)).head
            val ev = spark.sql(
              s"CALL $cat.system.evolve_bucketing('t', $next)").head
            assert(ev.getInt(0) == count && ev.getInt(1) == next, ev)
            count = next
          case 5 => // compact (the migration path)
            spark.sql(s"CALL $cat.system.compact('t')")
        }
        assert(spark.table(s"$cat.t").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap == model,
          s"trial $trial op#$i (kind $op) diverged")
        // the SPJ consistency invariant: the zero-exchange claim
        // appears IFF every live file is stamped with the CURRENT
        // count — and either way the join answers the model
        val uniform = WeatherLakeV2Sink.committedFiles(loc).forall(f =>
          TypedLake.bucketGenOfFile(f).exists(_._2.contains(count)))
        if (model.nonEmpty) withSpjConfs {
          val j = spark.sql(
            s"SELECT a.k FROM $cat.t a JOIN $cat.t b ON a.k = b.k")
          val n = shuffles(j)
          assert(if (uniform) n == 0 else n > 0,
            s"trial $trial op#$i (kind $op): uniform=$uniform but " +
              s"$n shuffles")
          assert(j.count() == model.size)
        }
      }
      spark.sql(s"DROP TABLE $cat.t")
    }
  }

  test("WAP staging on a bucketed table rides the bucket-routing " +
      "writer: staged files carry count-stamped markers and the zero-" +
      "exchange layout survives fast_forward") {
    val w = Files.createTempDirectory("bwap").toString
    spark.conf.set("spark.sql.catalog.bwap", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.bwap.warehouse", w)
    spark.sql("""CREATE TABLE bwap.t (k BIGINT, v BIGINT)
      USING lake PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO bwap.t SELECT id, id FROM range(12)")
    val loc = spark.sql("CALL bwap.system.detail('t')").head.getString(0)
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      spark.sql("INSERT INTO bwap.t SELECT id, id FROM range(100, 112)")
      // staged THROUGH the bucket writer: marked, count-stamped
      val staged = WeatherLakeV2Sink.branchEntryLines(loc, "audit")
        .map(_.takeWhile(_ != '\t')) // entry line = path [+ \t stats]
      assert(staged.nonEmpty && staged.forall(f =>
        TypedLake.bucketGenOfFile(f).exists(_._2.contains(4))), staged)
      assert(spark.table("bwap.t").count() == 24, "branch view = base+staged")
    } finally spark.conf.unset("spark.graft.wap.branch")
    assert(spark.table("bwap.t").count() == 12, "main untouched")
    assert(spark.sql("CALL bwap.system.fast_forward('t', 'audit')")
      .head.getInt(0) > 0)
    spark.sql("CALL bwap.system.drop_branch('t', 'audit')")
    assert(spark.table("bwap.t").count() == 24)
    // published staged files keep the layout: SPJ holds, no strays
    assert(WeatherLakeV2Sink.committedFiles(loc).forall(f =>
      TypedLake.bucketGenOfFile(f).exists(_._2.contains(4))))
    withSpjConfs {
      val j = spark.sql(
        "SELECT a.k FROM bwap.t a JOIN bwap.t b ON a.k = b.k")
      assert(shuffles(j) == 0, "SPJ must survive the WAP publish")
      assert(j.count() == 24)
    }
    spark.sql("DROP TABLE bwap.t")
  }

  test("guards: non-bucketed tables, the identity count, out-of-range " +
      "counts, and a WAP-staging session all refuse loudly") {
    val w = Files.createTempDirectory("bgrd").toString
    spark.conf.set("spark.sql.catalog.bgrd", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.bgrd.warehouse", w)
    spark.sql("CREATE TABLE bgrd.plain (k BIGINT, v BIGINT) USING lake")
    val e1 = intercept[Exception](
      spark.sql("CALL bgrd.system.evolve_bucketing('plain', 8)").collect())
    assert(e1.getMessage.contains("BUCKETED tables only"), e1.getMessage)
    spark.sql("""CREATE TABLE bgrd.b (k BIGINT, v BIGINT)
      USING lake PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO bgrd.b SELECT id, id FROM range(5)")
    val e2 = intercept[Exception](
      spark.sql("CALL bgrd.system.evolve_bucketing('b', 4)").collect())
    assert(e2.getMessage.contains("already bucket(4)"), e2.getMessage)
    val e3 = intercept[Exception](
      spark.sql("CALL bgrd.system.evolve_bucketing('b', 0)").collect())
    assert(e3.getMessage.contains("out of range"), e3.getMessage)
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      val e4 = intercept[Exception](
        spark.sql("CALL bgrd.system.evolve_bucketing('b', 8)").collect())
      assert(e4.getMessage.contains("staging on WAP branch"), e4.getMessage)
    } finally spark.conf.unset("spark.graft.wap.branch")
    // none of the refusals moved the marker
    val ev = spark.sql("CALL bgrd.system.evolve_bucketing('b', 8)").head
    assert(ev.getInt(0) == 4 && ev.getInt(1) == 8)
    spark.sql("DROP TABLE bgrd.plain"); spark.sql("DROP TABLE bgrd.b")
  }
}
