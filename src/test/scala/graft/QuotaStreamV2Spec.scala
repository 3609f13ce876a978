package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{QuotaStream, QuotaStreamV2}
import graft.streaming.QuotaStream.{Admission, Doc}

/** The transformWithState twin must behave exactly like the
  * flatMapGroupsWithState original: same deterministic admissions, same
  * cross-restart ledger. Runs under the RocksDB state store provider the
  * new operator requires, restoring the session's provider afterwards.
  */
class QuotaStreamV2Spec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, QuotaStreamV2.RequiredStateStoreProvider)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("V2 quota matches V1 semantics on the same batch") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("quotaV2").toString + "/docs"
    (Seq(5L, 1L, 4L, 2L, 3L).map(Doc(_, "hot")) ++
      Seq(Doc(10L, "cold"), Doc(11L, "cold")))
      .toDS().coalesce(1).write.parquet(dir)
    val got = withRocksDb {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
        .parquet(dir).as[Doc]
      val name = s"quota_v2_${System.nanoTime()}"
      val q = QuotaStreamV2.admissions(spark, stream, maxDocs = 3L).writeStream
        .format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); q.stop()
      spark.table(name).as[Admission].collect().toSeq
    }
    val hot = got.filter(_.source == "hot")
    assert(hot.filter(_.admitted).map(_.doc_id).sorted == Seq(1L, 2L, 3L),
      s"cap admits the LOWEST ids of the batch, got $hot")
    assert(hot.filter(!_.admitted).map(_.doc_id).sorted == Seq(4L, 5L))
    assert(hot.filter(!_.admitted).forall(_.admitted_so_far == 3L))
    assert(got.filter(_.source == "cold").forall(_.admitted))
    // literal parity with the V1 operator on identical input (batch mode)
    val v1 = QuotaStream.admissions(spark,
      spark.read.parquet(dir).as[Doc], maxDocs = 3L).collect().toSet
    assert(got.toSet == v1, "V2 diverged from V1 on the same input")
  }

  test("V2 quota ledger survives a checkpointed RESTART: cap spans runs") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("quotaV2Cp").toString
    val dir = s"$base/docs"; val cp = s"$base/cp"; val out = s"$base/out"
    def run(): Unit = withRocksDb {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
        .parquet(dir).as[Doc]
      val q = QuotaStreamV2.admissions(spark, stream, maxDocs = 3L)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); q.stop()
    }
    Seq(Doc(1L, "src"), Doc(2L, "src"))
      .toDS().coalesce(1).write.mode("append").parquet(dir)
    run()
    // fresh query, same checkpoint: only ONE slot remains — the ledger
    // must come from recovered RocksDB state, not reprocessed input
    Seq(Doc(3L, "src"), Doc(4L, "src"))
      .toDS().coalesce(1).write.mode("append").parquet(dir)
    run()
    val got = spark.read.parquet(out).as[Admission].collect().toSeq
      .filter(_.source == "src")
    assert(got.filter(_.admitted).map(_.doc_id).sorted == Seq(1L, 2L, 3L),
      s"exactly the cap admits across both runs, got $got")
    assert(got.filter(!_.admitted).map(_.doc_id) == Seq(4L))
  }
}
