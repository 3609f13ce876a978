package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.CurationStream

/** The streaming curation job must (1) quality-filter each arriving
  * micro-batch, (2) dedup by content digest ACROSS batches and across a
  * restart (state store), and (3) never re-process an already-ingested
  * file (file-source checkpoint as the ingest log).
  */
class CurationStreamSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  private val goodA = (1 to 40).map(_ => "the word").mkString(" ")
  private val goodB = (1 to 40).map(i => s"the tok$i").mkString(" ")

  test("streaming curation dedups by digest across batches and restarts") {
    val base = Files.createTempDirectory("curation").toString
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    // batch 1: one good doc, one junk doc (quality-filtered), one dup pair
    docs(Seq((1L, goodA), (2L, "too short"), (3L, goodA)))
      .write.mode("append").parquet(in)
    CurationStream.run(spark, in, out, cp).awaitTermination(60000)
    val firstIds = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(firstIds.size == 1, s"expected 1 curated doc, got $firstIds")
    assert(firstIds.subsetOf(Set(1L, 3L))) // one of the dup pair survives
    // batch 2 AFTER a restart: a re-crawl of goodA (cross-batch dup,
    // different doc_id) plus a genuinely new doc
    docs(Seq((4L, goodA), (5L, goodB)))
      .write.mode("append").parquet(in)
    CurationStream.run(spark, in, out, cp).awaitTermination(60000)
    val all = spark.read.parquet(out)
    assert(all.count() == 2, "re-crawled duplicate must be suppressed by state")
    assert(all.filter(col("doc_id") === 5L).count() == 1)
    assert(all.filter(col("doc_id") === 4L).count() == 0)
    // restart with no new input: nothing re-processed, output unchanged
    CurationStream.run(spark, in, out, cp).awaitTermination(60000)
    assert(spark.read.parquet(out).count() == 2)
  }
}
