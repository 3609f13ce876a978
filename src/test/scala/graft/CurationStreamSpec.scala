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

  // 32 distinct short tokens incl. a stopword → passes the quality gate;
  // token-SET-preserving reorderings share every MinHash band but not the
  // md5 digest, so only the LSH stage can catch them
  private def toks(prefix: String) = "the" +: (1 to 31).map(i => s"$prefix$i")
  private val baseDoc = toks("tok").mkString(" ")
  private val reorderedDoc = toks("tok").reverse.mkString(" ")
  private val otherDoc = toks("bar").mkString(" ")
  private val freshDoc = toks("zed").mkString(" ")

  test("near-dup stream suppresses same-token-set docs across batches and restarts") {
    // sanity: the near-dup fixture really collides on every band, the
    // fresh doc on none (deterministic — fixed texts, fixed permutations)
    val keys = CurationStream.docBandKeys(
      docs(Seq((1L, baseDoc), (3L, reorderedDoc), (4L, freshDoc))))
    val byDoc = keys.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(byDoc(1L) == byDoc(3L), "reordered doc must share all bands")
    assert(byDoc(1L).intersect(byDoc(4L)).isEmpty, "fresh doc must not collide")

    val base = Files.createTempDirectory("neardup").toString
    val in = s"$base/in"; val out = s"$base/out"
    val reg = s"$base/reg"; val cp = s"$base/cp"
    // batch 1: two distinct docs plus an in-batch near-dup of doc 1
    docs(Seq((1L, baseDoc), (2L, otherDoc), (3L, reorderedDoc)))
      .write.mode("append").parquet(in)
    CurationStream.runNearDup(spark, in, out, reg, cp).awaitTermination(60000)
    val firstIds = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(firstIds == Set(1L, 2L),
      s"lower-id doc wins the in-batch near-dup, got $firstIds")
    // batch 2 AFTER a restart: a reordered re-crawl of doc 1 (cross-batch
    // NEAR dup — digest differs, bands collide with the registry) plus a
    // genuinely new doc
    docs(Seq((5L, reorderedDoc), (6L, freshDoc)))
      .write.mode("append").parquet(in)
    CurationStream.runNearDup(spark, in, out, reg, cp).awaitTermination(60000)
    val allIds = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(allIds == Set(1L, 2L, 6L),
      s"cross-batch near-dup must be suppressed by the registry, got $allIds")
    // restart with no new input: nothing re-processed, output unchanged
    CurationStream.runNearDup(spark, in, out, reg, cp).awaitTermination(60000)
    assert(spark.read.parquet(out).count() == 3)
  }
}
