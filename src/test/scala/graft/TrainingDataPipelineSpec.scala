package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational
import graft.pipeline.TrainingDataPipeline

class TrainingDataPipelineSpec extends SparkSpec {

  test("end-to-end curation: quality → exact dedup → near-dup → chunks") {
    val s = spark
    import s.implicits._
    val long1 = (1 to 60).map(i => s"w${i % 13} the").mkString(" ")
    val docs = Seq(
      (1L, "blk", long1, "en", "src0", long1.length.toLong),
      (2L, "blk", long1, "en", "src0", long1.length.toLong),       // exact dup of 1
      (3L, "blk", long1 + " tail", "en", "src0", long1.length + 5L), // near dup of 1
      (4L, "blk", "too short", "en", "src0", 9L),                   // quality-filtered
      (5L, "blk", (1 to 50).map(i => s"unique$i and").mkString(" "), "en", "src0", 600L))
      .toDF("doc_id", "source2", "text", "lang", "source", "n_chars")
      .drop("source2")
    val out = TrainingDataPipeline.run(spark, docs,
      minTokens = 20, nearDupThreshold = 0.9)
    val stats = out.stats.head()
    assert(stats.getAs[Long]("docs_in") == 5L)
    assert(stats.getAs[Long]("after_quality") == 4L)     // doc 4 dropped
    assert(stats.getAs[Long]("after_exact_dedup") == 3L) // doc 2 folded into 1
    assert(stats.getAs[Long]("after_neardup") == 2L)     // doc 3 folded into 1
    val keptIds = out.kept.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(1L, 5L))
    // chunks only from survivors, fingerprints present and non-null
    val chunkDocs = out.chunks.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(chunkDocs.subsetOf(keptIds))
    assert(out.chunks.filter(col("chunk_fingerprint").isNull).count() == 0)
  }

  test("saltedJoin equals the plain join on skewed keys") {
    val s = spark
    import s.implicits._
    val large = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, s"cold$i"))).toDF("k", "payload")
    val small = Seq((1L, "dim1"), (2L, "dim2"), (3L, "dim3")).toDF("k", "dim")
    val plain = large.join(small, Seq("k"))
      .groupBy(col("k"), col("dim")).count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val salted = Relational.saltedJoin(large, small, "k", buckets = 8)
      .groupBy(col("k"), col("dim")).count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(plain == salted)
  }
}
