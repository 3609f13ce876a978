package graft

import org.apache.spark.sql.functions._
import graft.sources.NameMapping

/** Name-mapping reads (sources.NameMapping): parquet column rename as
  * reader metadata — footer-only, loud on a stale mapping, pruning
  * pushed to the physical name.
  */
class NameMappingSpec extends SparkSpec {

  private def lake(): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nmlake").toString
    Seq((1L, 0.5), (2L, 1.5)).toDF("id", "score")
      .coalesce(1).write.parquet(s"$dir/b=1")
    Seq((3L, 2.5), (4L, 3.5)).toDF("id", "quality_score")
      .coalesce(1).write.parquet(s"$dir/b=2")
    dir
  }

  test("mapped batches union under the logical schema with batch lineage") {
    val dir = lake()
    val got = NameMapping.readParquetBatches(spark, Seq(
        (s"$dir/b=1", Map("score" -> "quality_score"), 1L),
        (s"$dir/b=2", Map.empty[String, String], 2L)))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("batch"),
        r.getAs[Double]("quality_score"))).toSet
    assert(got == Set((1L, 1L, 0.5), (2L, 1L, 1.5), (3L, 2L, 2.5), (4L, 2L, 3.5)))
  }

  test("the mapping is footer-only: column pruning pushes down to the " +
      "PHYSICAL name in the old batch's scan") {
    val dir = lake()
    val plan = NameMapping.readParquetMapped(spark, s"$dir/b=1",
        Map("score" -> "quality_score"))
      .select(col("quality_score"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && plan.contains("score"),
      s"expected the physical column in the scan's read schema:\n$plan")
    assert(!plan.contains("ReadSchema: struct<id"),
      s"id must be pruned from the scan:\n$plan")
  }

  test("a mapping naming an absent physical column (or colliding with an " +
      "existing one) fails loudly, never silently") {
    val dir = lake()
    val e1 = intercept[IllegalArgumentException] {
      NameMapping.readParquetMapped(spark, s"$dir/b=2",
        Map("score" -> "quality_score")) // b=2 has no physical 'score'
    }
    assert(e1.getMessage.contains("score"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      NameMapping.readParquetMapped(spark, s"$dir/b=1",
        Map("score" -> "id")) // 'id' already exists
    }
    assert(e2.getMessage.contains("collide"), e2.getMessage)
  }

  test("a chained (non-independent) mapping refuses loudly instead of " +
      "depending on Map iteration order") {
    val dir = lake()
    val e = intercept[IllegalArgumentException] {
      NameMapping.readParquetMapped(spark, s"$dir/b=1",
        Map("id" -> "score2", "score" -> "id"))
    }
    assert(e.getMessage.contains("independent"), e.getMessage)
  }

  test("a column only NEW batches carry surfaces as null for mapped old " +
      "batches (rename composes with column-add)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nmlake2").toString
    Seq((1L, 0.5)).toDF("id", "score").coalesce(1).write.parquet(s"$dir/b=1")
    Seq((2L, 1.5, "en")).toDF("id", "quality_score", "lang")
      .coalesce(1).write.parquet(s"$dir/b=2")
    val got = NameMapping.readParquetBatches(spark, Seq(
        (s"$dir/b=1", Map("score" -> "quality_score"), 1L),
        (s"$dir/b=2", Map.empty[String, String], 2L)))
      .collect().map(r => (r.getAs[Long]("id"), Option(r.getAs[String]("lang"))))
      .toSet
    assert(got == Set((1L, None), (2L, Some("en"))))
  }
}
