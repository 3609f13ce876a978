package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.functions.{CmsEstimate, CmsMergeAgg}

/** Count-min sketch probe + merge (functions/CountMin.scala): the two
  * halves core Spark lacks around its `count_min_sketch` builder.
  */
class CountMinSpec extends SparkSpec {

  private val build = "count_min_sketch(v, 0.001d, 0.99d, 7)"

  test("merged per-group sketches estimate EXACTLY like one global sketch") {
    val s = spark
    import s.implicits._
    // skewed fixture: value v repeated v times, spread over 5 groups
    val rows = for { v <- 1L to 40L; r <- 1L to v } yield (r % 5, v)
    val df = rows.toDF("g", "v")
    val merged = df.groupBy(col("g")).agg(expr(build).as("sk"))
      .agg(CmsMergeAgg(s, col("sk")).as("sk"))
    val global = df.agg(expr(build).as("sk"))
    val items = (1L to 40L).toDF("v")
    def probe(skDf: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      items.crossJoin(skDf)
        .select(col("v"), CmsEstimate(s, col("sk"), col("v")).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromMerged = probe(merged)
    val fromGlobal = probe(global)
    // CMS merge is cell-wise addition: the merged estimate must be
    // IDENTICAL to the single-pass estimate, not merely close
    assert(fromMerged == fromGlobal)
    // and the CMS one-sided guarantee: never an undercount
    (1L to 40L).foreach(v => assert(fromMerged(v) >= v,
      s"undercount for $v: ${fromMerged(v)}"))
  }

  test("cms_merge of zero / all-null input yields null, not a crash") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[Array[Byte]].toDF("sk")
      .agg(CmsMergeAgg(s, col("sk")).as("sk")).collect()
    assert(empty.length == 1 && empty(0).isNullAt(0))
    val allNull = Seq(null.asInstanceOf[Array[Byte]], null.asInstanceOf[Array[Byte]])
      .toDF("sk").agg(CmsMergeAgg(s, col("sk")).as("sk")).collect()
    assert(allNull.length == 1 && allNull(0).isNullAt(0))
  }

  test("merged sketch bytes round-trip through the public sketch reader") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(v => (v % 3, v)).toDF("g", "v")
    val bytes = df.groupBy(col("g")).agg(expr(build).as("sk"))
      .agg(CmsMergeAgg(s, col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    assert(sk.totalCount() == 100L)
    assert(sk.estimateCount(java.lang.Long.valueOf(5L)) >= 1L)
  }

  test("cms_estimate is usable by name inside SQL") {
    val s = spark
    CmsEstimate.register(s)
    CmsMergeAgg.register(s)
    val out = s.sql(
      s"""WITH sk AS (SELECT ${CmsMergeAgg.FnName}(sk) AS sk FROM (
         |  SELECT count_min_sketch(id, 0.001d, 0.99d, 7) AS sk
         |  FROM range(1000) GROUP BY id % 4))
         |SELECT ${CmsEstimate.FnName}(sk, 42L) AS est FROM sk""".stripMargin)
      .collect()(0).getLong(0)
    assert(out >= 1L)
  }
}
