package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

class CosineSimilaritySpec extends SparkSpec {

  test("matches the zip_with+aggregate formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, -0.6)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .toDF("a", "b")
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, z) -> acc + z)" +
        " / (sqrt(aggregate(transform(a, x -> x * x), cast(0 as double), (acc, z) -> acc + z))" +
        " * sqrt(aggregate(transform(b, x -> x * x), cast(0 as double), (acc, z) -> acc + z)))")
    val rows = df.select(
      CosineSimilarity(spark, col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("identical vectors → 1.0; orthogonal → 0.0; null in → null out") {
    import spark.implicits._
    val df = Seq(
      (Seq(0.6, 0.8), Seq(0.6, 0.8)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(round(CosineSimilarity(spark, col("a"), col("b")), 9))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 0.0))
    val withNull = Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(withNull.select(CosineSimilarity(spark, col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("evaluates inside whole-stage codegen (not CodegenFallback)") {
    val df = spark.range(4).select(
      array(col("id").cast("double"), lit(1.0)).as("a"),
      array(lit(2.0), col("id").cast("double")).as("b"))
    val q = df.select(CosineSimilarity(spark, col("a"), col("b")).as("c"))
    // the `*(n)` prefix marks operators fused into WholeStageCodegen; a
    // CodegenFallback expression would leave the Project un-starred
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // and it actually computes through the codegen path
    assert(q.collect().length == 4)
  }
}
