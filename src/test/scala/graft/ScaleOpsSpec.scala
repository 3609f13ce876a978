package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bucketing, Relational}

/** Scale-posture operators: salting and bucketing (SURVEY.md §7.2 step 10;
  * the "Partitioning & shuffle" design constraints).
  */
class ScaleOpsSpec extends SparkSpec {

  test("saltedSumCount matches the direct aggregate on a skewed key") {
    import spark.implicits._
    // one hot key carrying 90% of rows
    val rows = (1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"cold${i % 7}", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy(col("k"))
      .agg(sum(col("v")).as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Relational.saltedSumCount(df, "k", "v", buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(math.abs(salted(k)._1 - s) < 1e-6)
      assert(salted(k)._2 == n)
    }
  }

  test("bucketed join of co-bucketed tables plans without a shuffle") {
    val s = spark
    import s.implicits._
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", 4)
    Bucketing.writeBucketed(right, "bkt_right", "k", 4)
    val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() == 1000)
  }
}
