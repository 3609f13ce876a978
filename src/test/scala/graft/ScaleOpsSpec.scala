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

  test("saltedJoin SPREADS a hot key that a plain shuffle join piles onto one task") {
    val s = spark
    import s.implicits._
    // pin the shape: no broadcast (force the shuffle the salt exists for),
    // no AQE (so partition sizes reflect the static plan, not a runtime fix)
    val oldBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 95% of probe rows carry one hot key
      val large = ((1 to 9500).map(i => ("hot", i.toLong)) ++
        (1 to 500).map(i => (s"cold${i % 10}", i.toLong))).toDF("k", "v")
      val small = ("hot" +: (0 until 10).map(i => s"cold$i"))
        .map(k => (k, s"dim_$k")).toDF("k", "dim")
      def partitionFractions(df: org.apache.spark.sql.DataFrame): Seq[Double] = {
        val sizes = df.rdd
          .mapPartitions(it => Iterator(it.size.toLong), preservesPartitioning = true)
          .collect()
        val total = sizes.sum.toDouble
        sizes.map(_ / total).toSeq
      }
      val plain = large.join(small, Seq("k"))
      val salted = Relational.saltedJoin(large, small, "k", buckets = 16,
        saltCols = Seq("v"))
      // identical result set
      assert(plain.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == salted.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      // the demonstration: the plain shuffle join lands >=90% of output in
      // ONE task; the salted join caps every task at a bounded share.
      // Replacing saltedJoin with a plain join makes this assertion fail.
      assert(partitionFractions(plain).max >= 0.9,
        "fixture is not skewed enough to demonstrate anything")
      assert(partitionFractions(salted).max <= 0.5,
        "salted join failed to spread the hot key across reduce tasks")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)
      s.conf.set("spark.sql.adaptive.enabled", oldAqe)
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

  test("the bucketed layout also serves a bucket-key aggregation " +
      "shuffle-free, where the plain layout shuffles both join sides") {
    val s = spark
    import s.implicits._
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_agg", "k", 4)
    // groupBy on the bucket key reuses the on-disk partitioning — the
    // incremental-rollup read path pays zero shuffle, same as the join
    val agg = s.table("bkt_agg").groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(exchanges(agg) == 0, agg.queryExecution.executedPlan.toString)
    assert(agg.count() == 1000)
    // control: identical data as PLAIN parquet shuffles both join sides
    val old = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = java.nio.file.Files.createTempDirectory("plainjoin").toString
      left.write.parquet(s"$dir/l")
      right.write.parquet(s"$dir/r")
      val plain = s.read.parquet(s"$dir/l")
        .join(s.read.parquet(s"$dir/r"), "k")
      assert(exchanges(plain) == 2, plain.queryExecution.executedPlan.toString)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("temperatureMix: heavy strata downsample harder than the tail") {
    import spark.implicits._
    val df = ((1 to 900).map(i => (i.toLong, "head")) ++
      (901 to 1000).map(i => (i.toLong, "tail"))).toDF("id", "src")
    val out = Relational.temperatureMix(df, "id", "src", targetFrac = 0.5)
    val rates = out.select("src", "keep_micro").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // shares ∝ sqrt(n): head keep = 500·(30/40)/900 ≈ 0.417, tail
    // keep = 500·(10/40)/100 = 1.0 (capped) — the tail keeps everything
    assert(rates("head") === 416666L)
    assert(rates("tail") === 1000000L)
    assert(out.filter($"src" === "tail").count() === 100L)
    val headKept = out.filter($"src" === "head").count()
    // hash-bucket selection: close to the 41.7% rate, never all or none
    assert(headKept > 300L && headKept < 520L, s"headKept=$headKept")
  }
}
