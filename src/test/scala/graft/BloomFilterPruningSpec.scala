package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning (Catalyst's InjectRuntimeFilter rule):
  * when a shuffle join's small side carries a selective predicate, the
  * optimizer builds a Bloom filter over its join keys and pushes a
  * `might_contain` probe onto the big side's scan, so fact rows that cannot
  * match are dropped BEFORE the shuffle. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling only the ~matching
  * fraction. The production thresholds (10 GB application-side scan) are
  * deliberately far above test data size, so the spec lowers them — the
  * point is to pin that the rule engages on our join shapes and that the
  * pruned plan returns identical results.
  */
class BloomFilterPruningSpec extends SparkSpec {

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def factDimJoin = {
    // selective dim side (one priority bucket ≈ 20% of orders) joined to
    // the fact table on the shuffle key the bloom filter should prune
    val fact = Tables.lineitem(spark, sf0001)
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
  }

  test("InjectRuntimeFilter pushes a might_contain probe onto the fact scan") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1b",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val pruned = factDimJoin
      val plan = pruned.queryExecution.optimizedPlan.toString()
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter probe in the optimized plan:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        s"expected a bloom_filter_agg build side in the optimized plan:\n$plan")

      // pruning must not change the result: compare against the rule-off run
      val withBloom = pruned.orderBy("l_returnflag").collect()
      val without = withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val p = factDimJoin
        assert(!p.queryExecution.optimizedPlan.toString().contains("might_contain"))
        p.orderBy("l_returnflag").collect()
      }
      assert(withBloom.toSeq == without.toSeq)
    }
  }
}
