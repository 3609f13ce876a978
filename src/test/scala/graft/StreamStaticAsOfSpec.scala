package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.plans.{AsOfDirection, AsOfJoinPlan, BroadcastAsOfJoinExec}
import graft.streaming.StreamAsOf

/** Stream-static as-of: the native batch operator run inside micro-batches
  * against a broadcast static right — stateless, exact, batching-invariant.
  */
class StreamStaticAsOfSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val leftRows = Seq(
    (1L, 1L, ts("2025-01-01 00:00:12")),
    (2L, 2L, ts("2025-01-01 00:00:08")),
    (1L, 3L, ts("2025-01-01 00:00:30")),
    (3L, 4L, ts("2025-01-01 00:00:30")), // key absent from the right
    (1L, 5L, ts("2025-01-01 00:00:05"))) // tie with right 100 (strictness)

  private def rightStatic: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 100L, ts("2025-01-01 00:00:05")),
      (1L, 101L, ts("2025-01-01 00:00:20")),
      (2L, 200L, ts("2025-01-01 00:00:10")))
      .toDF("user_id", "event_id", "ts")
  }

  /** Run leftRows through the stream-static as-of under the given shape,
    * returning left event_id → matched right event_id (-1 unmatched),
    * plus the last micro-batch's executed plan.
    */
  private def run(direction: AsOfDirection, strict: Boolean,
      tolerance: Option[Long], oneRowBatches: Boolean):
      (Map[Long, Long], org.apache.spark.sql.execution.SparkPlan) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamAsOf.streamStaticAsOf(
      input.toDF().toDF("user_id", "event_id", "ts"), rightStatic,
      keys = Seq("user_id" -> "user_id"), order = Seq("ts" -> "ts"),
      strict = strict, tolerance = tolerance, direction = direction)
    val name = s"ssasof_${System.nanoTime()}"
    if (oneRowBatches) leftRows.foreach(r => input.addData(r))
    else input.addData(leftRows: _*)
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "stream must drain")
    val plan = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan
    val out = spark.table(name)
      .select(col("event_id"), col("event_id_r")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    (out, plan)
  }

  /** The batch operator over the same rows — the parity oracle. */
  private def batchExpected(direction: AsOfDirection, strict: Boolean,
      tolerance: Option[Long]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    AsOfJoinPlan.asofJoin(
      leftRows.toDF("user_id", "event_id", "ts"), rightStatic,
      keys = Seq("user_id" -> "user_id"), order = Seq("ts" -> "ts"),
      strict = strict, tolerance = tolerance, direction = direction)
      .select(col("event_id"), col("event_id_r")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
  }

  test("stream-static as-of equals the batch operator in every direction, " +
      "strictness, and tolerance") {
    for {
      dir <- Seq(AsOfDirection.Backward, AsOfDirection.Forward,
        AsOfDirection.Nearest)
      strict <- Seq(false, true)
      tol <- Seq(None, Some(10L * 1000000L))
    } {
      val expected = batchExpected(dir, strict, tol)
      val (got, _) = run(dir, strict, tol, oneRowBatches = false)
      assert(got == expected, s"parity under $dir strict=$strict tol=$tol")
    }
  }

  test("results are independent of micro-batch boundaries (static right = " +
      "stateless, per-row-final)") {
    val expected = batchExpected(AsOfDirection.Backward, false, None)
    val (allAtOnce, _) =
      run(AsOfDirection.Backward, false, None, oneRowBatches = false)
    val (oneByOne, _) =
      run(AsOfDirection.Backward, false, None, oneRowBatches = true)
    assert(allAtOnce == expected && oneByOne == expected,
      "batching must not change any match")
  }

  test("the micro-batch plans broadcast-as-of: no shuffle, no sort, " +
      "no stateful operator") {
    val (_, plan) = run(AsOfDirection.Backward, false, None,
      oneRowBatches = false)
    // AQE wraps the micro-batch plan and hides children from plain
    // traversal — expand through the adaptive root and query stages
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(qs.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val all = nodes(plan)
    assert(all.exists(_.isInstanceOf[BroadcastAsOfJoinExec]),
      s"expected BroadcastAsOfJoinExec in:\n$plan")
    assert(!all.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      s"stream-static as-of must not shuffle:\n$plan")
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      s"stream-static as-of must not sort:\n$plan")
    assert(!all.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.streaming.operators.stateful.StateStoreWriter]),
      s"stream-static as-of must be stateless:\n$plan")
  }

  test("the SQL ASOF surface composes with a streaming left view") {
    // two extension legs at once: the injected parser rewrites the ASOF
    // LEFT JOIN over a STREAMING temp view, the analyzer rule swaps in
    // the AsOfJoin node, and the micro-batch planner picks the broadcast
    // form — ad-hoc SQL as-of enrichment of a live stream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    input.toDF().toDF("user_id", "event_id", "ts")
      .createOrReplaceTempView("ssasof_sql_left")
    rightStatic.createOrReplaceTempView("ssasof_sql_right")
    val joined = spark.sql(
      """SELECT l.event_id AS event_id, r.event_id AS event_id_r
        |FROM ssasof_sql_left l ASOF LEFT JOIN ssasof_sql_right r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin)
    assert(joined.isStreaming, "the rewritten plan must stay streaming")
    input.addData(leftRows: _*)
    val q = joined.writeStream.format("memory").queryName("ssasof_sql")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "stream must drain")
    val got = spark.table("ssasof_sql").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == batchExpected(AsOfDirection.Backward, false, None),
      s"SQL-over-stream must equal the batch operator, got $got")
  }

  test("guards: batch left and streaming right are refused with the " +
      "correct redirection") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val batchLeft = leftRows.toDF("user_id", "event_id", "ts")
    val e1 = intercept[IllegalArgumentException] {
      StreamAsOf.streamStaticAsOf(batchLeft, rightStatic,
        Seq("user_id" -> "user_id"), Seq("ts" -> "ts"))
    }
    assert(e1.getMessage.contains("asofJoin"))
    val input = MemoryStream[(Long, Long, Timestamp)]
    val streaming = input.toDF().toDF("user_id", "event_id", "ts")
    val e2 = intercept[IllegalArgumentException] {
      StreamAsOf.streamStaticAsOf(streaming, streaming,
        Seq("user_id" -> "user_id"), Seq("ts" -> "ts"))
    }
    assert(e2.getMessage.contains("matchesEventTime") ||
      e2.getMessage.contains("stream-stream"))
  }
}
