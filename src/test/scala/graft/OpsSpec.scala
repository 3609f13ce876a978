package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

class OpsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("dedupLatest keeps exactly the newest row per key and is idempotent") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, "old"), ("a", 2, "new"), ("b", 5, "only"))
      .toDF("k", "v", "tag")
    val deduped = Relational.dedupLatest(df, Seq("k"), Seq(col("v").desc))
    val got = deduped.collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got == Set(("a", "new"), ("b", "only")))
    // idempotency: load(load(x)) == load(x)
    val twice = Relational.dedupLatest(deduped, Seq("k"), Seq(col("v").desc))
    assert(twice.collect().toSet == deduped.collect().toSet)
  }

  test("calendarGaps returns exactly the absent buckets") {
    import spark.implicits._
    val present = Seq("2024-01-01 00:10:00", "2024-01-01 01:20:00",
      "2024-01-01 03:59:00") // hour 02 missing
      .map(java.sql.Timestamp.valueOf).toDF("ts")
    val gaps = Relational.calendarGaps(present, "ts", "hour", "1 hour")
      .collect().map(_.getTimestamp(0).toString)
    assert(gaps.toSeq == Seq("2024-01-01 02:00:00.0"))
  }

  test("sessionize splits on gap > threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"),
      (1L, "2024-01-01 02:00:00"), (2L, "2024-01-01 00:00:00"))
      .map { case (u, t) => (u, java.sql.Timestamp.valueOf(t)) }
      .toDF("user_id", "ts")
    val s = Relational.sessionize(df, "user_id", "ts", 1800)
    val sessions = s.groupBy(col("user_id"), col("session_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sessions == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("zipExplode pads ragged arrays with null") {
    import spark.implicits._
    val df = Seq((Seq(1, 2, 3), Seq("x", "y")))
      .toDF("nums", "labels")
    val out = Relational.zipExplode(df, Seq("nums", "labels"), Nil).collect()
    assert(out.length == 3)
    assert(out(2) == Row(3, null))
  }

  test("capPerGroup caps each group and picks a partitioning-independent subset") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val once = Relational.capPerGroup(df, "grp", "id", maxRows = 10)
    val counts = once.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 10L, "b" -> 10L))
    assert(once.agg(org.apache.spark.sql.functions.max("keep_rank"))
      .collect()(0).getLong(0) == 10L)
    // same kept ids no matter how the input is partitioned
    val again = Relational.capPerGroup(df.repartition(7), "grp", "id", 10)
    assert(once.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("budgetPerGroup's two-stage running total matches the naive " +
      "single-window cumsum and is partitioning-independent") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 200 ids spread across many hash-range buckets; weights vary per row
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else "b", i % 7 + 1))
      .toDF("id", "grp", "w")
    val out = Relational.budgetPerGroup(df, "grp", "id", "w", lit(150L))
    graft.functions.PolyHash.register(spark)
    val hv = expr("graft_poly_hash(CAST(id AS STRING), 31, 1000000007)")
    val naive = df.withColumn("__hv", hv)
      .withColumn("cum", sum(col("w")).over(
        Window.partitionBy(col("grp")).orderBy(col("__hv"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = out.select("id", "cum_weight").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = naive.select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // kept = inclusive total within budget; both kept and dropped exist
    val kept = out.filter(col("kept")).agg(max(col("cum_weight")))
      .collect()(0).getLong(0)
    assert(kept <= 150L)
    assert(out.filter(!col("kept")).count() > 0)
    // partitioning-independent kept set
    val again = Relational.budgetPerGroup(df.repartition(7), "grp", "id", "w", lit(150L))
    assert(out.filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet ==
      again.filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet)
  }

  test("epochShuffle numbers the hash permutation like a naive global " +
      "row_number, independent of partitioning, and re-deals per epoch") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
    val out = Relational.epochShuffle(df, "id", epoch = 1, nShards = 8)
    // pos is a permutation of 1..N and shard deals it round-robin
    assert(out.select("pos").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 200L).toSeq)
    assert(out.filter(pmod(col("pos") - 1, lit(8L)) =!= col("shard")).count() == 0)
    // two-stage numbering == naive single-window global row_number
    val naive = out.select(col("id"), col("pos"), row_number().over(
        Window.orderBy(col("shuffle_key"), col("id"))).cast("long").as("np"))
    assert(naive.filter(col("pos") =!= col("np")).count() == 0)
    // partitioning-independent
    val again = Relational.epochShuffle(df.repartition(7), "id", 1, 8)
    assert(out.select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      again.select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // a different epoch is a different permutation
    val e2 = Relational.epochShuffle(df, "id", epoch = 2, nShards = 8)
    val p1 = out.select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p2 = e2.select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 != p2)
  }

  test("systematicSample: tick count is weight-proportional, heavy rows win " +
    "multiple ticks, zero weights never select") {
    val s = spark
    import s.implicits._
    // stratum "a": weights 1,1,8 over total 10, k=5 → midpoint ticks at
    // 1,3,5,7,9. Tick 1 sits exactly on doc 1's upper boundary → doc 2's
    // half-open interval [1,2) takes it; ticks 3..9 all land in doc 3's
    // [2,10) — the weight-8 row wins 4 of 5 ticks, weight-proportional
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 8L),
      ("a", 4L, 0L),                    // zero weight: never selectable
      ("b", 10L, 5L))                   // second stratum: all ticks on it
      .toDF("src", "id", "w")
    val got = Relational.systematicSample(df, "src", "w", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("a", 0L, 2L),
      ("a", 1L, 3L), ("a", 2L, 3L), ("a", 3L, 3L), ("a", 4L, 3L),
      ("b", 0L, 10L), ("b", 1L, 10L), ("b", 2L, 10L),
      ("b", 3L, 10L), ("b", 4L, 10L)), got.toString)
    // partitioning-independent: same sample from a repartitioned input
    val again = Relational.systematicSample(df.repartition(7), "src", "w", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got)
  }
}
