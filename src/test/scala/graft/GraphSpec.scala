package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a directed cycle is the all-ones fixed point") {
    // every node has outdeg 1 and indeg 1: pr = 0.15 + 0.85·1 = 1 forever
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val out = Graph.pageRank(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set("a", "b", "c"))
    out.values.foreach(pr => assert(pr === 1.0))
  }

  test("pageRank concentrates rank on the hub of an undirected star") {
    // center x, leaves l1..l3; symmetrized by hand like the g01 query does.
    // r1(x) = 0.15 + 0.85·(3·1/1) = 2.7; r1(leaf) = 0.15 + 0.85·(1/3)
    // r2(x) = 0.15 + 0.85·3·r1(leaf); r2(leaf) = 0.15 + 0.85·(r1(x)/3)
    val oneWay = Seq(("x", "l1"), ("x", "l2"), ("x", "l3"))
    val edges = (oneWay ++ oneWay.map(_.swap)).toDF("src", "dst")
    val out = Graph.pageRank(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r1Leaf = 0.15 + 0.85 * (1.0 / 3.0)
    assert(math.abs(out("x") - (0.15 + 0.85 * 3.0 * r1Leaf)) < 1e-9)
    assert(math.abs(out("l2") - (0.15 + 0.85 * (2.7 / 3.0))) < 1e-9)
    assert(out("x") > out("l1"))
  }

  test("pageRank truncates lineage every iteration (checkpointed iterate)") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val plan = Graph.pageRank(edges, "src", "dst", iterations = 5)
      .queryExecution.executedPlan.toString
    // the returned frame must scan the checkpointed RDD of the last round,
    // not replay five joins — an unbounded plan re-executes on failure and
    // doubles per iteration
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("triangleCounts: K4 has every node in C(3,2)=3 triangles") {
    val e = Seq(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")).toDF("u", "v")
    val out = Graph.triangleCounts(e, "u", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("triangleCounts: a 4-cycle has none; duplicates/reversals/loops don't inflate") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("b", "a"), ("a", "b"), ("a", "a")).toDF("u", "v")
    assert(Graph.triangleCounts(e, "u", "v").count() === 0L)
    // one real triangle, listed messily: counted exactly once per corner
    val t = Seq(("x", "y"), ("y", "x"), ("y", "z"), ("x", "z"), ("z", "x"))
      .toDF("u", "v")
    val out = Graph.triangleCounts(t, "u", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("x" -> 1L, "y" -> 1L, "z" -> 1L))
  }

  test("triangleCounts joins stay equi-joins (no theta product)") {
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("u", "v")
    val plan = Graph.triangleCounts(e, "u", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
