package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed graph measures over edge-list DataFrames — the companion to
  * [[graft.dedup.Dedup.connectedComponents]] (which owns the cluster-finding
  * half of the graph story). Public-literature algorithms only (Page et al.
  * 1999); no reference analog — the reference delegates relational analytics
  * to Postgres and has no graph surface.
  *
  * Scale notes: one iteration = one equi-join (edges × ranks on src) plus one
  * hash aggregate on dst — both shuffle on a node key, never on a pair.
  * `localCheckpoint` after every iteration truncates the growing lineage
  * (the same discipline as connected components: a cached-but-uncheckpointed
  * iterate re-executes the whole chain on executor loss and its plan doubles
  * per round).
  */
object Graph {

  /** PageRank (non-normalized variant: `pr = (1-d) + d·Σ pr(u)/outdeg(u)`,
    * fixed iteration count) over a DIRECTED edge list. Undirected graphs:
    * symmetrize before calling (`union` of both directions) — then every
    * node has outdegree ≥ 1 and no dangling-mass term is needed; this
    * function requires that property and drops rank mass from true sinks.
    *
    * Engine-parity: each per-edge contribution `pr/outdeg` is cast to
    * DECIMAL(38,12) BEFORE the sum, so the aggregate is exact and
    * order-independent — two engines (or two shuffle layouts) produce
    * bit-identical ranks every iteration, which keeps the whole fixed-point
    * chain deterministic end-to-end.
    *
    * Job shape: the invariant (src, dst, outdeg) table checkpoints ONCE;
    * the rank iterates do NOT checkpoint every round — PageRank's lineage
    * grows linearly (one join + one agg per round, no self-join), so the
    * whole fixed-point chain compiles into ONE multi-stage job in which
    * each iteration is a map-combined O(E)→O(V) aggregate stage and the
    * O(V) ranks side broadcasts into the edge join (AQE). Eager per-round
    * materialization (the connected-components discipline) pays a job
    * launch + checkpoint write per round and is only needed when the loop
    * self-joins; a checkpoint every 8th round still bounds plan depth for
    * deep runs without taxing the common shallow ones.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("long").as("outdeg"))
      .localCheckpoint()
    // the edge list is iteration-invariant: checkpoint once and reuse
    val ed = e.localCheckpoint()
    // contributions PRE-DIVIDE on the O(V) ranks side: pr/outdeg computes
    // once per NODE (and the decimal cast with it), so the O(E) edge join
    // carries a ready 2-column (node, contrib) build side instead of
    // dividing per edge — same numbers divided, bit-identical contribs,
    // |V|/|E| of the arithmetic
    var ranks = deg.select(col("src").as("node"), lit(1.0).as("pr"))
    for (i <- 1 to iterations) {
      val contribs = ranks.join(broadcast(deg.select(col("src").as("node"),
          col("outdeg"))), "node")
        .select(col("node"),
          (col("pr") / col("outdeg")).cast(DecimalType(38, 12)).as("contrib"))
      ranks = ed.join(contribs, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg((lit(1.0 - damping) +
          lit(damping) * sum(col("contrib")).cast("double")).as("pr"))
      if (i % 8 == 0) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle participation counts over an UNDIRECTED edge list
    * (each edge once, either direction; self-loops and duplicates are
    * dropped here). Compact-forward algorithm (Latapy 2008; Schank &
    * Wagner 2005): orient every edge from its lower-(degree, id) endpoint
    * to the higher one — an acyclic orientation under which each triangle
    * appears EXACTLY once as (a→b, b→c, a→c) — then close wedges with two
    * equi-joins. The orientation is the scale lever: a node's forward
    * adjacency is bounded by O(sqrt(|E|)) regardless of its real degree,
    * so the wedge join never explodes on hubs the way a naive
    * undirected-adjacency self-join does. Every step is an equi-join or
    * hash aggregate on a node key — no theta products.
    */
  /** Edge-count ceiling under which [[triangleCounts]] runs its bounded
    * regime: the forward ADJACENCY (one array per node, Σ lengths = |E|,
    * ≈ 16 MB of longs at the ceiling) broadcasts and each edge closes its
    * own triangles with an in-row set intersection — no wedge row is ever
    * materialized through join machinery. Past the ceiling the operator
    * falls back to the shuffle wedge join + semi-join close, the correct
    * posture for billion-edge graphs where nothing bounded fits an
    * executor.
    */
  private val BroadcastEdgeLimit = 8L * 1000 * 1000

  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // checkpoint the deduped edge set FIRST: deg scans it twice and the
    // orientation join once more — uncheckpointed, the upstream pair
    // build would run three times
    val e0 = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    val nEdges = e0.count() // O(1) scan of the checkpoint just written
    val small = nEdges <= BroadcastEdgeLimit
    // deg has one row per NODE (≤ 2|E|, usually far fewer) — broadcast it
    // into the orientation join while the graph is bounded, so orienting
    // costs zero shuffles on the edge stream
    def boundedDeg(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val deg = e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("d"))
    val fwd = e0
      .join(boundedDeg(deg.select(col("node").as("u"), col("d").as("du"))), "u")
      .join(boundedDeg(deg.select(col("node").as("v"), col("d").as("dv"))), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"))
      .localCheckpoint()
    val tri =
      if (small) {
        // Bounded regime: the whole forward ADJACENCY (one array per node,
        // Σ lengths = |E| ≈ 16 MB at the 8M ceiling) broadcasts, and each
        // oriented edge (a,b) closes its triangles as array_intersect(
        // adj(a), adj(b)) — the classic edge-iterator formulation. The
        // O(W) wedge stream is never materialized as join rows: closure
        // work happens inside one per-row set intersection, so the only
        // shuffle left in the whole query is the final per-node count agg.
        val adj = fwd.groupBy(col("s")).agg(collect_list(col("t")).as("nbrs"))
        fwd
          .join(broadcast(adj.select(col("s").as("a"), col("nbrs").as("na"))),
            col("s") === col("a"))
          .join(broadcast(adj.select(col("s").as("b"), col("nbrs").as("nb"))),
            col("t") === col("b"))
          .select(col("a"), col("b"),
            explode(array_intersect(col("na"), col("nb"))).as("c"))
      } else {
        // Scale regime (past the broadcast ceiling): shuffle wedge join +
        // (a,c) semi-join close — every step an equi-join on a node key,
        // the correct posture for billion-edge graphs
        fwd.as("e1")
          .join(fwd.as("e2"), col("e1.t") === col("e2.s"))
          .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
          .join(fwd.select(col("s").as("a"), col("t").as("c")),
            Seq("a", "c"), "left_semi")
      }
    // one pass: each triangle contributes at all three corners via explode
    // (a 3-way union would execute the closure three times); the agg is
    // map-combined down to per-partition distinct nodes before its shuffle
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("long").as("n_triangles"))
  }
}
