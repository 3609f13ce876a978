package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.CosineSimilarity

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - `bruteForceTopK` is the exact baseline: broadcast the (small) probe
  *    set against the corpus, compute cosine per pair inside whole-stage
  *    codegen (`zip_with` + `aggregate` on doubles — no UDFs), rank with
  *    one window shuffle keyed by probe.
  *  - `cellTopK` is the IVF-style scale path: both sides are keyed by a
  *    coarse cell id (here the `label` column standing in for a centroid
  *    assignment), so each probe only scans its own cell — the scan cost
  *    drops by the number of cells and the join is an equi-join on the
  *    cell key instead of a cross product.
  *
  * Cosines are computed in double precision (floats widened first) and
  * rounded to 6 decimals so results are reproducible across engines.
  */
object Similarity {

  /** embedding array<float> → array<double>, unit work per row. */
  private def widened(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__v", transform(col(vecCol), x => x.cast("double")))

  // cosine via the native codegen'd expression (graft.functions.
  // CosineSimilarity) — same left-to-right accumulation as the
  // zip_with+aggregate formulation, so results are bit-identical, but it
  // runs inside whole-stage codegen instead of interpreted HOF lambdas.

  /** Exact cosine top-k: for every probe row (filtered by `isProbe`), the k
    * nearest corpus vectors (excluding itself), ties broken by neighbor id.
    */
  def bruteForceTopK(
      emb: DataFrame,
      isProbe: Column,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpus = widened(emb, vecCol).select(col(idCol).as("nid"), col("__v"))
    val probes = widened(emb.filter(isProbe), vecCol)
      .select(col(idCol).as("pid"), col("__v").as("__pv"))
    rank(corpus.crossJoin(broadcast(probes)), k)
  }

  /** IVF-style ANN: restrict each probe to its own coarse cell. */
  def cellTopK(
      emb: DataFrame,
      isProbe: Column,
      k: Int,
      cellCol: String = "label",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpus = widened(emb, vecCol)
      .select(col(idCol).as("nid"), col(cellCol).as("__cell"), col("__v"))
    val probes = widened(emb.filter(isProbe), vecCol)
      .select(col(idCol).as("pid"), col(cellCol).as("__pcell"), col("__v").as("__pv"))
    rank(corpus.join(broadcast(probes), col("__cell") === col("__pcell")), k)
  }

  private def rank(pairs: DataFrame, k: Int): DataFrame = {
    val cos = round(
      CosineSimilarity(pairs.sparkSession, col("__pv"), col("__v")), 6)
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col("nid"))
    pairs
      .filter(col("nid") =!= col("pid"))
      .withColumn("cos_sim", cos)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("pid"), col("nid"), col("cos_sim"), col("__rn").cast("long").as("rank"))
  }

  /** Random-hyperplane LSH signatures for cosine similarity (Charikar's
    * SimHash for dense vectors, public literature): bit j of the signature
    * is the sign of `v · h_j`, where hyperplane `h_j` is derived
    * deterministically from (j, dimension index) by integer hashing — no
    * stored model, any engine can regenerate it, and
    * P[bit_a = bit_j] = 1 − θ(a,b)/π. Bucketing on signature prefixes
    * groups likely-similar vectors without any pairwise work: the
    * LSH-bucketed scale path next to the IVF one.
    */
  def hyperplaneSignatures(
      emb: DataFrame,
      nBits: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // h(j, i) in [-0.5, 0.5): Knuth multiplicative hash of the flat index
    val sig = expr(
      s"""aggregate(sequence(0, ${nBits - 1}), cast(0 as bigint), (acc, j) ->
         |  acc + if(
         |    aggregate(zip_with(transform(v, x -> cast(x as double)),
         |                       transform(sequence(0, size(v) - 1), i ->
         |                         cast((cast(j as bigint) * size(v) + i) * 2654435761 % 2147483647 as double)
         |                           / 2147483647 - 0.5),
         |                       (x, h) -> x * h),
         |              cast(0 as double), (a, z) -> a + z) >= 0,
         |    shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""".stripMargin)
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), sig.as("lsh_sig"))
  }

  /** Candidate pairs from hyperplane-LSH bucketing: vectors sharing the
    * full signature land in one bucket; the equi-join on the signature is
    * the only shuffle. Pair with exact cosine verification downstream.
    */
  def hyperplaneCandidates(signatures: DataFrame): DataFrame =
    signatures.as("a").join(signatures.as("b"),
        col("a.lsh_sig") === col("b.lsh_sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"))

  /** Embedding-cosine near-dup: all pairs within a coarse cell whose
    * cosine meets `threshold` — a threshold similarity join. Cell blocking
    * keeps the candidate product bounded per cell (the IVF partitioning
    * again); the cosine itself is one codegen'd expression per pair.
    */
  def cosineNearDup(
      emb: DataFrame,
      threshold: Double,
      cellCol: String = "label",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val t = widened(emb, vecCol)
      .select(col(idCol).as("id"), col(cellCol).as("cell"), col("__v"))
    val pairs = t.as("a").join(t.as("b"),
      col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
    val cos = round(CosineSimilarity(pairs.sparkSession,
      col("a.__v"), col("b.__v")), 6)
    pairs
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"), cos.as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Embedding-quality pruning by centroid distance — the vector-side
    * analogue of the text quality filter: score every vector's cosine to
    * its label's MEAN vector and flag the ones pointing away (mislabeled /
    * noise / encoder-failure rows, the SemDeDup-paper preprocessing cut).
    * Shape: one per-dimension explode, a (label, dim) hash agg for the
    * centroids (|labels|·d rows — broadcast-sized at any corpus scale),
    * and the score join reuses the same (label, dim) key before
    * re-aggregating per vector. Engine parity: per-dim sums and the three
    * cosine accumulators go through DECIMAL casts, so centroid AND score
    * are bit-identical regardless of row order; sqrt is IEEE-exact. The
    * outlier flag compares the RAW double against the threshold (never the
    * rounded value), and the displayed 6-dp score rounds via
    * sign·floor(|x|·1e6 + 0.5) — all IEEE-exact double ops, so both
    * engines agree even on `...5` ties where native round() diverges
    * (Spark rounds the shortest decimal rendering, DuckDB the binary
    * double).
    */
  def centroidOutliers(
      emb: DataFrame,
      threshold: Double,
      labelCol: String = "label",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dec = DecimalType(38, 12)
    val d = widened(emb, vecCol)
      .select(col(idCol), col(labelCol),
        posexplode(col("__v")).as(Seq("dim", "x")))
    val cent = d.groupBy(col(labelCol), col("dim"))
      .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1))).as("c"))
    d.join(cent, Seq(labelCol, "dim"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sum((col("x") * col("c")).cast(dec)).as("__dot"),
        sum((col("x") * col("x")).cast(dec)).as("__x2"),
        sum((col("c") * col("c")).cast(dec)).as("__c2"))
      .select(col(idCol), col(labelCol),
        (col("__dot").cast("double") /
          (sqrt(col("__x2").cast("double")) * sqrt(col("__c2").cast("double"))))
          .as("__cos"))
      .select(col(idCol), col(labelCol),
        (signum(col("__cos")) * floor(abs(col("__cos")) * 1e6 + 0.5) / 1e6)
          .as("cos_centroid"),
        (col("__cos") < threshold).as("is_outlier"))
  }

  /** Johnson-Lindenstrauss random projection with deterministic ±1 signs
    * (public literature: Achlioptas 2003 — database-friendly random
    * projections): out[j] = Σᵢ sign(i,j)·v[i], where sign(i,j) is the
    * parity of a squared multiplicative hash of the flattened (i,j)
    * index. Distances are preserved
    * within (1±ε) at outDims = O(log n / ε²), which turns a 64-dim ANN
    * problem into a 16-dim one — the standard pre-reduction before LSH or
    * IVF at corpus scale.
    *
    * Scale: shuffle-free projection, O(inDims·outDims) per row; the sign
    * matrix is DERIVED from the index pair, so nothing is broadcast and
    * every executor regenerates it identically — no driver state, no seed
    * shipping. The inner fold is strictly sequential (i ascending), so the
    * double sum is bit-identical on any engine replaying the same order
    * (same discipline as s07's norm fold); values go out unrounded.
    */
  def randomProjection(
      emb: DataFrame,
      outDims: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // sign(i,j) ∈ {+1,-1} from the parity of a SQUARED multiplicative hash
    // of the flattened index: h = ((i·1024+j+1)·2654435761) mod p, s = h²
    // mod p (p = 2^31-1). The squaring matters: any affine-only mix makes
    // column pairs differ by a CONSTANT mod p, so their parities correlate
    // almost perfectly and the 16 output dims collapse to a few effective
    // samples (measured maxcorr 0.97 → JL concentration fails); squaring
    // breaks the affine structure (measured maxcorr 0.31 ≈ the 64-sample
    // noise floor). Exact BIGINT arithmetic in both engines: h ≤ 2^31 ⇒
    // h² ≤ 4.62e18 < 2^63. The projection runs as the native codegen'd
    // JlProject expression — one fused loop, i-ascending adds, bit-equal
    // to the HOF fold it replaced (spec-pinned by the driver-side replay).
    widened(emb, vecCol)
      .select(col(idCol), posexplode(
        graft.functions.JlProject(emb.sparkSession, col("__v"), outDims))
        .as(Seq("out_dim", "value")))
      .select(col(idCol), col("out_dim").cast("long").as("out_dim"),
        col("value"))
  }
}
