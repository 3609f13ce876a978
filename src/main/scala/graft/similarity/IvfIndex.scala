package graft.similarity

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** IVF (inverted-file) approximate-nearest-neighbor index with learned
  * coarse centroids — the scale path past `Similarity.bruteForceTopK`:
  *
  *  1. train k-means centroids over (a sample of) the corpus;
  *  2. assign every vector to its nearest centroid (its cell) — this is
  *     the partitioning key of the index;
  *  3. search scans only the `nProbe` cells whose centroids are nearest
  *     the probe, turning the per-probe cost from O(corpus) into
  *     O(nProbe · corpus / k).
  *
  * With `nProbe = k` the search degenerates to exact brute force (the spec
  * asserts equality with `bruteForceTopK` there). All search-time work is
  * equi-joins + the codegen'd cosine — no cross product, no driver loops
  * over data (centroids are O(k·dim), inherently tiny).
  */
object IvfIndex {

  final case class Index(model: KMeansModel, assigned: DataFrame)

  private def widened(vecCol: String): Column =
    transform(col(vecCol), x => x.cast("double"))

  /** Train centroids and assign each corpus vector to its cell. `maxIter`
    * is capped low: Lloyd convergence only tunes cell balance, never
    * correctness — whatever centroids come out are exported and DEFINE the
    * index (the oracle reads them back), and each extra iteration is a
    * full corpus pass (several scheduler round-trips on small data, a real
    * shuffle at scale).
    */
  def build(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", maxIter: Int = 8): Index = {
    val vecs = emb.select(col(idCol), widened(vecCol).as("v"))
      .withColumn("fv", array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(maxIter)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(vecs)
    val assigned = model.transform(vecs)
      .select(col(idCol).as("nid"), col("cell"), col("v"))
    Index(model, assigned)
  }

  /** Centroids as a small DataFrame (cell, centroid) — O(k·dim). */
  def centroids(ix: Index): DataFrame = {
    val spark = ix.assigned.sparkSession
    import spark.implicits._
    ix.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
      .toSeq.toDF("cell", "centroid")
  }

  /** BASE directory where s06 materializes its trained centroids so the
    * DuckDB oracle can reproduce assignment from the SAME doubles (parquet
    * roundtrips doubles exactly). [[learnedSearch]] writes under
    * `<base>/sig=<corpus signature>` ([[ModelExport.sigPath]]) and the
    * static oracle SQL selects the matching partition by recomputing the
    * signature from its own table ([[ModelExport.oracleFromWhere]]), so
    * runs at different SFs never clobber each other's exported doubles.
    */
  val ExportedCentroidsPath = "/tmp/graft_ivf_centroids"

  /** s08's own export base: it probes fewer cells than s06 (nProbe=2),
    * and a shared path would let one query's export clobber the doubles the
    * other query's static oracle SQL reads at compare time.
    */
  val ExportedCentroidsRecallPath = "/tmp/graft_ivf_centroids_s08"

  /** Assign every vector to its argmax-cosine cell over an arbitrary
    * centroid frame `cent` (cell, cv: array<double>). Cosines rounded to 6
    * decimals and ties to the lowest cell so any engine given the same
    * centroid doubles ranks identically. Returns (nid, cell, v). One
    * broadcast of O(nCells·dim) + one window shuffle keyed by vector id.
    */
  def assignByCosine(emb: DataFrame, cent: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    winningAssignment(emb, cent, idCol, vecCol)
      .select(col("nid"), col("cell"), col("v"))

  /** THE argmax-cosine assignment both public faces share — one
    * formulation of the rounding, tie-break, and widening rules, so the
    * index assignment ([[assignByCosine]]) and the drift monitor
    * ([[assignmentCosines]]) can never silently disagree about which
    * cell wins. Returns (nid, cell, v, a_cos).
    */
  private def winningAssignment(emb: DataFrame, cent: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).as("nid"), widened(vecCol).as("v"))
    val w = Window.partitionBy(col("nid"))
      .orderBy(col("a_cos").desc, col("cell").asc)
    e.crossJoin(broadcast(cent))
      .withColumn("a_cos", round(CosineSimilarity(spark, col("v"), col("cv")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("nid"), col("cell"), col("v"), col("a_cos"))
  }

  /** [[assignByCosine]] KEEPING the winning cosine — the statistic the
    * drift monitor bins. Returns (nid, cell, a_cos).
    */
  def assignmentCosines(emb: DataFrame, cent: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    winningAssignment(emb, cent, idCol, vecCol)
      .select(col("nid"), col("cell"), col("a_cos"))

  /** DRIFT MONITOR for the frozen-centroid append path ([[s15]]'s twin,
    * the statistic that says when freezing stops being safe): histogram
    * of each vector's WINNING assignment cosine, training cohort vs
    * arrival cohort, over `buckets` equal-width bins spanning [-1, 1].
    * A healthy append keeps the arrival distribution on top of the
    * training one; drifted arrivals pile into the low-cosine bins —
    * vectors the frozen cells no longer represent. One broadcast of the
    * centroid set + one hash-agg per cohort: O((n_train + n_arrivals) ·
    * nCells · dim) and NO corpus re-scan beyond the cohorts, so the
    * monitor costs what the append itself costs. (FAISS/Milvus
    * deployments watch exactly this quantization error to schedule
    * re-clustering; public practice.)
    *
    * Output: (cohort 'train'|'arrive', bucket 0..buckets-1, n_vectors).
    * Bucket math on the 6-decimal-rounded cosine: floor((a_cos+1)/2·B)
    * clamped to B-1 — bit-identical in any engine given the same doubles.
    */
  def assignmentDriftHistogram(initial: DataFrame, arrivals: DataFrame,
      cent: DataFrame, buckets: Int = 20, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    def hist(df: DataFrame, label: String): DataFrame =
      assignmentCosines(df, cent, idCol, vecCol)
        .select(lit(label).as("cohort"),
          least(lit(buckets - 1).cast("long"),
            floor((col("a_cos") + 1) / 2 * buckets)).as("bucket"))
        .groupBy(col("cohort"), col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_vectors"))
    hist(initial, "train").unionByName(hist(arrivals, "arrive"))
  }

  /** The RETRAIN FLAG the histogram feeds: arrivals' mean assignment
    * cosine more than `tolerance` below the training mean. Means sum in
    * DECIMAL(38,12) so the flag is order- and partitioning-independent.
    * Returns (trainMean, arrivalMean, retrain) — two 1-row aggregates,
    * bounded driver data.
    */
  def assignmentDriftFlag(initial: DataFrame, arrivals: DataFrame,
      cent: DataFrame, tolerance: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): (Double, Double, Boolean) = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    def mean(df: DataFrame, cohort: String): Double = {
      val row = assignmentCosines(df, cent, idCol, vecCol)
        .agg(round(
          sum(col("a_cos").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
            .cast("double") / count(lit(1)), 6).as("m"))
        .head()
      // an empty cohort sums to NULL — a meaningless mean, so refuse it
      // descriptively rather than let getDouble NPE opaquely
      if (row.isNullAt(0)) throw new IllegalArgumentException(
        s"assignmentDriftFlag: the '$cohort' cohort is empty — a drift " +
          "mean over zero vectors is undefined; pass both a non-empty " +
          "training sample and a non-empty arrival batch")
      row.getDouble(0)
    }
    val t = mean(initial, "train")
    val a = mean(arrivals, "arrive")
    (t, a, a < t - tolerance)
  }

  /** IVF search over an arbitrary centroid frame `cent` (cell, cv) with
    * 1 ≤ nProbe ≤ nCells: assign the corpus by argmax cosine, rank cells
    * per probe by centroid cosine, scan only the top `nProbe` cells'
    * vectors, return cosine top-k. Equi-join on the cell key — per-probe
    * cost is O(nProbe · corpus / nCells), never a cross product.
    */
  def searchWithCentroids(emb: DataFrame, cent: DataFrame, isProbe: Column,
      k: Int, nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val assigned = assignByCosine(emb, cent, idCol, vecCol)
    val probes = emb.filter(isProbe)
      .select(col(idCol).as("pid"), widened(vecCol).as("__pv"))
    val wc = Window.partitionBy(col("pid"))
      .orderBy(col("c_cos").desc, col("cell").asc)
    val probeCells = probes.crossJoin(broadcast(cent))
      .withColumn("c_cos", round(CosineSimilarity(spark, col("__pv"), col("cv")), 6))
      .withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= nProbe)
      .select(col("pid"), col("__pv"), col("cell"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col("nid"))
    probeCells.join(assigned, Seq("cell"))
      .filter(col("nid") =!= col("pid"))
      .withColumn("cos_sim",
        round(CosineSimilarity(spark, col("__pv"), col("v")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("pid"), col("nid"), col("cos_sim"),
        col("__rn").cast("long").as("knn_rank"))
  }

  /** nProbe SWEEP support (s14's auto-tune): the per-config searches
    * share everything but the probe-cell cutoff — assignment, probe-cell
    * ranking, and candidate verification are all config-invariant, and
    * the candidate sets NEST (nProbe=1 ⊂ 2 ⊂ ... ⊂ maxNProbe). So
    * assign, rank, and verify ONCE at the maximal cutoff and return the
    * verified candidates with the probe-cell rank attached; a config's
    * result is then `probe_rank <= nProbe` + its own top-k window —
    * tuning costs one search, not |configs| searches.
    * Output: (pid, nid, cos_sim, probe_rank).
    */
  def probeSweep(emb: DataFrame, k: Int, isProbe: Column, maxNProbe: Int,
      exportPath: String = ExportedCentroidsPath,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(maxNProbe >= 1 && maxNProbe <= k,
      s"maxNProbe=$maxNProbe out of [1,$k]")
    val spark = emb.sparkSession
    val ix = build(emb, k, idCol, vecCol)
    val cent = centroids(ix).select(col("cell"), col("centroid").as("cv"))
    cent.coalesce(1).write.mode("overwrite")
      .parquet(ModelExport.sigPath(exportPath, emb, idCol))
    val assigned = assignByCosine(emb, cent, idCol, vecCol)
    val probes = emb.filter(isProbe)
      .select(col(idCol).as("pid"), widened(vecCol).as("__pv"))
    val wc = Window.partitionBy(col("pid"))
      .orderBy(col("c_cos").desc, col("cell").asc)
    val probeCells = probes.crossJoin(broadcast(cent))
      .withColumn("c_cos", round(CosineSimilarity(spark, col("__pv"), col("cv")), 6))
      .withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= maxNProbe)
      .select(col("pid"), col("__pv"), col("cell"), col("__cr"))
    probeCells.join(assigned, Seq("cell"))
      .filter(col("nid") =!= col("pid"))
      .withColumn("cos_sim",
        round(CosineSimilarity(spark, col("__pv"), col("v")), 6))
      .select(col("pid"), col("nid"), col("cos_sim"),
        col("__cr").cast("long").as("probe_rank"))
  }

  /** Deterministic "seeded" centroid frame: the embeddings of the `nCells`
    * lowest ids (k-means++'s seeding step without the Lloyd iterations —
    * no trained model, so ANY engine can reproduce the exact index from
    * the table alone).
    */
  def seededCentroids(emb: DataFrame, nCells: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.filter(col(idCol) < nCells)
      .select(col(idCol).as("cell"), widened(vecCol).as("cv"))

  /** [[assignByCosine]] over the seeded centroids — the oracle-checkable
    * variant of [[build]]'s assignment.
    */
  def seededAssign(emb: DataFrame, nCells: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    assignByCosine(emb, seededCentroids(emb, nCells, idCol, vecCol), idCol, vecCol)

  /** IVF search over the seeded index — [[searchWithCentroids]] with the
    * reproducible-from-the-table centroid set.
    */
  def seededSearch(emb: DataFrame, nCells: Int, isProbe: Column, k: Int,
      nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, s"nProbe=$nProbe out of [1,$nCells]")
    searchWithCentroids(emb, seededCentroids(emb, nCells, idCol, vecCol),
      isProbe, k, nProbe, idCol, vecCol)
  }

  /** The learned-index twin of [[seededSearch]]: train k-means centroids
    * ([[build]]'s step 1), EXPORT them as (cell, cv) parquet under
    * `exportPath`'s corpus-signature partition ([[ModelExport.sigPath]]),
    * then run the same rounded-cosine assignment + nProbe search over
    * them. Because the oracle reads the exported doubles back bit-exactly,
    * the full search — Lloyd-trained centroids included — is
    * hash-checkable in any engine (reference: pgvector-style IVFFlat /
    * FAISS IVF, public literature).
    */
  def learnedSearch(emb: DataFrame, k: Int, isProbe: Column, topK: Int,
      nProbe: Int, exportPath: String = ExportedCentroidsPath,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && nProbe <= k, s"nProbe=$nProbe out of [1,$k]")
    val ix = build(emb, k, idCol, vecCol)
    val cent = centroids(ix).select(col("cell"), col("centroid").as("cv"))
    cent.coalesce(1).write.mode("overwrite")
      .parquet(ModelExport.sigPath(exportPath, emb, idCol))
    searchWithCentroids(emb, cent, isProbe, topK, nProbe, idCol, vecCol)
  }

  /** s11's export base (see [[ExportedCentroidsRecallPath]] for why each
    * learned-model query owns its path).
    */
  val ExportedCentroidsSemDedupPath = "/tmp/graft_ivf_centroids_s11"

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication = k-means the embedding space, then look for
    * near-identical pairs ONLY within each cluster — the cluster bound is
    * what keeps the pairwise step from being corpus-quadratic (the paper
    * scales k with the corpus so cells stay small; same lever here). A
    * vector is a duplicate iff some LOWER-id vector in its cell has
    * cosine >= `threshold` — the deterministic keep-first greedy, so the
    * kept set is engine- and partitioning-independent (the paper keeps
    * per-ball exemplars; first-wins is the oracle-checkable variant).
    *
    * Trained centroids EXPORT under the corpus-signature partition
    * ([[ModelExport.sigPath]]) exactly like [[learnedSearch]], so the
    * DuckDB oracle reproduces assignment and the in-cell pair scan from
    * the same doubles, bit-exactly.
    *
    * Output: (vec_id, cell, is_dup).
    */
  def semDedup(emb: DataFrame, k: Int, threshold: Double,
      exportPath: String = ExportedCentroidsSemDedupPath,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val ix = build(emb, k, idCol, vecCol)
    val cent = centroids(ix).select(col("cell"), col("centroid").as("cv"))
    cent.coalesce(1).write.mode("overwrite")
      .parquet(ModelExport.sigPath(exportPath, emb, idCol))
    val assigned = assignByCosine(emb, cent, idCol, vecCol)
    val a = assigned.select(col("cell"), col("nid").as("aid"), col("v").as("av"))
    val b = assigned.select(col("cell"), col("nid").as("bid"), col("v").as("bv"))
    val dupIds = a.join(b, Seq("cell"))
      .filter(col("bid") < col("aid"))
      .filter(round(CosineSimilarity(spark, col("av"), col("bv")), 6)
        >= threshold)
      .select(col("aid").as("nid")).distinct()
    assigned.select(col("nid"), col("cell"))
      .join(dupIds.withColumn("__dup", lit(true)), Seq("nid"), "left")
      .select(col("nid").as(idCol), col("cell"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  /** Top-k nearest (by cosine) corpus vectors per probe, scanning only the
    * nProbe nearest cells per probe.
    */
  def search(ix: Index, probes: DataFrame, k: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = ix.assigned.sparkSession
    val p = probes.select(col(idCol).as("pid"), widened(vecCol).as("__pv"))
    // rank cells per probe by centroid cosine; keep nProbe cells
    val cellRank = Window.partitionBy(col("pid"))
      .orderBy(col("c_cos").desc, col("cell"))
    val probeCells = p.crossJoin(broadcast(centroids(ix)))
      .withColumn("c_cos",
        CosineSimilarity(spark, col("__pv"), col("centroid")))
      .withColumn("__cr", row_number().over(cellRank))
      .filter(col("__cr") <= nProbe)
      .select(col("pid"), col("__pv"), col("cell"))
    // scan only those cells
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col("nid"))
    probeCells.join(ix.assigned, Seq("cell"))
      .filter(col("nid") =!= col("pid"))
      .withColumn("cos_sim",
        round(CosineSimilarity(spark, col("__pv"), col("v")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("pid"), col("nid"), col("cos_sim"),
        col("__rn").cast("long").as("knn_rank"))
  }
}
