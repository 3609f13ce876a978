package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, L2SqDistance}

/** Product quantization (PQ) for embedding compression + approximate
  * search (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public literature; the FAISS `PQ` index family):
  *
  *  1. split each D-dim vector into M contiguous subvectors of D/M dims;
  *  2. train an independent k-means codebook (K centroids) per subspace;
  *  3. encode every vector as M small codes (argmin-L2 centroid per
  *     subspace) — D doubles compress to M bytes;
  *  4. ADC search: for a probe, precompute the M×K table of squared
  *     distances from its subvectors to every centroid, then score any
  *     corpus vector as the SUM of M table lookups — no decompression.
  *
  * Scale shape: codebooks are O(M·K·D/M) and broadcast; encode is one
  * linear scan; the ADC score join is keyed on (subspace, code) — per
  * probe it touches corpus·M lookup rows, the standard PQ brute-force
  * scan (compose with IVF cells to cut it further, as FAISS IVFADC does).
  *
  * Determinism/oracle recipe (same as [[IvfIndex.learnedSearch]]): the
  * trained codebooks are EXPORTED to parquet inside the query, and all
  * distances are rounded at 1e-6 then held as scaled BIGINTs, so
  * encoding, the ADC sums (exact integer addition — no float-order
  * sensitivity), and the final ranking reproduce hash-exactly in any
  * engine reading the same exported doubles.
  */
object PqIndex {

  /** BASE directory where s09 materializes its trained codebooks for the
    * DuckDB oracle (one row per (m, code): the subspace centroid).
    * [[searchAdc]] writes under `<base>/sig=<corpus signature>`
    * ([[ModelExport.sigPath]]) so runs at different SFs keep their own
    * exported doubles; the static oracle SQL picks the matching partition
    * via [[ModelExport.oracleFromWhere]].
    */
  val ExportedCodebooksPath = "/tmp/graft_pq_codebooks"

  /** s10's own codebook export base — [[ivfAdcSearch]] trains the same
    * shape of codebooks as [[searchAdc]] but a shared base would let the
    * two queries clobber each other's doubles between run and compare.
    */
  val ExportedIvfAdcCodebooksPath = "/tmp/graft_pq_codebooks_s10"

  private def widened(vecCol: String): Column =
    transform(col(vecCol), x => x.cast("double"))

  /** Trained-codebook cache, keyed by (session, corpus signature, m, k,
    * vecCol), default maxIter only. s09 and s10 train IDENTICAL codebooks over the
    * same corpus — a production index trains once and every consumer
    * (brute-force ADC scan, IVFADC composition) reads the same model;
    * re-fitting M k-means models per consumer is pure duplicated work
    * (~2 s per consumer at sf0.1). The cached frame is a LocalRelation of
    * the trained centers, so reuse is plan-level and side-effect-free;
    * each consumer still writes its OWN export partition (the oracle
    * contract is per-query). Keyed by session identity so fresh test
    * sessions never see another session's model.
    */
  private val trainedCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def trainCodebooksCached(emb: DataFrame, m: Int, k: Int,
      vecCol: String, corpusSig: String): DataFrame =
    trainedCache.getOrElseUpdate(
      s"${System.identityHashCode(emb.sparkSession)}#$corpusSig#$m#$k#$vecCol",
      trainCodebooks(emb, m, k, vecCol))

  /** Train one k-means codebook per subspace; returns the codebook frame
    * (m, code, cv: array<double>) — O(M·K·D/M) rows, always broadcast.
    * Lloyd quality only affects compression error, never correctness:
    * whatever centroids come out are exported and define the index.
    */
  def trainCodebooks(emb: DataFrame, m: Int, k: Int,
      vecCol: String = "embedding", maxIter: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(widened(vecCol).as("v"))
    val dim = v.head().getSeq[Double](0).length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val sub = dim / m
    // The M subspace fits run SEQUENTIALLY. They were submitted as
    // concurrent driver-thread Futures for a round ("wall-clock of one
    // fit, not M") until concurrent fits over the same parent frame were
    // caught producing centroids containing values spliced from two
    // DIFFERENT input rows (a (1.03, 2.0) center over data whose second
    // dim is only ever 1 or 9 — impossible without cross-row bleed
    // between the racing fit jobs). M is small (≤8) and each fit is
    // seconds; determinism of the exported codebooks is what the oracle
    // contract rests on, so the concurrency is not worth the race.
    val books = (0 until m).flatMap { mi =>
      val subVecs = v.select(
        array_to_vector(slice(col("v"), mi * sub + 1, sub)).as("fv"))
      val model = new KMeans().setK(k).setSeed(42L + mi).setMaxIter(maxIter)
        .setFeaturesCol("fv").setPredictionCol("code")
        .fit(subVecs)
      model.clusterCenters.zipWithIndex.map { case (c, code) =>
        (mi, code, c.toArray)
      }.toSeq
    }
    books.toDF("m", "code", "cv")
  }

  /** Per-row subvectors: (id, m, sv) — one row per subspace. */
  private def subvectors(emb: DataFrame, m: Int, idCol: String,
      vecCol: String, idAlias: String): DataFrame = {
    val dim = size(col("__v"))
    val sub = (dim / m).cast("int")
    emb.select(col(idCol).as(idAlias), widened(vecCol).as("__v"))
      .select(col(idAlias), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          mi => slice(col("__v"), mi * sub + 1, sub))))
      .withColumnRenamed("pos", "m")
      .withColumnRenamed("col", "sv")
  }

  /** Squared L2 scaled to an exact integer: round(d² · 1e6) as BIGINT.
    * Integer distances make every downstream sum order-independent and
    * every argmin/ranking tie-break engine-agnostic.
    */
  private def dist6(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column): Column =
    round(L2SqDistance(spark, a, b) * 1e6, 0).cast("long")

  /** Encode the corpus against a codebook frame: (id, m, code) — the
    * argmin-L2 centroid per subspace, ties to the lowest code. Kept in
    * exploded form because ADC joins on (m, code) directly.
    */
  def encode(emb: DataFrame, codebooks: DataFrame, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val subs = subvectors(emb, m, idCol, vecCol, "nid")
    subs.join(broadcast(codebooks), Seq("m"))
      .groupBy(col("nid"), col("m"))
      .agg(min(struct(
        dist6(spark, col("sv"), col("cv")).as("d6"),
        col("code"))).getField("code").as("code"))
  }

  /** End-to-end PQ search: train codebooks, EXPORT them, encode the
    * corpus, ADC-score every (probe, corpus) pair via the (m, code) join,
    * return the top-k per probe by scaled integer distance (ascending,
    * ties to the lowest neighbor id). Probes score against codes only —
    * corpus vectors are never decompressed.
    */
  def searchAdc(emb: DataFrame, m: Int, k: Int, isProbe: Column, topK: Int,
      exportPath: String = ExportedCodebooksPath,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val path = ModelExport.sigPath(exportPath, emb, idCol)
    val codebooks = trainCodebooksCached(emb, m, k, vecCol,
      path.substring(path.lastIndexOf("sig=")))
    codebooks.coalesce(1).write.mode("overwrite").parquet(path)
    val cb = spark.read.parquet(path)
    val codes = encode(emb, cb, m, idCol, vecCol)
    // per-probe lookup table: distance from each probe subvector to every
    // centroid of its subspace — M·K rows per probe, broadcastable
    val lut = subvectors(emb.filter(isProbe), m, idCol, vecCol, "pid")
      .join(broadcast(cb), Seq("m"))
      .select(col("pid"), col("m"), col("code"),
        dist6(spark, col("sv"), col("cv")).as("pd6"))
    val byProbe = Window.partitionBy(col("pid"))
      .orderBy(col("adc_dist6").asc, col("nid").asc)
    codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("nid") =!= col("pid"))
      .groupBy(col("pid"), col("nid"))
      .agg(sum(col("pd6")).as("adc_dist6"))
      .withColumn("pq_rank", row_number().over(byProbe).cast("long"))
      .filter(col("pq_rank") <= topK)
      .select(col("pid"), col("nid"), col("adc_dist6"), col("pq_rank"))
  }

  /** IVFADC (Jégou et al. 2011 §IV — the FAISS IVFPQ composition): coarse
    * IVF cells prune the candidate set BEFORE any ADC scoring. Every
    * corpus vector is assigned to its argmax-cosine coarse cell (the
    * [[IvfIndex.seededCentroids]] quantizer — reproducible from the table
    * alone), each probe ranks cells by centroid cosine and keeps `nProbe`;
    * only the codes of those cells' vectors join the ADC lookup table.
    * Per-probe cost drops from O(corpus·M) lookups ([[searchAdc]]'s PQ
    * brute-force scan) to O(nProbe·corpus/nCells·M) — the pruning step
    * that makes PQ pay at 100 TB. Codebooks are trained over the raw
    * vectors and EXPORTED (the [[searchAdc]] recipe), so the composed
    * index — coarse pruning AND compressed scoring — hash-matches an
    * oracle reading the same exported doubles. (Classic IVFADC encodes
    * residuals v − centroid; raw-vector encoding keeps the codebooks
    * cell-independent, which is what lets one broadcast LUT serve every
    * probed cell — the accuracy gap is a documented trade, not a bug.)
    */
  def ivfAdcSearch(emb: DataFrame, nCells: Int, nProbe: Int, m: Int, k: Int,
      isProbe: Column, topK: Int,
      exportPath: String = ExportedIvfAdcCodebooksPath,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, s"nProbe=$nProbe out of [1,$nCells]")
    val spark = emb.sparkSession
    // coarse quantizer: seeded centroids, rounded-cosine assignment
    val cent = IvfIndex.seededCentroids(emb, nCells, idCol, vecCol)
    val assigned = IvfIndex.assignByCosine(emb, cent, idCol, vecCol)
      .select(col("nid"), col("cell"))
    val probes = emb.filter(isProbe)
      .select(col(idCol).as("pid"), widened(vecCol).as("__pv"))
    val wc = Window.partitionBy(col("pid"))
      .orderBy(col("c_cos").desc, col("cell").asc)
    val probeCells = probes.crossJoin(broadcast(cent))
      .withColumn("c_cos", round(CosineSimilarity(spark, col("__pv"), col("cv")), 6))
      .withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= nProbe)
      .select(col("pid"), col("cell"))
    // PQ codebooks: train (shared with searchAdc's cache — identical
    // model), export under s10's own base, encode (searchAdc's recipe)
    val path = ModelExport.sigPath(exportPath, emb, idCol)
    val codebooks = trainCodebooksCached(emb, m, k, vecCol,
      path.substring(path.lastIndexOf("sig=")))
    codebooks.coalesce(1).write.mode("overwrite").parquet(path)
    val cb = spark.read.parquet(path)
    val codes = encode(emb, cb, m, idCol, vecCol)
    // candidates pruned by cell BEFORE touching any code: |cand|·M lookup
    // rows instead of |corpus|·M
    val cand = probeCells.join(assigned, Seq("cell"))
      .filter(col("nid") =!= col("pid"))
      .select(col("pid"), col("nid"))
    val lut = subvectors(emb.filter(isProbe), m, idCol, vecCol, "pid")
      .join(broadcast(cb), Seq("m"))
      .select(col("pid"), col("m"), col("code"),
        dist6(spark, col("sv"), col("cv")).as("pd6"))
    val byProbe = Window.partitionBy(col("pid"))
      .orderBy(col("adc_dist6").asc, col("nid").asc)
    cand.join(codes, Seq("nid"))
      .join(broadcast(lut), Seq("pid", "m", "code"))
      .groupBy(col("pid"), col("nid"))
      .agg(sum(col("pd6")).as("adc_dist6"))
      .withColumn("ivfadc_rank", row_number().over(byProbe).cast("long"))
      .filter(col("ivfadc_rank") <= topK)
      .select(col("pid"), col("nid"), col("adc_dist6"), col("ivfadc_rank"))
  }
}
