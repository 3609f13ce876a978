package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.text.Text

/** Streaming face of the training-data curation pipeline: documents land
  * incrementally (crawl drops, upload batches), and each micro-batch is
  * quality-filtered and exact-deduped against EVERYTHING already ingested
  * — the incremental form of TrainingDataPipeline's first two stages.
  *
  *  - the file source's checkpoint is the ingest log (same role as the
  *    weather pipeline's `_ingest_log`): a file is processed exactly once
  *    across restarts;
  *  - dedup state is the md5 digest set, kept in the state store keyed by
  *    digest — O(distinct docs) state, the streaming twin of
  *    `Dedup.exactDupGroups`' shuffle; a re-crawled duplicate arriving in
  *    ANY later micro-batch (or after a restart) is dropped;
  *  - near-dup clustering and chunking stay batch jobs over the curated
  *    output (they need corpus-wide joins, not per-row state).
  */
object CurationStream {

  /** documents.parquet's shape, declared for the streaming reader (a
    * stream cannot infer schema from data that hasn't arrived yet).
    */
  val DocSchema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** Quality-filter + digest-dedup a document stream. */
  def curatedStream(spark: SparkSession, docsPath: String,
      minTokens: Long = 30, maxAvgTokenLen: Double = 6.0,
      minStopwordRatio: Double = 0.01): DataFrame = {
    val raw = spark.readStream.schema(DocSchema).parquet(docsPath)
    Text.qualityFilter(raw, minTokens, maxAvgTokenLen, minStopwordRatio)
      .withColumn("digest", md5(col("text")))
      .dropDuplicates("digest")
  }

  /** Drive the curated stream into a parquet corpus, exactly-once. */
  def run(spark: SparkSession, docsPath: String, outPath: String,
      checkpointPath: String): StreamingQuery =
    curatedStream(spark, docsPath).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  // -----------------------------------------------------------------
  // streaming NEAR-dup: MinHash-LSH band registry
  // -----------------------------------------------------------------

  /** 64-bit LSH bucket key per (doc, band): xxhash64 over (band index,
    * band signature). One row per doc per band — the join key of the
    * incremental near-dup check.
    */
  def docBandKeys(docs: DataFrame, numPerms: Int = 16,
      rowsPerBand: Int = 4): DataFrame =
    graft.dedup.Dedup
      .bandKeys(graft.dedup.Dedup.minhashSignatures(docs, numPerms), rowsPerBand)
      .select(col("id").as("doc_id"),
        xxhash64(col("band"), col("band_sig")).as("band_key"))

  /** Band keys of every batch committed BEFORE `beforeBatch`. The current
    * batch's own partition is excluded so a retry that already published
    * its registry keys (but died before the checkpoint commit) doesn't
    * collide every document with itself and drop the whole batch.
    */
  private def readRegistry(spark: SparkSession, path: String,
      beforeBatch: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.parquet(path)
        .filter(col("batch") < beforeBatch)
        .select("band_key")
    else spark.range(0).select(col("id").as("band_key"))
  }

  /** One micro-batch of greedy incremental near-dup: a doc is suppressed
    * when any of its LSH bands collides with a previously KEPT doc's band
    * (registry semi-join) or with a lower-id doc of the same batch that
    * survived the registry check. Returns (kept docs, their band keys).
    *
    * The registry — not the state store — carries the cross-batch state:
    * at corpus scale the band-key set is corpus-sized, and a bucketed
    * parquet registry anti-join is a shuffle Spark already knows how to
    * run at 100 TB, where per-key state-store state would pin the whole
    * corpus in the streaming state backend. (Same greedy first-wins
    * policy as the batch `Dedup.exactDupGroups` canonical-min choice.)
    */
  def nearDupBatch(batch: DataFrame, registry: DataFrame,
      numPerms: Int = 16, rowsPerBand: Int = 4): (DataFrame, DataFrame) =
    nearDupFromKeys(batch, docBandKeys(batch, numPerms, rowsPerBand), registry)

  /** [[nearDupBatch]] over precomputed band keys — callers driving multiple
    * actions (the streaming sink) persist `keys` so the MinHash signatures
    * are computed once per batch, not once per downstream join.
    */
  def nearDupFromKeys(batch: DataFrame, keys: DataFrame,
      registry: DataFrame): (DataFrame, DataFrame) = {
    val dupVsRegistry = keys.join(registry, Seq("band_key"), "left_semi")
      .select(col("doc_id")).distinct()
    val survivorKeys = keys.join(registry, Seq("band_key"), "left_anti")
    val dupInBatch = survivorKeys.as("a")
      .join(survivorKeys.as("b"),
        col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id")).distinct()
    val kept = batch.join(dupVsRegistry.union(dupInBatch).distinct(),
      Seq("doc_id"), "left_anti")
    val keptKeys = keys
      .join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("band_key")).distinct()
    (kept, keptKeys)
  }

  /** The full incremental curation stream: quality filter → exact dedup
    * (md5 digest in the state store, cross-restart) → NEAR-dup against
    * everything kept so far (LSH band registry on storage, cross-restart).
    * foreachBatch is the right seam for the near-dup stage: it needs a
    * corpus-wide join (batch semantics), and exactly-once comes from
    * writing each micro-batch into its own `batch=<id>` partition with
    * overwrite — a retried batch rewrites the same partition instead of
    * double-appending, and the registry read excludes the in-flight
    * batch's partition (see [[readRegistry]]).
    */
  def runNearDup(spark: SparkSession, docsPath: String, outPath: String,
      registryPath: String, checkpointPath: String,
      numPerms: Int = 16, rowsPerBand: Int = 4): StreamingQuery =
    curatedStream(spark, docsPath).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the band keys feed three joins plus the registry write — persist
        // so the MinHash signature pass runs once per batch
        val keys = docBandKeys(batch, numPerms, rowsPerBand).persist()
        val (kept, keptKeys) = nearDupFromKeys(batch, keys,
          readRegistry(spark, registryPath, batchId))
        kept.persist()
        try {
          kept.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          keptKeys.write.mode("overwrite")
            .parquet(s"$registryPath/batch=$batchId")
        } finally { kept.unpersist(); keys.unpersist() }
        ()
      }
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
