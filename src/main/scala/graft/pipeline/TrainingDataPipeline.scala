package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.Text

/** The operators composed as one end-to-end training-data curation job —
  * the flow a user of this engine actually runs over a raw corpus:
  *
  *   1. quality pre-filter (drop junk docs),
  *   2. exact dedup (md5 canonicalization, keep one doc per digest),
  *   3. near-dup clustering (jaccard pairs → connected components → keep
  *      each cluster's canonical doc),
  *   4. chunking into training-window pieces,
  *   5. per-chunk fingerprints + token counts for downstream bookkeeping.
  *
  * Every stage is one of the audited operators (PLANS.md): the pipeline
  * introduces no new shuffle shapes, and intermediate results stay
  * DataFrames end to end — at 100 TB each arrow is the same plan, only
  * wider.
  */
object TrainingDataPipeline {

  final case class Result(
      kept: DataFrame,    // surviving canonical docs
      chunks: DataFrame,  // training-window chunks of the survivors
      stats: DataFrame,   // 1-row funnel accounting
      lineage: DataFrame) // per-doc audit: kept flag + first drop reason

  def run(
      spark: SparkSession,
      docs: DataFrame,
      minTokens: Long = 20,
      maxAvgTokenLen: Double = 12.0,
      minStopwordRatio: Double = 0.0,
      nearDupThreshold: Double = 0.95,
      chunkTokens: Int = 40,
      strideTokens: Int = 20,
      collectStats: Boolean = true): Result = {

    // funnel accounting is optional: with collectStats=false the count
    // jobs (including a second full chunking pass) are skipped and stats
    // carries -1 sentinels — the kept/chunks frames are unaffected
    def tally(df: DataFrame): Long = if (collectStats) df.count() else -1L

    val total = tally(docs)

    // 1. quality pre-filter
    val quality = Text.qualityFilter(docs, minTokens,
      maxAvgTokenLen, minStopwordRatio)
      .localCheckpoint(true)
    val nQuality = tally(quality)

    // 2. exact dedup: keep each digest's canonical (minimum-id) doc
    val exact = Dedup.exactDupGroups(quality)
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"))
    val exactKept = quality.join(exact, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val nExact = tally(exactKept)

    // 3. near-dup clusters: keep each cluster's canonical doc
    val pairs = Dedup.jaccardPairs(exactKept, "source", nearDupThreshold)
    val clusters = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val kept = exactKept
      .join(clusters, exactKept("doc_id") === clusters("node"), "left")
      .filter(col("node").isNull || col("label") === col("doc_id"))
      .drop("node", "label")
      .localCheckpoint(true)
    val nKept = tally(kept)

    // 4-5. chunk survivors and fingerprint each chunk
    val chunks = Text.chunk(kept, chunkTokens, strideTokens)
      .withColumn("chunk_fingerprint",
        graft.functions.PolyHash(spark, col("chunk_text"), 31L, 1000000007L))
    val nChunks = tally(chunks)

    import spark.implicits._
    val stats = Seq((total, nQuality, nExact, nKept, nChunks))
      .toDF("docs_in", "after_quality", "after_exact_dedup",
        "after_neardup", "chunks_out")

    // per-doc lineage: WHY did a document leave the corpus — the audit
    // trail a production curation pipeline ships with every release
    // (debugging "where did my doc go", measuring per-stage cut rates,
    // proving a contaminant was dropped). drop_reason names the FIRST
    // stage that cut the doc; null for survivors. Three keyed left joins
    // against the already-checkpointed stage outputs — lazily planned, so
    // callers that ignore it pay nothing.
    val lineage = docs.select(col("doc_id"))
      .join(quality.select(col("doc_id"), lit(true).as("__q")),
        Seq("doc_id"), "left")
      .join(exactKept.select(col("doc_id"), lit(true).as("__e")),
        Seq("doc_id"), "left")
      .join(kept.select(col("doc_id"), lit(true).as("__k")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("__k").isNotNull.as("kept"),
        when(col("__q").isNull, "quality")
          .when(col("__e").isNull, "exact_dup")
          .when(col("__k").isNull, "near_dup")
          .otherwise(lit(null).cast("string")).as("drop_reason"))

    Result(kept, chunks, stats, lineage)
  }

  /** The per-source dataset report card — the release artifact a corpus
    * pipeline publishes next to the data: for every source, how many
    * documents went in, how many survived, how many each stage cut, and
    * the token mass before/after. All columns are exact BIGINT counts
    * (no rounded ratios), so the card is bit-reproducible anywhere.
    *
    * Scale: one extra hash aggregation keyed on source over the lineage
    * frame [[run]] already plans lazily — the per-source card costs one
    * shuffle of |sources| groups on top of the pipeline itself.
    */
  def reportCard(
      spark: SparkSession,
      docs: DataFrame,
      minTokens: Long = 20,
      maxAvgTokenLen: Double = 12.0,
      minStopwordRatio: Double = 0.0,
      nearDupThreshold: Double = 0.95): DataFrame =
    reportCardFrom(docs, run(spark, docs, minTokens, maxAvgTokenLen,
      minStopwordRatio, nearDupThreshold, collectStats = false).lineage)

  /** [[reportCard]] over an ALREADY-computed lineage frame — the form a
    * release pipeline uses, aggregating the materialized audit table
    * instead of re-running the stages.
    */
  def reportCardFrom(docs: DataFrame, lineage: DataFrame): DataFrame = {
    docs.select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).cast("long").as("__nt"))
      .join(lineage, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        count(when(col("kept"), 1)).cast("long").as("n_kept"),
        count(when(col("drop_reason") === "quality", 1)).cast("long")
          .as("drop_quality"),
        count(when(col("drop_reason") === "exact_dup", 1)).cast("long")
          .as("drop_exact_dup"),
        count(when(col("drop_reason") === "near_dup", 1)).cast("long")
          .as("drop_near_dup"),
        sum(col("__nt")).cast("long").as("total_tokens"),
        coalesce(sum(when(col("kept"), col("__nt"))), lit(0L)).cast("long")
          .as("kept_tokens"))
  }
}
