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
}
