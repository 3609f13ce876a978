package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed, co-located joins: pre-shuffle both sides of a recurring join
  * into the same bucket layout once at write time, so every subsequent
  * join on the bucket key runs shuffle-free (SortMergeJoin over co-located
  * buckets). At 100 TB this converts the dominant repeated shuffle of a
  * star-schema workload into a one-time write cost.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (overwriting any previous
    * definition). Bucket count should match the downstream parallelism
    * target, not the current data size. `sortCols` (default: the bucket
    * column) orders rows WITHIN each bucket file; because each bucket
    * lands as one file, the read side can report that ordering (readers
    * opt in via [[enableSortedBucketScans]]), so an
    * operator requiring (bucketCol, more...) — a sort-merge join, the
    * native as-of join — plans with neither an Exchange NOR a Sort.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a dropped table can leave its warehouse location behind (e.g. after
    // a previous session died); managed-table creation refuses to reuse it
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // pre-shuffle into the bucket layout so each bucket lands as ONE file:
    // without it every input partition writes its own slice of every
    // bucket (numPartitions × numBuckets small files — the lake killer),
    // and multi-file buckets force a per-bucket sort on read
    val sc = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    df.repartition(numBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sc.head, sc.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** READ-side session posture for this layout, applied explicitly by
    * bucketed-table consumers (never as a hidden side effect of a write):
    * Spark stopped reporting bucket sort order by default (SPARK-28632)
    * because multi-file buckets only sort within each file, but
    * [[writeBucketed]] guarantees ONE file per bucket (its pre-write
    * repartition), so opting back in is sound — the conf only takes
    * effect when the scan actually sees single-file buckets (Spark
    * re-checks at scan time), and it is what lets downstream SMJ /
    * as-of plans elide their Sorts as well as their Exchanges. Calling
    * this before EVERY bucketed read (not just after a write) also keeps
    * the zero-sort plan independent of whether this session or an
    * earlier one materialized the table.
    */
  def enableSortedBucketScans(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

  /** Join two tables previously bucketed on the same key with the same
    * bucket count — planner elides both shuffles.
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame = {
    enableSortedBucketScans(spark)
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
  }
}
