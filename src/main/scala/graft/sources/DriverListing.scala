package graft.sources

import org.apache.spark.sql.SparkSession

/** Build a relation over EXPLICIT manifest-enumerated files without paying
  * a distributed listing job.
  *
  * Above `spark.sql.sources.parallelPartitionDiscovery.threshold` (default
  * 32 paths) Spark's `InMemoryFileIndex` launches a cluster job just to
  * re-stat paths — the right call for discovering unknown directory trees
  * on a rate-limited object store, pure overhead when the caller already
  * holds the exact leaf-file list from a manifest: event-log profiling at
  * sf0.1 measured 0.1-1.5 s per lake-DML query pass in 240-460-task
  * near-empty "Listing leaf files" jobs. Driver-side listing performs the
  * same O(files) `getFileStatus` calls without the job round trip. This
  * stays the right trade at 100 TB: a row-level op's read set is bounded
  * by its partition read domain (touched files, not the table), and the
  * table-scan posture (the DSv2 catalog scan) plans from the manifest and
  * never builds an InMemoryFileIndex at all.
  *
  * Scoped: the conf is bumped only while the relation resolves (listing
  * happens eagerly inside `spark.read.…(paths)`) and restored after, so
  * genuine directory discovery elsewhere keeps the distributed path.
  */
object DriverListing {
  private val Key = "spark.sql.sources.parallelPartitionDiscovery.threshold"

  def apply[T](spark: SparkSession)(body: => T): T = {
    val old = spark.conf.getOption(Key)
    spark.conf.set(Key, Int.MaxValue)
    try body
    finally old match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }
}
