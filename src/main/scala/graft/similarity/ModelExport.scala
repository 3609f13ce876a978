package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-addressed export paths for trained-model state (IVF centroids,
  * PQ codebooks) that a query materializes for its DuckDB oracle.
  *
  * The driver contract makes `oracleSql` a STATIC string, so the oracle
  * cannot be told "this run's path" out of band. Instead the export is
  * keyed by a signature both engines derive independently from the corpus
  * itself — row count + id sum — written as a hive partition directory
  * (`<base>/sig=n500_s124750/...`). The query overwrites only its own sig
  * partition, and the static oracle SQL globs `<base>/sig=*` with
  * hive_partitioning and filters to the signature it computes from ITS
  * `embeddings` table. Verify runs at different SFs (or concurrent runs)
  * land in different partitions and can no longer clobber each other,
  * which removes the round-4 "sf0.01 must run last" ordering trap.
  */
object ModelExport {

  /** Corpus content signature `n<count>_s<sum(id)>` — one O(1) scalar
    * aggregate (never a data collect). Distinct corpora that share both
    * row count and id sum would collide, but the testdata SFs differ in
    * count alone, and a collision only matters if the vectors also differ,
    * which the deterministic generators rule out for identical id sets.
    */
  def corpusSig(emb: DataFrame, idCol: String = "vec_id"): String = {
    val r = emb.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col(idCol)).cast("long").as("s")).head()
    s"n${r.getLong(0)}_s${r.getLong(1)}"
  }

  /** The sig-partition directory under `base` for this corpus — the path
    * a query should actually write (and read back) its exported state to.
    */
  def sigPath(base: String, emb: DataFrame, idCol: String = "vec_id"): String =
    s"$base/sig=${corpusSig(emb, idCol)}"

  /** The DuckDB twin of [[sigPath]]: a `FROM … WHERE` fragment that scans
    * every sig partition under `base` but keeps only the one whose
    * signature matches what the oracle derives from its own `table`.
    * Splice as `SELECT <cols> FROM ${oracleFromWhere(base)}`.
    */
  def oracleFromWhere(base: String, table: String = "embeddings",
      idCol: String = "vec_id"): String =
    s"read_parquet('$base/sig=*/*.parquet', hive_partitioning = true) " +
      s"WHERE sig = (SELECT 'n' || CAST(COUNT(*) AS BIGINT) || '_s' || " +
      s"CAST(SUM($idCol) AS BIGINT) FROM $table)"
}
