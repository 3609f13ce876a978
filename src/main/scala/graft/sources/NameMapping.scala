package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Column RENAME over parquet history without rewriting a byte — the
  * Iceberg name-mapping move, and the answer to the boundary q84
  * documents: parquet footers carry only physical names, so `mergeSchema`
  * cannot know that batch 1's `score` IS batch 2's `quality_score`. A
  * name mapping is reader metadata: each batch declares how its physical
  * names map to the current logical schema, the scan applies the mapping
  * at projection time (a footer-level operation — Catalyst pushes the
  * column pruning down to the ORIGINAL physical name), and the batches
  * union by the mapped names.
  *
  * At 100 TB this is the difference between a metadata update and a
  * petabyte rewrite: the mapping lives with the table definition (here:
  * the caller's batch list, in Iceberg: the `schema.name-mapping.default`
  * table property), old files are never touched, and new files simply
  * carry the new physical name with an empty mapping.
  *
  * Reference context: the drifted-lake reality of
  * `/root/reference/dags/openmeteo_etl.py`'s long-lived ingest —
  * column-ADD (q82) and type-WIDEN (q84) are footer-only reads; RENAME
  * completes the schema-evolution triad (q90).
  */
object NameMapping {

  /** One batch directory read under `mapping` (physicalName →
    * logicalName). Fails LOUDLY when a mapping's physical name is absent
    * from the batch (a silent no-op would resurface the stale name and
    * poison the union) or when the logical name already exists (two
    * columns would collide).
    */
  def readParquetMapped(spark: SparkSession, dir: String,
      mapping: Map[String, String]): DataFrame = {
    // renames must be INDEPENDENT (no mapping key appears among its
    // values): a chain like a->b, b->c applied from an unordered Map
    // would succeed or collide depending on hash iteration order —
    // refuse the shape instead of being order-lucky. (Iceberg name
    // mappings are independent by construction: each maps a physical
    // name to the CURRENT logical name, never through intermediates.)
    val chained = mapping.keySet.intersect(mapping.values.toSet)
    require(chained.isEmpty,
      s"NameMapping: mapping is not independent — ${chained.mkString(", ")} " +
        "appear as both physical and logical names; map each physical " +
        "name directly to its current logical name")
    val df = spark.read.parquet(dir)
    mapping.toSeq.sortBy(_._1).foldLeft(df) { case (d, (oldName, newName)) =>
      require(d.columns.contains(oldName),
        s"NameMapping: physical column '$oldName' not present in $dir " +
          s"(have: ${d.columns.mkString(", ")})")
      require(!d.columns.contains(newName),
        s"NameMapping: logical column '$newName' already exists in $dir — " +
          "mapping would collide")
      d.withColumnRenamed(oldName, newName)
    }
  }

  /** Batches unioned by their MAPPED names into one logical table —
    * columns a batch lacks surface as null (the q82 column-ADD rule
    * composes with rename). Each element: (directory, physical→logical
    * mapping, batch tag surfaced as the `batch` column — the lineage
    * every evolution read here carries).
    */
  def readParquetBatches(spark: SparkSession,
      batches: Seq[(String, Map[String, String], Long)]): DataFrame = {
    require(batches.nonEmpty, "NameMapping: need at least one batch")
    import org.apache.spark.sql.functions.lit
    batches.map { case (dir, mapping, tag) =>
      readParquetMapped(spark, dir, mapping).withColumn("batch", lit(tag))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
