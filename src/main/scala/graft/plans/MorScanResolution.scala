package graft.plans

import org.apache.spark.sql.{GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{broadcast, input_file_name, regexp_replace}

import graft.sources.{LakeCatalog, TypedLake, WeatherLakeV2Sink}

/** READ resolution for the catalog SQL face, covering the two table
  * states a plain DSv2 Parquet scan cannot answer by itself:
  *
  *  1. **Merge-on-read**: a typed lake table with live delete files
  *     ([[WeatherLakeV2Sink.MorDeletePrefix]]) must never answer a
  *     `SELECT` with deleted rows — the subtraction happens one level
  *     up, as a LOGICAL rewrite during analysis (the Spark-first move:
  *     declare the anti-join, let Catalyst/AQE pick the physical form —
  *     a small delete set broadcasts, a huge one shuffles).
  *  2. **Renamed columns** ([[TypedLake.HistoricalNamesKey]] column
  *     metadata): files written before a `RENAME COLUMN` keep the old
  *     physical name, and a name-forced scan would null-fill the new
  *     one — the rewrite reads through [[TypedLake]]'s widened
  *     scan-schema + coalesce mapping instead.
  *
  * Rewritten shape (attribute ids preserved, so parents resolve
  * unchanged):
  *
  * {{{
  * Project(relation.output aliases,
  *   [LeftAnti join of]                         // only with live deletes
  *     (data read + recovered __file [+ __pos])  // pruning intact
  *     against the delete rows                   // plain parquet, O(deleted)
  *   on (position: target file == file AND ordinal == pos;
  *       equality: target file == file AND every column null-safe equal))
  * }}}
  *
  * pinned to ONE snapshot for BOTH legs (data files and delete files
  * resolve from the same manifest set — never a racing commit's data
  * against an older delete set). Tables with neither state — the
  * overwhelmingly common case — return untouched after one cached
  * manifest check ([[LakeCatalog.TypedLakeCatalogTable.morContext]])
  * and one metadata lookup.
  *
  * Data-leg shapes:
  *
  *  - EQUALITY-only delete sets on UNRENAMED tables keep the DSv2
  *    relation itself as the data leg (pinned to the snapshot, same
  *    output attribute ids, reported statistics intact);
  *  - any POSITION delete — the subtraction needs each row's
  *    `_metadata.row_index`, which DSv2 `FileTable` does not expose —
  *    or any name mapping forces the v1 parquet file source
  *    ([[TypedLake.framedTyped]] / [[TypedLake.readTyped]], both
  *    mapping-aware). The v1 leg keeps filter/column pushdown and `k=v`
  *    partition recovery; the outer Project is tagged with the table
  *    ([[MorScanResolution.MorTable]]) so [[LakeDmlSql.resolveTarget]]
  *    still recognizes the lake table under a DML statement.
  *
  * Write plans are unaffected by construction: a V2 write command holds
  * its target table out-of-children, and the DML commands resolve their
  * target through [[LakeDmlSql.resolveTarget]], which recognizes the
  * rewritten pin (either shape).
  */
object MorScanResolution extends Rule[LogicalPlan] {
  private[graft] val Applied = TreeNodeTag[Boolean]("graft.mor.applied")

  /** Set on the outer Project of a v1-leg rewrite: the lake table the
    * rewritten read came from (that plan has no DataSourceV2Relation
    * for [[LakeDmlSql.resolveTarget]] to find).
    */
  private[graft] val MorTable =
    TreeNodeTag[LakeCatalog.TypedLakeCatalogTable]("graft.mor.table")

  /** Re-alias `child` to the exprIds of the relation it replaces. */
  private def aliasedTo(r: DataSourceV2Relation,
      child: LogicalPlan): Project =
    Project(r.output.zip(child.output).map {
      case (o, n) => Alias(n, o.name)(exprId = o.exprId)
    }, child)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[LakeCatalog.TypedLakeCatalogTable] &&
            r.getTagValue(Applied).isEmpty =>
        val tbl = r.table.asInstanceOf[LakeCatalog.TypedLakeCatalogTable]
        val spark = SparkSession.active
        val schema = tbl.tableSchema
        val mapped = TypedLake.historicalNames(schema).nonEmpty
        tbl.morContext match {
          case None if !mapped => r
          case None =>
            // RENAME-only: read through the widened/coalesced v1 path,
            // pinned to the same file set the relation would have read
            val files = tbl.pinned
              .map(WeatherLakeV2Sink.filesAsOf(tbl.path, _))
              .getOrElse(WeatherLakeV2Sink.committedFiles(tbl.path))
            if (files.isEmpty) r // empty scan: nothing to misread
            else {
              val resolved = TypedLake.readTyped(spark, tbl.path, schema,
                files)
              val proj = aliasedTo(r, resolved.queryExecution.analyzed)
              proj.setTagValue(MorTable, tbl)
              proj
            }
          case Some((snap, deleteFiles)) =>
            val files = WeatherLakeV2Sink.filesAsOf(tbl.path, snap)
            if (mapped || deleteFiles.exists(TypedLake.isPosDelete)) {
              // v1 data leg: row ordinals and/or name mapping
              if (files.isEmpty) r // deletes dangle; nothing to subtract
              else {
                val framed = TypedLake.framedTyped(spark, tbl.path, schema,
                  files,
                  withPos = deleteFiles.exists(TypedLake.isPosDelete))
                val resolved = TypedLake.applyMorDeletes(spark, schema,
                    framed, deleteFiles)
                  .select(schema.fieldNames.toSeq
                    .map(org.apache.spark.sql.functions.col): _*)
                val proj = aliasedTo(r, resolved.queryExecution.analyzed)
                proj.setTagValue(MorTable, tbl)
                proj
              }
            } else {
              // EQUALITY-only, unrenamed: pin data to the SAME snapshot
              // the delete files came from, keep the DSv2 relation as
              // the data leg
              val pinnedTbl = new LakeCatalog.TypedLakeCatalogTable(
                tbl.name(), tbl.path, schema, tbl.partCols,
                tbl.properties(), pinned = Some(snap), morResolved = true)
              val newRel = r.copy(table = pinnedTbl)
              newRel.setTagValue(Applied, true)
              // recover each row's manifest entry path (framedTyped's
              // move: input_file_name is the URL-encoded raw URI, the
              // broadcast key map takes it back to the manifest's own
              // path form)
              val session = spark
              import session.implicits._
              val keyed = files.map(f =>
                (WeatherLakeV2Sink.manifestJoinKey(f), f))
                .toDF("__path", "__file")
              val base = GraftPlanBridge.ofRows(spark, newRel)
              val framed = base
                .withColumn("__path", regexp_replace(input_file_name(),
                  WeatherLakeV2Sink.SchemeAuthorityPattern, ""))
                .join(broadcast(keyed), Seq("__path"))
                .drop("__path")
              val resolved = TypedLake.applyMorDeletes(spark, schema,
                framed, deleteFiles)
              // same output attribute ids as the original relation
              Project(newRel.output, resolved.queryExecution.analyzed)
            }
        }
    }
}
