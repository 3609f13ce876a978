package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{LakeCatalog, TypedLake, WeatherLakeV2Sink}

/** READ resolution for the catalog SQL face, covering the two table
  * states a plain DSv2 Parquet scan cannot answer by itself:
  *
  *  1. **Merge-on-read**: a typed lake table with live delete files
  *     ([[WeatherLakeV2Sink.MorDeletePrefix]]) must never answer a
  *     `SELECT` with deleted rows — the subtraction happens one level
  *     up, as a LOGICAL rewrite during analysis (the Spark-first move:
  *     declare the plan, let Catalyst/AQE pick the physical join — a
  *     small delete set broadcasts, a huge one shuffles).
  *  2. **Renamed columns** ([[TypedLake.HistoricalNamesKey]] column
  *     metadata): files written before a `RENAME COLUMN` keep the old
  *     physical name, and a name-forced scan would null-fill the new
  *     one — the rewrite reads through [[TypedLake]]'s widened
  *     scan-schema + coalesce mapping instead.
  *
  * The mor rewrite is a SPLIT SCAN ([[TypedLake.readResolvedSplit]]):
  * data files outside every live delete file's target range read PLAIN
  * (no per-row ordinal, no file-key broadcast map, no anti-join probe),
  * unioned with the resolved read of the targeted sliver —
  *
  * {{{
  * Project(relation.output aliases,
  *   Union(
  *     plain read of CLEAN files,                 // pruning intact
  *     LeftAnti join of
  *       (targeted read + __file [+ __pos])
  *       against the delete rows                  // O(deleted)
  *     on (position: target file == file AND ordinal == pos;
  *         equality: target file == file AND all columns null-safe =)))
  * }}}
  *
  * pinned to ONE snapshot for BOTH legs (data files and delete files
  * resolve from the same manifest set — never a racing commit's data
  * against an older delete set). At CDC rates deletes touch a small
  * fraction of a 100 TB table's files, so the subtraction machinery
  * costs O(targeted files), not O(table). Tables with neither state —
  * the overwhelmingly common case — return untouched after one cached
  * manifest check ([[LakeCatalog.TypedLakeCatalogTable.morContext]])
  * and one metadata lookup.
  *
  * The data legs are the v1 parquet file source (DSv2 `FileTable`
  * exposes no `_metadata.row_index` for position deletes, and the
  * name mapping needs the widened-schema read) — filter/column
  * pushdown and `k=v` partition recovery intact. The outer Project is
  * re-aliased to the ORIGINAL relation's attribute ids (parents
  * resolve unchanged) and tagged with the table
  * ([[MorScanResolution.MorTable]]) so [[LakeDmlSql.resolveTarget]]
  * still recognizes the lake table under a DML statement.
  *
  * Write plans are unaffected by construction: a V2 write command holds
  * its target table out-of-children, and the DML commands resolve their
  * target through [[LakeDmlSql.resolveTarget]].
  */
object MorScanResolution extends Rule[LogicalPlan] {
  private[graft] val Applied = TreeNodeTag[Boolean]("graft.mor.applied")

  /** Set on the outer Project of a rewrite: the lake table the
    * rewritten read came from (the v1 legs have no DataSourceV2Relation
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
        // a branch read's extra files — WAP conf staging OR a pinned
        // `VERSION AS OF '<branch>'` read (pinnedExtra) — ride every
        // v1-rewrite leg too: the rewrite resolves explicit file lists,
        // so dropping them here would silently hide staged rows from a
        // renamed or equality-debt table's branch view
        def staged: Seq[String] = tbl.pinnedExtra ++
          tbl.wapReadBranch.toSeq
            .flatMap(WeatherLakeV2Sink.branchFiles(tbl.path, _))
        tbl.morContext match {
          case None if !mapped => r
          case None =>
            // RENAME-only: read through the widened/coalesced v1 path,
            // pinned to the same file set the relation would have read
            val files = tbl.pinned
              .map(WeatherLakeV2Sink.filesAsOf(tbl.path, _))
              .orElse(tbl.wapReadBranch.map(b =>
                WeatherLakeV2Sink.filesAsOf(tbl.path,
                  WeatherLakeV2Sink.readBranchBase(tbl.path, b))))
              .getOrElse(WeatherLakeV2Sink.committedFiles(tbl.path)) ++
              staged
            if (files.isEmpty) r // empty scan: nothing to misread
            else {
              val resolved = TypedLake.readTyped(spark, tbl.path, schema,
                files)
              val proj = aliasedTo(r, resolved.queryExecution.analyzed)
              proj.setTagValue(MorTable, tbl)
              proj
            }
          // POSITION-ONLY debt under the inline bound subtracts INSIDE
          // the DSv2 scan (per-file ordinal skip sets in the partition
          // readers) — the relation stays, so SupportsReportStatistics
          // (auto-broadcast), KeyGroupedPartitioning (zero-exchange
          // SPJ) and manifest-stats pruning all survive live deletes
          case Some(_) if tbl.morInline => r
          case Some((snap, deleteLines)) =>
            // snap is already the branch BASE on a WAP-staged read
            // (morContext pins it); staged appends carry no deletes, so
            // they join the split-scan's clean leg
            val files = WeatherLakeV2Sink.filesAsOf(tbl.path, snap) ++
              staged
            if (files.isEmpty) r // deletes dangle; nothing to subtract
            else {
              val resolved = TypedLake.readResolvedSplit(spark, tbl.path,
                schema, files, deleteLines)
              val proj = aliasedTo(r, resolved.queryExecution.analyzed)
              proj.setTagValue(MorTable, tbl)
              proj
            }
        }
    }
}
