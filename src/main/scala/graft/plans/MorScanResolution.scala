package graft.plans

import org.apache.spark.sql.{GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{broadcast, input_file_name, regexp_replace}

import graft.sources.{LakeCatalog, TypedLake, WeatherLakeV2Sink}

/** MERGE-ON-READ resolution for the catalog SQL face: a typed lake table
  * with live delete files ([[WeatherLakeV2Sink.MorDeletePrefix]]) must
  * never answer a `SELECT` with deleted rows, but a DSv2 `Scan` cannot
  * express the subtracting anti-join — so the subtraction happens one
  * level up, as a LOGICAL rewrite during analysis (the Spark-first move:
  * declare the plan, let Catalyst/AQE pick the physical join — a small
  * delete set broadcasts, a huge one shuffles).
  *
  * For every [[LakeCatalog.TypedLakeCatalogTable]] relation whose
  * snapshot carries live delete rows, the relation is replaced by
  *
  * {{{
  * Project(relation.output,
  *   LeftAnti join of
  *     (relation + recovered __file column)   // vectorized scan, pruning intact
  *     against the delete rows                 // plain parquet read, O(deleted)
  *   on (target file == file  AND  every column null-safe equal))
  * }}}
  *
  * pinned to ONE snapshot for BOTH legs (data files and delete files
  * resolve from the same manifest set — never a racing commit's data
  * against an older delete set). The rewritten relation keeps its output
  * attribute ids, so parent operators resolve unchanged; the inner
  * relation is tagged so the analyzer's fixpoint never re-rewrites it.
  * Tables with no live delete rows — the overwhelmingly common case —
  * return untouched after one cached manifest check
  * ([[LakeCatalog.TypedLakeCatalogTable.morContext]]).
  *
  * Write plans are unaffected by construction: a V2 write command holds
  * its target table out-of-children, and the DML commands resolve their
  * target through [[LakeDmlSql.resolveTarget]], which recognizes the
  * mor-resolved pin.
  */
object MorScanResolution extends Rule[LogicalPlan] {
  private[graft] val Applied = TreeNodeTag[Boolean]("graft.mor.applied")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[LakeCatalog.TypedLakeCatalogTable] &&
            r.getTagValue(Applied).isEmpty =>
        val tbl = r.table.asInstanceOf[LakeCatalog.TypedLakeCatalogTable]
        tbl.morContext match {
          case None => r
          case Some((snap, deleteFiles)) =>
            val spark = SparkSession.active
            val schema = tbl.tableSchema
            // pin data to the SAME snapshot the delete files came from
            val pinnedTbl = new LakeCatalog.TypedLakeCatalogTable(
              tbl.name(), tbl.path, schema, tbl.partCols, tbl.properties(),
              pinned = Some(snap), morResolved = true)
            val newRel = r.copy(table = pinnedTbl)
            newRel.setTagValue(Applied, true)
            // recover each row's manifest entry path (framedTyped's move:
            // input_file_name is the URL-encoded raw URI, the broadcast
            // key map takes it back to the manifest's own path form)
            val files = WeatherLakeV2Sink.filesAsOf(tbl.path, snap)
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
            val resolved = TypedLake.applyMorDeletes(spark, schema, framed,
              deleteFiles)
            // same output attribute ids as the original relation
            Project(newRel.output, resolved.queryExecution.analyzed)
        }
    }
}
