package graft.plans

import org.apache.spark.sql.{GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{broadcast, col, input_file_name, regexp_replace}

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
  *     (data read + recovered __file [+ __pos])  // pruning intact
  *     against the delete rows                    // plain parquet, O(deleted)
  *   on (position: target file == file AND ordinal == pos;
  *       equality: target file == file AND every column null-safe equal))
  * }}}
  *
  * pinned to ONE snapshot for BOTH legs (data files and delete files
  * resolve from the same manifest set — never a racing commit's data
  * against an older delete set). Tables with no live delete rows — the
  * overwhelmingly common case — return untouched after one cached
  * manifest check ([[LakeCatalog.TypedLakeCatalogTable.morContext]]).
  *
  * Two data-leg shapes, per delete FLAVOR ([[TypedLake.isPosDelete]]):
  *
  *  - EQUALITY-only delete sets keep the DSv2 relation itself as the
  *    data leg (pinned to the snapshot, same output attribute ids —
  *    parents resolve unchanged, reported statistics intact);
  *  - any POSITION delete forces the v1 parquet file source, because
  *    the subtraction needs each row's `_metadata.row_index` and DSv2
  *    `FileTable` exposes no metadata columns. The v1 leg keeps
  *    filter/column pushdown and `k=v` partition recovery; the rewrite
  *    re-aliases its output to the ORIGINAL relation's attribute ids,
  *    and the resulting Project is tagged with the table
  *    ([[MorScanResolution.MorTable]]) so
  *    [[LakeDmlSql.resolveTarget]] still recognizes the lake table
  *    under a DML statement.
  *
  * Write plans are unaffected by construction: a V2 write command holds
  * its target table out-of-children, and the DML commands resolve their
  * target through [[LakeDmlSql.resolveTarget]], which recognizes the
  * mor-resolved pin (either shape).
  */
object MorScanResolution extends Rule[LogicalPlan] {
  private[graft] val Applied = TreeNodeTag[Boolean]("graft.mor.applied")

  /** Set on the outer Project of a POSITION-delete rewrite: the lake
    * table the rewritten read came from (the v1 leg has no
    * DataSourceV2Relation for [[LakeDmlSql.resolveTarget]] to find).
    */
  private[graft] val MorTable =
    TreeNodeTag[LakeCatalog.TypedLakeCatalogTable]("graft.mor.table")

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
            val files = WeatherLakeV2Sink.filesAsOf(tbl.path, snap)
            val session = spark
            import session.implicits._
            val keyed = files.map(f =>
              (WeatherLakeV2Sink.manifestJoinKey(f), f))
              .toDF("__path", "__file")
            if (deleteFiles.exists(TypedLake.isPosDelete)) {
              // POSITION flavor present: v1 data leg with row ordinals
              if (files.isEmpty) r // deletes dangle; nothing to subtract
              else {
                val base = spark.read.option("basePath", tbl.path)
                  .schema(schema).parquet(files: _*)
                val framed = base.select(
                    col("_metadata.row_index").as("__pos") +:
                    regexp_replace(input_file_name(),
                      WeatherLakeV2Sink.SchemeAuthorityPattern, "")
                      .as("__path") +:
                    schema.fieldNames.toSeq.map(col): _*)
                  .join(broadcast(keyed), Seq("__path"))
                  .drop("__path")
                val resolved = TypedLake.applyMorDeletes(spark, schema,
                    framed, deleteFiles)
                  .select(schema.fieldNames.toSeq.map(col): _*)
                val child = resolved.queryExecution.analyzed
                // re-alias to the ORIGINAL relation's attribute ids so
                // parent operators resolve unchanged
                val proj = Project(r.output.zip(child.output).map {
                  case (o, n) => Alias(n, o.name)(exprId = o.exprId)
                }, child)
                proj.setTagValue(MorTable, tbl)
                proj
              }
            } else {
              // EQUALITY-only: pin data to the SAME snapshot the delete
              // files came from, keep the DSv2 relation as the data leg
              val pinnedTbl = new LakeCatalog.TypedLakeCatalogTable(
                tbl.name(), tbl.path, schema, tbl.partCols,
                tbl.properties(), pinned = Some(snap), morResolved = true)
              val newRel = r.copy(table = pinnedTbl)
              newRel.setTagValue(Applied, true)
              // recover each row's manifest entry path (framedTyped's
              // move: input_file_name is the URL-encoded raw URI, the
              // broadcast key map takes it back to the manifest's own
              // path form)
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
