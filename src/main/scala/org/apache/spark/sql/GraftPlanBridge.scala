package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `sql`-package-private doorway a library-defined logical operator
  * needs: turning a hand-built [[LogicalPlan]] back into a [[DataFrame]].
  * `classic.Dataset.ofRows` is `private[sql]`, so this object lives in the
  * `org.apache.spark.sql` package — the standard extension-library trick
  * (public knowledge; the whole `SparkSessionExtensions` ecosystem pairs
  * custom plans with exactly this bridge). Nothing else private is touched.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column ⇄ catalyst Expression, the Spark-4 bridge (`ExpressionUtils`
    * is `private[sql]` since the Column/ColumnNode split): what lets a
    * parser-level DML rewrite bind statement expressions onto a
    * DataFrame's columns.
    */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Test-only peek: the strategies a [[SparkSessionExtensions]] instance
    * would inject (`buildPlannerStrategies` is `private[sql]`).
    */
  def plannerStrategies(ext: SparkSessionExtensions, spark: SparkSession)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  /** Test-only peek at the injected optimizer rules, same reason. */
  def optimizerRules(ext: SparkSessionExtensions, spark: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
