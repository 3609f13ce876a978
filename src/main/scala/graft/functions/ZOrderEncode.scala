package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton / Z-order curve encoding of two non-negative keys: interleaves
  * the low [[ZOrderEncode.Bits]] bits of `left` (even positions) and
  * `right` (odd positions) into one BIGINT, so sorting by the result
  * clusters rows that are close in BOTH dimensions into the same files.
  *
  * This is the multi-dimensional data-layout primitive of large lake
  * tables (public literature: Morton 1966; the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`): a range-partitioned write ordered
  * by z-value gives every file a tight bounding BOX over both key columns,
  * so a two-dimensional predicate prunes files on min/max stats in both
  * dimensions at once — a single-column sort can only ever prune on that
  * one column. ZOrderSpec measures the effect on a real two-column box
  * scan; at 100 TB this is the difference between reading one file stripe
  * and reading the whole table.
  *
  * Semantically identical to the built-in fold
  * `aggregate(sequence(0, 15), 0L, (acc, i) ->
  *   acc | ((x >> i) & 1) << (2*i) | ((y >> i) & 1) << (2*i + 1))`
  * — but compiled to one static-call loop inside whole-stage codegen
  * instead of 16 interpreted lambda frames per row, and replayable in
  * ANSI SQL via the unrolled rendering of [[ZOrderEncode.sql]]. Keys wider
  * than [[ZOrderEncode.Bits]] bits truncate (callers rank/bucket first);
  * negative inputs are a caller error (the sign bit would scatter, not
  * cluster).
  */
case class ZOrderEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(bigint, bigint) got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderEncode.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderEncode.compute($x, $y);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrderEncode {
  /** Bits interleaved per key: 16 each → 32-bit z-values, enough for keys
    * pre-bucketed to 65k ranks per dimension (at 100 TB you rank/bucket
    * the raw key into a bounded grid first anyway — finer grids than the
    * file count stop improving skipping).
    */
  val Bits = 16

  def compute(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < Bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  val FnName = "graft_zorder"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => ZOrderEncode(castLong(exprs.head), castLong(exprs(1)))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)

  private def castLong(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)

  def apply(spark: SparkSession, x: Column, y: Column): Column = {
    register(spark)
    call_function(FnName, x, y)
  }

  /** ANSI-SQL rendering of the same interleave — the 32 shift/mask terms
    * unrolled and OR-chained, bit-identical to [[compute]] (DuckDB `&`,
    * `|`, `<<`, `>>` are BIGINT ops).
    */
  def sql(x: String, y: String): String =
    (0 until Bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
}
