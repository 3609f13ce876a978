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

/** The k=3 interleave (round-robin bit placement `i*3 + j`, [[ZOrderEncode]]'s
  * generalization): `OPTIMIZE ZORDER BY (a, b, c)` clusters all three
  * dimensions — bit i of each key lands adjacent, so the sorted-rolled
  * files get a tight bounding box in EVERY dimension.
  */
case class ZOrderEncode3(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_encode3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(bigint, bigint, bigint) got (" +
        children.map(_.dataType.simpleString).mkString(", ") + ")")

  override def nullSafeEval(x: Any, y: Any, z: Any): Any =
    ZOrderEncode.compute3(x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, z) =>
      s"${ev.value} = graft.functions.ZOrderEncode.compute3($x, $y, $z);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** The k=4 interleave (15 bits per key — 60 interleaved bits keep the
  * z-value inside a non-negative BIGINT).
  */
case class ZOrderEncode4(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_encode4"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(bigint x4) got (" +
        children.map(_.dataType.simpleString).mkString(", ") + ")")

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    ZOrderEncode.compute4(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.ZOrderEncode.compute4($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

object ZOrderEncode {
  /** Bits interleaved per key: 16 each → 32-bit z-values, enough for keys
    * pre-bucketed to 65k ranks per dimension (at 100 TB you rank/bucket
    * the raw key into a bounded grid first anyway — finer grids than the
    * file count stop improving skipping).
    */
  val Bits = 16

  /** Bits per key at k dimensions: 16 up to k=3 (48 interleaved bits),
    * 15 at k=4 (60 bits) — the z-value stays a non-negative BIGINT.
    */
  def bitsFor(k: Int): Int = if (k <= 3) Bits else 15

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

  def compute3(x: Long, y: Long, z: Long): Long = {
    var out = 0L
    var i = 0
    while (i < Bits) {
      out |= ((x >> i) & 1L) << (3 * i)
      out |= ((y >> i) & 1L) << (3 * i + 1)
      out |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    out
  }

  def compute4(a: Long, b: Long, c: Long, d: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 15) {
      out |= ((a >> i) & 1L) << (4 * i)
      out |= ((b >> i) & 1L) << (4 * i + 1)
      out |= ((c >> i) & 1L) << (4 * i + 2)
      out |= ((d >> i) & 1L) << (4 * i + 3)
      i += 1
    }
    out
  }

  val FnName = "graft_zorder"

  /** The one builder both registration routes share: 2–4 key columns,
    * round-robin bit interleave (k=2 is bit-identical to the original
    * two-field form — committed plans and oracle SQL are unchanged).
    */
  val builder: Seq[Expression] => Expression = exprs => exprs.size match {
    case 2 => ZOrderEncode(castLong(exprs.head), castLong(exprs(1)))
    case 3 => ZOrderEncode3(castLong(exprs.head), castLong(exprs(1)),
      castLong(exprs(2)))
    case 4 => ZOrderEncode4(castLong(exprs.head), castLong(exprs(1)),
      castLong(exprs(2)), castLong(exprs(3)))
    case n => throw new IllegalArgumentException(
      s"$FnName takes 2 to 4 key columns, got $n — beyond 4 dimensions " +
        "the interleave stops clustering anything (3-4 bits per key per " +
        "byte); pick the query-critical dimensions")
  }

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)

  private def castLong(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)

  def apply(spark: SparkSession, x: Column, y: Column): Column = {
    register(spark)
    call_function(FnName, x, y)
  }

  def apply(spark: SparkSession, cols: Seq[Column]): Column = {
    register(spark)
    call_function(FnName, cols: _*)
  }

  /** ANSI-SQL rendering of the same interleave — the 32 shift/mask terms
    * unrolled and OR-chained, bit-identical to [[compute]] (DuckDB `&`,
    * `|`, `<<`, `>>` are BIGINT ops).
    */
  def sql(x: String, y: String): String = sqlK(Seq(x, y))

  /** k-field ANSI rendering, bit-identical to the compute* twins. */
  def sqlK(cols: Seq[String]): String = {
    val k = cols.size
    val bits = bitsFor(k)
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        s"((($c >> $i) & 1) << ${k * i + j})"
      }
    }.mkString("(", " | ", ")")
  }
}
