package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Cardinality of the intersection of two SORTED distinct bigint arrays —
  * `size(array_intersect(a, b))` without the per-row hash-set build: one
  * O(|a|+|b|) merge over primitive longs, no allocation. The near-dup
  * verify step runs this once per candidate pair, so at web-corpus scale
  * it is the inner loop of the whole exact-Jaccard path.
  *
  * Callers OWN the sortedness contract (e.g. [[CharGramHash64]] output or
  * `sort_array` results); unsorted input silently undercounts, so the
  * library never exposes this on raw user arrays.
  */
case class IntersectCardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_card_sorted"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName(array<bigint>, array<bigint>) got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCardSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCardSorted.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object IntersectCardSorted {

  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    cnt
  }

  val FnName = "graft_intersect_card_sorted"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => IntersectCardSorted(exprs.head, exprs(1))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}
