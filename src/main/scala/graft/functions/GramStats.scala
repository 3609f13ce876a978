package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass n-gram repetition statistics over a token array:
  * `gram_stats(toks, n)` returns `[n_grams, dup_count, max_count]` where
  * grams are contiguous n-token windows joined by one space (exactly
  * [[graft.text.Text.shingles]] semantics), `dup_count` = n_grams −
  * distinct grams, `max_count` = occurrences of the most frequent gram.
  *
  * Semantically identical to the HOF chain
  * `size(g), size(g) - size(array_distinct(g)),
  *  array_max(transform(array_distinct(g), x -> size(filter(g, y -> y = x))))`
  * — but that chain is O(len²) with five interpreted lambda frames per
  * distinct gram, while this is ONE hash-map pass per row inside
  * whole-stage codegen. The Gopher-rule query (t25) over a corpus is a
  * linear scan either way; this removes the interpreted constant.
  */
case class GramStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName(array<string>, int) got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(toks: Any, n: Any): Any =
    GramStats.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.GramStats.compute($t, $n);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object GramStats {

  def compute(toks: ArrayData, n: Int): ArrayData = {
    require(n >= 1, s"gram order must be >= 1, got $n")
    val len = toks.numElements()
    val nGrams = if (len < n) 0 else len - n + 1
    if (nGrams <= 0)
      return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val words = new Array[String](len)
    var i = 0
    while (i < len) {
      words(i) = toks.getUTF8String(i).toString
      i += 1
    }
    val counts = new java.util.HashMap[String, Long](nGrams * 2)
    var maxC = 0L
    i = 0
    while (i < nGrams) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1L, (a, b) => a + b)
      if (c > maxC) maxC = c
      i += 1
    }
    new GenericArrayData(Array[Any](
      nGrams.toLong, nGrams.toLong - counts.size(), maxC))
  }

  val FnName = "graft_gram_stats"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => GramStats(exprs.head, castInt(exprs(1)))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)

  private def castInt(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, IntegerType)

  def apply(spark: SparkSession, toks: Column, n: Int): Column = {
    register(spark)
    call_function(FnName, toks, org.apache.spark.sql.functions.lit(n))
  }
}
