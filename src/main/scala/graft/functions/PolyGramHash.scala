package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deduped POLYHASH values of every token n-gram, in first-occurrence
  * order — the oracle-replayable sibling of [[ShingleHash64]]:
  * `array_distinct(transform(sequence(1, len-n+1), i ->
  * PolyHash(array_join(slice(toks, i, n), ' '), 31, 2147483647)))` as ONE
  * codegen'd loop. The fold runs over the gram's code points INCLUDING
  * the single-space joins, so the value is exactly the PolyHash of the
  * gram string — the same `(acc*31 + cp) % p` fold DuckDB's oracle SQL
  * replays over `ascii(substr(...))` — but no gram string is ever
  * materialized: the rolling accumulator crosses token boundaries by
  * folding in ' ' directly.
  *
  * Why native: the HOF formulation pays five interpreted frames per gram
  * (sequence, transform, slice, array_join, PolyHash) plus an O(g²)
  * array_distinct; at corpus scale gram hashing IS the screen's cost
  * (d18 measured 3.8 s → 1.5 s at sf0.1 on the swap).
  */
case class PolyGramHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_gram_hash"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName(array<string>, bigint) got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(toks: Any, n: Any): Any =
    PolyGramHash.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Long].toInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n) =>
      s"${ev.value} = graft.functions.PolyGramHash.compute($toks, (int) $n);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object PolyGramHash {
  private val Mult = 31L
  private val Mod = 2147483647L

  /** PolyHash fold of one string into a running accumulator. */
  private def foldStr(acc0: Long, s: UTF8String): Long = {
    val str = s.toString
    var acc = acc0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (n <= 0 || cnt < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + n <= cnt) {
      // array_join(…, ' ') skips null elements AND their separators: a
      // space folds in only between two non-null (possibly empty) tokens
      var acc = 0L
      var emitted = false
      var j = 0
      while (j < n) {
        if (!toks.isNullAt(i + j)) {
          if (emitted) acc = (acc * Mult + ' '.toInt) % Mod
          acc = foldStr(acc, toks.getUTF8String(i + j))
          emitted = true
        }
        j += 1
      }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  val FnName = "graft_poly_gram_hash"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => PolyGramHash(exprs.head, Cast(exprs(1), LongType))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}
