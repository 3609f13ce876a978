package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deduped 64-bit hashes of every token n-gram, in first-occurrence
  * order — `array_distinct(transform(sequence(1, len-n+1), i ->
  * xxhash64(concat_ws(' ', slice(toks, i, n)))))` as ONE codegen'd loop.
  * Hash = the builtin xxhash64 (seed 42) over the exact gram string bytes
  * (`concat_ws` null-skipping included), so swapping the HOF chain for
  * this expression changes no values.
  *
  * Why native: the HOF chain pays five interpreted expression frames per
  * gram (sequence, transform, slice, concat_ws, xxhash64) plus an O(g²)
  * string-equality array_distinct; this builds each gram once and dedups
  * long hashes in a hash set. Contamination/minhash-style candidate
  * generation over 100 TB is gram hashing and nothing else, so this is
  * the hot loop.
  */
case class ShingleHash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName(array<string>, bigint) got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleHash64.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Long].toInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n) =>
      s"${ev.value} = graft.functions.ShingleHash64.compute($toks, (int) $n);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object ShingleHash64 {
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (n <= 0 || cnt < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i + n <= cnt) {
      var j = 0
      while (j < n) {
        // concat_ws skips nulls; UTF8String.concatWs does the same
        window(j) = if (toks.isNullAt(i + j)) null
          else toks.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(Space, window: _*)
      seen.add(XxHash64Function.hash(gram, StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  val FnName = "graft_shingle_hash64"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => ShingleHash64(exprs.head, Cast(exprs(1), LongType))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}
