package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SORTED deduped 64-bit hashes of every character n-gram of a string —
  * `array_sort(array_distinct(transform(sequence(1, greatest(len-n+1, 1)),
  * i -> xxhash64(substr(text, i, n)))))` as ONE codegen'd loop, with a
  * per-row `seed` (callers pass a hash of the blocking key, making the
  * gram keys block-discriminating without a separate join column).
  *
  * ANSI substr semantics: positions run 1..len-n+1 (full-width grams);
  * a string shorter than n yields its single whole-text gram (the empty
  * gram for empty text), so no row ever vanishes.
  *
  * Why native: the HOF chain pays interpreted frames per gram (sequence,
  * transform, substr, hash) plus an O(g²) array_distinct; char-gram
  * near-dup over a corpus is gram hashing and set intersection and
  * nothing else, so this is the hot loop. Sorted output is the contract
  * [[IntersectCardSorted]] relies on for its merge-count.
  */
case class CharGramHash64(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chargram_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName(string, bigint, bigint) got (${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
    }

  override def nullSafeEval(text: Any, n: Any, seed: Any): Any =
    CharGramHash64.compute(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Long].toInt, seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, n, seed) =>
      s"${ev.value} = graft.functions.CharGramHash64.compute($text, (int) $n, $seed);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object CharGramHash64 {

  def compute(text: UTF8String, n: Int, seed: Long): GenericArrayData = {
    require(n >= 1, "gram width must be positive")
    // UTF8String.substring walks from byte 0 every call (O(position)),
    // which turns a naive gram loop into O(len²) per document — measured
    // as the dominant cost at sf0.1. Instead, walk the codepoint start
    // offsets once and hash each gram's byte slice in place (exactly what
    // XxHash64Function.hash does for a whole UTF8String: XXH64 over the
    // backing bytes), so the text is never copied and the loop is O(len).
    val nBytes = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val starts = new Array[Int](text.numChars() + 1)
    var len = 0
    var b = 0
    while (b < nBytes) {
      starts(len) = b
      len += 1
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
    }
    starts(len) = nBytes
    val cnt = math.max(len - n + 1, 1)
    val hashes = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val from = starts(i)
      val until = starts(math.min(i + n, len))
      hashes(i) = XXH64.hashUnsafeBytes(base, off + from, until - from, seed)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // dedup in place on the sorted array
    var w = 0
    var r = 1
    while (r < cnt) {
      if (hashes(r) != hashes(w)) { w += 1; hashes(w) = hashes(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w + 1))
  }

  val FnName = "graft_chargram_hash64"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => CharGramHash64(exprs.head,
      Cast(exprs(1), LongType), Cast(exprs(2), LongType))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}
