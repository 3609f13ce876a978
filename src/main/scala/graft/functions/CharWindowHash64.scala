package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional 64-bit hashes of every `w`-char window of a string — index
  * `i` (0-based) holds EXACTLY `xxhash64(substring(text, i + 1, w))` (same
  * XXH64 over the same UTF-8 byte slice, same seed 42), as ONE O(len)
  * loop.
  *
  * Why native: `xxhash64(substring(text, pos, w))` evaluated per exploded
  * position restarts `UTF8String.substring`'s codepoint walk from byte 0
  * every call — O(pos) per window, O(len²) per document — and allocates a
  * UTF8String per window. Walking the codepoint start offsets once and
  * hashing each window's byte slice in place (the [[CharGramHash64]]
  * move) makes the whole per-document pass linear and allocation-free.
  *
  * Sizing mirrors `sequence(1, greatest(len - w + 1, 1))`: a string
  * shorter than `w` yields its single whole-text window (the empty window
  * for empty text), so no row ever vanishes.
  */
case class CharWindowHash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "charwindow_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName(string, bigint) got (${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString})")
    }

  override def nullSafeEval(text: Any, w: Any): Any =
    CharWindowHash64.compute(text.asInstanceOf[UTF8String],
      w.asInstanceOf[Long].toInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, w) =>
      s"${ev.value} = graft.functions.CharWindowHash64.compute($text, (int) $w);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object CharWindowHash64 {

  /** Byte offset of every codepoint start, plus the end sentinel. Shared
    * by the positional and the counted gram loops.
    */
  private[functions] def charStarts(text: UTF8String): (Array[Int], Int) = {
    val nBytes = text.numBytes()
    val starts = new Array[Int](text.numChars() + 1)
    var len = 0
    var b = 0
    while (b < nBytes) {
      starts(len) = b
      len += 1
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
    }
    starts(len) = nBytes
    (starts, len)
  }

  def compute(text: UTF8String, w: Int): GenericArrayData = {
    require(w >= 1, "window width must be positive")
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val (starts, len) = charStarts(text)
    val cnt = math.max(len - w + 1, 1)
    val hashes = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val from = starts(i)
      val until = starts(math.min(i + w, len))
      // seed 42 = Spark's xxhash64 default: bit-identical to
      // xxhash64(substring(text, i + 1, w))
      hashes(i) = XXH64.hashUnsafeBytes(base, off + from, until - from, 42L)
      i += 1
    }
    new GenericArrayData(hashes)
  }

  val FnName = "graft_charwindow_hash64"

  val builder: Seq[Expression] => Expression =
    exprs => CharWindowHash64(exprs.head, Cast(exprs(1), LongType))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}

/** The character n-gram MULTISET of a string as (hash, count) pairs —
  * `explode(grams) → groupBy(xxhash64(gram)) → count` collapsed into one
  * O(len log len) per-row loop (hash every gram with the caller's seed,
  * sort, run-length encode).
  *
  * Why native: the exploded form ships every gram OCCURRENCE (a fresh
  * UTF8String each) into a corpus-wide hash aggregation whose keys are
  * per-document by construction — the engine cannot see that and pays a
  * full shuffle of O(corpus chars) rows for an aggregation that never
  * crosses a document boundary. Here the multiset is finished before the
  * row leaves the operator, so the only rows that ever shuffle are the
  * per-document DISTINCT grams feeding the candidate join.
  *
  * Gram extent mirrors [[CharGramHash64]] / ANSI substr: positions
  * 1..len-n+1, a string shorter than `n` yields its single whole-text
  * gram. The per-row `seed` folds the caller's blocking key into the
  * hash, exactly like [[CharGramHash64]].
  */
case class CharGramCounts64(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "chargram_counts64"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName(string, bigint, bigint) got (${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
    }

  override def nullSafeEval(text: Any, n: Any, seed: Any): Any =
    CharGramCounts64.compute(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Long].toInt, seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, n, seed) =>
      s"${ev.value} = graft.functions.CharGramCounts64.compute($text, (int) $n, $seed);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object CharGramCounts64 {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def compute(text: UTF8String, n: Int, seed: Long): GenericArrayData = {
    require(n >= 1, "gram width must be positive")
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val (starts, len) = CharWindowHash64.charStarts(text)
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
    // run-length encode the sorted occurrences into (key, cnt) structs
    var distinct = 1
    i = 1
    while (i < cnt) {
      if (hashes(i) != hashes(i - 1)) distinct += 1
      i += 1
    }
    val out = new Array[Any](distinct)
    var w = 0
    var runStart = 0
    i = 1
    while (i <= cnt) {
      if (i == cnt || hashes(i) != hashes(runStart)) {
        out(w) = new GenericInternalRow(
          Array[Any](hashes(runStart), (i - runStart).toLong))
        w += 1
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  val FnName = "graft_chargram_counts64"

  val builder: Seq[Expression] => Expression =
    exprs => CharGramCounts64(exprs.head,
      Cast(exprs(1), LongType), Cast(exprs(2), LongType))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}
