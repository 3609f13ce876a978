package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (Rabin/Gear-style CDC, the
  * sub-document dedup primitive of storage systems and training-data
  * pipelines): a boundary falls AFTER 1-based code-point position `i`
  * whenever the [[PolyHash]] (mult 31, mod 1e9+7) of the `window`
  * trailing code points ending at `i` is divisible by `divisor` — so
  * chunk edges follow the CONTENT, and an insertion early in a document
  * only reshapes the chunks it touches (fixed-width chunking shifts every
  * downstream edge; that is the whole point of CDC). Expected chunk
  * length ≈ `divisor` code points. Returns the ascending boundary
  * positions, from which chunks are [prev+1 .. b] plus the tail.
  *
  * Semantically identical to the HOF recompute `filter(sequence(w, n),
  * i -> poly_hash(substr(s, i-w+1, w)) % divisor = 0)` — same code-point
  * fold, same modulus — so a DuckDB oracle can replay it with
  * `list_filter`/`list_reduce`. But that recompute hashes every window
  * from scratch (O(n·w) with five interpreted frames per position); this
  * is ONE codegen'd rolling pass: prefix hash forward, window hash =
  * (h_i − h_{i−w}·31^w) mod p from a (w+1)-slot ring of prefix hashes.
  */
case class CdcBoundaries(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
      second.dataType == LongType && third.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(string, bigint, bigint) got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")

  override def nullSafeEval(s: Any, w: Any, d: Any): Any =
    CdcBoundaries.compute(s.asInstanceOf[UTF8String],
      w.asInstanceOf[Long].toInt, d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, d) =>
      s"${ev.value} = graft.functions.CdcBoundaries.compute($s, (int) $w, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object CdcBoundaries {
  private val Mult = 31L
  private val Mod = 1000000007L

  /** Rolling-hash boundary scan over Unicode code points (≡ the
    * per-window `poly_hash(substr(s, i-w+1, w)) % d = 0` recompute).
    */
  def compute(s: UTF8String, w: Int, d: Long): ArrayData = {
    if (w <= 0 || d <= 0) return new GenericArrayData(Array.empty[Int])
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.empty[Int])
    var pw = 1L
    var k = 0
    while (k < w) { pw = pw * Mult % Mod; k += 1 }
    val ring = new Array[Long](w + 1) // ring(i % (w+1)) = prefix hash of cps[0..i)
    val out = new java.util.ArrayList[Integer]()
    var h = 0L
    var i = 1
    while (i <= n) {
      h = (h * Mult + cps(i - 1)) % Mod
      ring(i % (w + 1)) = h
      if (i >= w) {
        val hOut = ring((i - w) % (w + 1))
        val wh = ((h - hOut * pw) % Mod + Mod) % Mod
        if (wh % d == 0) out.add(i)
      }
      i += 1
    }
    val arr = new Array[Int](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  val FnName = "graft_cdc_boundaries"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => CdcBoundaries(exprs.head,
      Cast(exprs(1), LongType), Cast(exprs(2), LongType))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}
