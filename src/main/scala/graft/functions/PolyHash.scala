package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash `fold(h*mult + codepoint) mod p` over a
  * string — the token/document fingerprint primitive used by text
  * fingerprinting, MinHash and SimHash.
  *
  * Semantically identical to the built-in formulation
  * `aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))),
  * 0L, (acc, c) -> (acc*mult + c) % p)` — same fold order, same modulus,
  * same code-point semantics — so DuckDB oracles keep matching. But it
  * compiles to one static-call loop instead of materializing an index
  * array plus two interpreted lambda frames per character, and it is
  * callable BY NAME inside SQL lambda bodies (register first), which the
  * Column API cannot reach.
  */
case class PolyHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
      second.dataType == LongType && third.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(string, bigint, bigint) got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")

  override def nullSafeEval(s: Any, m: Any, p: Any): Any =
    PolyHash.compute(s.asInstanceOf[UTF8String],
      m.asInstanceOf[Long], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m, p) =>
      s"${ev.value} = graft.functions.PolyHash.compute($s, $m, $p);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object PolyHash {
  /** Fold over Unicode code points (≡ `ascii(substr(s, i, 1))` per char). */
  def compute(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  val FnName = "graft_poly_hash"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => PolyHash(exprs.head, castLong(exprs(1)), castLong(exprs(2)))

  /** Idempotently register for SQL-by-name use (incl. inside lambdas). */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)

  private def castLong(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)

  def apply(spark: SparkSession, s: Column, mult: Long, mod: Long): Column = {
    register(spark)
    call_function(FnName, s, org.apache.spark.sql.functions.lit(mult),
      org.apache.spark.sql.functions.lit(mod))
  }
}
