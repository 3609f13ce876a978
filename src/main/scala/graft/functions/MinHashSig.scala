package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: for permutation i in [0, k), the minimum of
  * `((i*40503 + 1299721) * h + i*7919 + 104729) mod p` over the token
  * hashes `h` — the affine permutation schedule of
  * [[graft.dedup.Dedup.minhashSignatures]], identical to the SQL
  * formulation `transform(sequence(0, k-1), i -> aggregate(hs, p, (acc, h)
  * -> least(acc, …)))` (same constants, same fold, empty input → p), so
  * the DuckDB oracle keeps matching bit-for-bit.
  *
  * Why native: the HOF formulation pays two interpreted lambda frames per
  * (permutation × token); this compiles to one static-call double loop
  * inside whole-stage codegen — the d04 hot path at 100 TB is k·tokens
  * multiply-mod-mins per row and nothing else.
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(LongType, _) if second.dataType == LongType &&
      third.dataType == LongType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName(array<bigint>, bigint, bigint) got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def nullSafeEval(hs: Any, k: Any, p: Any): Any =
    MinHashSig.compute(hs.asInstanceOf[ArrayData],
      k.asInstanceOf[Long].toInt, p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, k, p) =>
      s"${ev.value} = graft.functions.MinHashSig.compute($hs, (int) $k, $p);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object MinHashSig {
  def compute(hs: ArrayData, k: Int, p: Long): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = i.toLong * 40503L + 1299721L
      val b = i.toLong * 7919L + 104729L
      var m = p // the fold's init — empty/all-null input yields p, like aggregate()
      var j = 0
      while (j < n) {
        if (!hs.isNullAt(j)) { // least() skips nulls in the SQL form
          val v = (a * hs.getLong(j) + b) % p
          if (v < m) m = v
        }
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  val FnName = "graft_minhash_sig"

  /** The one builder both registration routes share (GraftFunctions
    * injection and the temp fallback below).
    */
  val builder: Seq[Expression] => Expression =
    exprs => MinHashSig(exprs.head,
      Cast(exprs(1), LongType), Cast(exprs(2), LongType))

  /** Idempotently register for SQL-by-name use (incl. inside lambdas). */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}
