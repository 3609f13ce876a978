package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash signature over non-negative token hashes: bit j of the
  * result is set iff more than half the tokens have bit j set — identical
  * to the SQL formulation `aggregate(sequence(0, bits-1), 0L, (acc, j) ->
  * acc + if(size(filter(hs, h -> (h div 2^j) % 2 = 1)) * 2 > size(hs),
  * 2^j, 0))` for non-negative hashes (PolyHash mod p is always ≥ 0; for
  * negative values SQL `div`/`%` and bit shifts diverge, so inputs are
  * documented non-negative). Null elements never satisfy the bit test but
  * DO count toward size(hs), exactly like the HOF filter/size pair.
  *
  * Why native: the HOF form re-walks the token array once per bit with
  * two interpreted lambda frames per step (O(bits·tokens) interpreted);
  * this is a single pass accumulating all bit counters in one codegen'd
  * loop.
  */
case class SimHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName(array<bigint>, bigint) got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(hs: Any, bits: Any): Any =
    SimHashSig.compute(hs.asInstanceOf[ArrayData], bits.asInstanceOf[Long].toInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, bits) =>
      s"${ev.value} = graft.functions.SimHashSig.compute($hs, (int) $bits);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object SimHashSig {
  def compute(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) * 2 > n) sig |= 1L << j
      j += 1
    }
    sig
  }

  val FnName = "graft_simhash_sig"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => SimHashSig(exprs.head, Cast(exprs(1), LongType))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)
}
