package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Johnson-Lindenstrauss ±1 projection of one vector:
  * `jl_project(v, outDims)[j] = Σᵢ sign(i,j)·v[i]`, the sign being the
  * parity of the squared multiplicative hash
  * `h = ((i·1024+j+1)·2654435761) mod p, s = h² mod p` (p = 2³¹−1) — the
  * EXACT formula and i-ascending accumulation order of the HOF
  * formulation in [[graft.similarity.Similarity.randomProjection]], so
  * results are bit-identical, including against the DuckDB list_reduce
  * oracle. The HOF chain is CodegenFallback (two interpreted lambda
  * frames per multiply-add: 16×64 per row); this is one fused loop inside
  * whole-stage codegen.
  */
case class JlProject(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "jl_project"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName(array<double>, int) got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, d: Any): Any =
    JlProject.compute(v.asInstanceOf[ArrayData], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, d) =>
      s"${ev.value} = graft.functions.JlProject.compute($v, $d);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JlProject {
  private val P = 2147483647L

  def compute(v: ArrayData, outDims: Int): ArrayData = {
    require(outDims >= 1, s"outDims must be >= 1, got $outDims")
    val n = v.numElements()
    val acc = new Array[Double](outDims)
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val base = i.toLong * 1024L
      var j = 0
      while (j < outDims) {
        val h = (base + j + 1L) * 2654435761L % P
        // additions into acc(j) happen in ascending-i order — the exact
        // sequential fold the HOF and the oracle replay
        if ((h * h % P & 1L) == 0L) acc(j) += x else acc(j) -= x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc.map(x => x: Any))
  }

  val FnName = "graft_jl_project"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => JlProject(exprs.head, castInt(exprs(1)))

  /** Idempotently register for SQL-by-name use. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)

  private def castInt(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, IntegerType)

  def apply(spark: SparkSession, v: Column, outDims: Int): Column = {
    register(spark)
    call_function(FnName, v, org.apache.spark.sql.functions.lit(outDims))
  }
}
