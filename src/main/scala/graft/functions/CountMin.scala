package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Query + merge primitives for Spark's built-in `count_min_sketch`
  * aggregate (which only BUILDS a serialized sketch — core Spark ships no
  * way to read an estimate back inside a query, nor to merge the per-group
  * sketches a partitioned pipeline produces).
  *
  * Both halves a 100 TB frequency pipeline needs:
  *  - [[CmsEstimate]] — `cms_estimate(sketch, item)`: point-frequency
  *    lookup against the serialized sketch, codegen'd, with a
  *    last-sketch deserialization cache so probing N items against one
  *    broadcast sketch deserializes once per task, not once per row.
  *  - [[CmsMergeAgg]] — `cms_merge(sketch)`: merges serialized sketches
  *    (same eps/confidence/seed) into one, the rollup that lets per-day /
  *    per-partition sketches combine without re-reading the raw data.
  *    CMS merge is cell-wise addition (Cormode & Muthukrishnan 2005), so
  *    partial aggregation is exact — estimates from the merged sketch are
  *    identical to a single-pass sketch of the union.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(binary, bigint) got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsEstimate.compute(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, it) =>
      s"${ev.value} = graft.functions.CmsEstimate.compute($sk, $it);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object CmsEstimate {
  /** (bytes-identity → sketch) cache: probing a column of items against
    * one sketch value sees the same backing array row after row, so the
    * deserialization amortizes to once per task instead of once per row.
    */
  private val last = new ThreadLocal[(Array[Byte], CountMinSketch)]

  def compute(bytes: Array[Byte], item: Long): Long = {
    val cached = last.get()
    val sketch =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val s = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
        last.set((bytes, s))
        s
      }
    sketch.estimateCount(java.lang.Long.valueOf(item))
  }

  val FnName = "graft_cms_estimate"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => CmsEstimate(exprs.head, exprs(1))

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)

  def apply(spark: SparkSession, sketch: Column, item: Column): Column = {
    register(spark)
    call_function(FnName, sketch, item)
  }
}

/** Merges serialized count-min sketches produced by `count_min_sketch`
  * (same eps/confidence/seed — CountMinSketch.mergeInPlace rejects
  * incompatible shapes). Null buffer until the first sketch arrives, so
  * the aggregate needs no copy of the build parameters.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(binary) got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      // readFrom allocates a fresh sketch, so mutating it as the buffer
      // (or merging it into one) never aliases the input row's bytes
      val incoming = CountMinSketch.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buffer == null) incoming
      else { buffer.mergeInPlace(incoming); buffer }
    }
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    if (b1 == null) b2
    else if (b2 == null) b1
    else { b1.mergeInPlace(b2); b1 }

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bos = new ByteArrayOutputStream()
      buffer.writeTo(bos)
      bos.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmsMergeAgg =
    copy(child = c)
}

object CmsMergeAgg {
  val FnName = "graft_cms_merge"

  /** The one builder both registration routes share. */
  val builder: Seq[Expression] => Expression =
    exprs => CmsMergeAgg(exprs.head)

  def register(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(spark, FnName, builder)

  def apply(spark: SparkSession, sketch: Column): Column = {
    register(spark)
    call_function(FnName, sketch)
  }
}
