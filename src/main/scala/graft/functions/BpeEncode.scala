package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization of one word against a FIXED merge
  * ranking (public literature: Sennrich et al. 2016; the merge-apply loop
  * of every GPT-2-style tokenizer): start from single code points, then
  * repeatedly take the adjacent symbol pair with the LOWEST merge rank and
  * fuse every left-to-right non-overlapping occurrence, until no adjacent
  * pair is in the table. Returns the final symbol array.
  *
  * The merge table is a constructor parameter (plan-time constant): it
  * ships to executors inside the serialized expression and is referenced
  * from generated code via `addReferenceObj` — no broadcast, no driver
  * state, deterministic everywhere. The loop is real tokenization, not a
  * regex approximation — the same algorithm a training pipeline runs when
  * it needs exact token counts for packing/budgeting.
  *
  * Scale: per-row cost is O(word² · |active merges|) worst-case but
  * bounded by word length; no shuffle. Corpora with Zipfian word reuse
  * can dictionary-encode first (distinct words → encode → join back) —
  * the oracle SQL does exactly that — but the per-row form keeps the plan
  * a single projection.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(string) got ${child.dataType.simpleString}")

  @transient private lazy val table = BpeEncode.buildTable(merges)

  override def nullSafeEval(w: Any): Any =
    BpeEncode.encode(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncode.Table].getName)
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.BpeEncode.encode($w, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncode {

  /** Merge ranking in lookup form; `Serializable` so `addReferenceObj`
    * can ship it inside the generated-code references array.
    */
  final class Table(
      val ranks: java.util.HashMap[String, Integer],
      val pairs: Array[(String, String)]) extends Serializable

  private def key(a: String, b: String): String = a + "\u0001" + b

  def buildTable(merges: Seq[(String, String)]): Table = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(key(a, b), i) }
    new Table(m, merges.toArray)
  }

  /** The merge-apply loop. Initial symbols are CODE POINTS (same unit as
    * `PolyHash`/`ascii(substr(…))`), so the oracle's per-character split
    * sees identical atoms on ASCII and beyond.
    */
  def encode(w: UTF8String, t: Table): ArrayData = {
    val s = w.toString
    var syms = new ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms += s.substring(i, i + n)
      i += n
    }
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the word
      var best = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = t.ranks.get(key(syms(j), syms(j + 1)))
        if (r != null && (best == -1 || r < best)) best = r
        j += 1
      }
      if (best == -1) done = true
      else {
        val (sx, sy) = t.pairs(best)
        val out = new ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k + 1 < syms.length && syms(k) == sx && syms(k + 1) == sy) {
            out += sx + sy
            k += 2
          } else {
            out += syms(k)
            k += 1
          }
        }
        syms = out
        done = syms.length < 2
      }
    }
    new GenericArrayData(syms.map(x => UTF8String.fromString(x): Any).toArray)
  }

  val FnName = "graft_bpe_encode"

  /** Idempotently register for SQL-by-name use, with the given merges
    * baked into the registered builder.
    */
  def register(spark: SparkSession, merges: Seq[(String, String)]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => BpeEncode(exprs.head, merges), "scala_udf")

  def apply(spark: SparkSession, word: Column,
      merges: Seq[(String, String)]): Column = {
    register(spark, merges)
    call_function(FnName, word)
  }
}
