package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The SQL registration table for every graft Catalyst expression — the
  * scalar-function leg of the analyst SQL surface (the as-of join's
  * `ASOF JOIN` syntax is the operator leg, `graft.plans.AsOfSql`).
  *
  * Each expression companion already registers itself as a session TEMP
  * function at its DataFrame call site (so the `graft.dedup` /
  * `graft.similarity` helpers work on any session), but a session built
  * with `spark.sql.extensions=graft.plans.GraftExtensions` should expose
  * the whole surface up front: an analyst typing
  * `SELECT graft_simhash_sig(...)` in ad-hoc SQL must not depend on some
  * DataFrame helper having run first. [[graft.plans.GraftExtensions]]
  * injects every entry of [[all]] at session build, where they resolve
  * exactly like built-ins (same codegen'd expressions, same names the
  * temp-function path uses, so the two registration routes can never
  * disagree on semantics).
  *
  * `graft_bpe_encode` is deliberately absent: its merge table is a
  * constructor parameter, not a child expression (the ranks live in an
  * immutable map baked into the codegen'd instance), so it stays a
  * per-vocabulary registration via `BpeEncode.register(spark, merges)`.
  */
object GraftFunctions {
  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Companion-side temp registration, skipped when the name already
    * resolves — on an extensions-built session the injected entry is
    * authoritative (same builder), so the DataFrame helpers neither
    * shadow it nor spam "replaced a previously registered function"
    * warnings; on a session without the extension the first helper call
    * registers the temp function exactly as before.
    */
  def registerIfAbsent(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    if (!spark.catalog.functionExists(name))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")

  private def reg(name: String, clazz: Class[_], arity: Int, usage: String)(
      build: Seq[Expression] => Expression): Registration =
    regRange(name, clazz, arity, arity, usage)(build)

  /** A registration accepting an ARITY RANGE (graft_zorder's 2-4 key
    * columns); the builder dispatches on the actual count.
    */
  private def regRange(name: String, clazz: Class[_], minArity: Int,
      maxArity: Int, usage: String)(
      build: Seq[Expression] => Expression): Registration = (
    FunctionIdentifier(name),
    // 5-arg ExpressionInfo: carries the usage string into
    // `DESCRIBE FUNCTION` without the 11-arg form's group/source
    // vocabulary validation (which buys nothing here)
    new ExpressionInfo(clazz.getCanonicalName, null, name, usage, ""),
    (exprs: Seq[Expression]) => {
      if (exprs.length < minArity || exprs.length > maxArity)
        throw new IllegalArgumentException(
          s"$name expects " + (if (minArity == maxArity) s"$minArity"
            else s"$minArity to $maxArity") +
            s" argument(s), got ${exprs.length}")
      build(exprs)
    })

  /** Every injectable scalar/aggregate expression, keyed by the same
    * `graft_*` names the companions' temp-function registrations use.
    * Each entry reuses its companion's `builder` — ONE builder per
    * function (integer-literal casts on width/modulus arguments
    * included; the expressions type-check strictly and get no implicit
    * coercion), so the injected and temp routes can never diverge.
    */
  val all: Seq[Registration] = Seq(
    reg(PolyHash.FnName, classOf[PolyHash], 3,
      "_FUNC_(str, mult, mod) - polynomial rolling hash of str")(
      PolyHash.builder),
    reg(PolyGramHash.FnName, classOf[PolyGramHash], 2,
      "_FUNC_(toks, n) - polynomial hashes of every token n-gram")(
      PolyGramHash.builder),
    reg(MinHashSig.FnName, classOf[MinHashSig], 3,
      "_FUNC_(hashes, k, p) - k-permutation MinHash signature")(
      MinHashSig.builder),
    reg(SimHashSig.FnName, classOf[SimHashSig], 2,
      "_FUNC_(hashes, bits) - SimHash majority-bit signature")(
      SimHashSig.builder),
    reg(ShingleHash64.FnName, classOf[ShingleHash64], 2,
      "_FUNC_(toks, n) - distinct xxhash64 of every token n-gram")(
      ShingleHash64.builder),
    reg(CharGramHash64.FnName, classOf[CharGramHash64], 3,
      "_FUNC_(str, n, seed) - sorted distinct xxhash64 char n-grams")(
      CharGramHash64.builder),
    reg(CharWindowHash64.FnName, classOf[CharWindowHash64], 2,
      "_FUNC_(str, w) - positional xxhash64 of every w-char window")(
      CharWindowHash64.builder),
    reg(CharGramCounts64.FnName, classOf[CharGramCounts64], 3,
      "_FUNC_(str, n, seed) - (hash, count) char n-gram multiset")(
      CharGramCounts64.builder),
    reg(GramStats.FnName, classOf[GramStats], 2,
      "_FUNC_(toks, n) - [n_grams, dups, max_count] n-gram stats")(
      GramStats.builder),
    reg(CdcBoundaries.FnName, classOf[CdcBoundaries], 3,
      "_FUNC_(str, mask, minLen) - content-defined chunk boundaries")(
      CdcBoundaries.builder),
    reg(CosineSimilarity.FnName, classOf[CosineSimilarity], 2,
      "_FUNC_(a, b) - cosine similarity of two double vectors")(
      CosineSimilarity.builder),
    reg(L2SqDistance.FnName, classOf[L2SqDistance], 2,
      "_FUNC_(a, b) - squared L2 distance of two double vectors")(
      L2SqDistance.builder),
    reg(JlProject.FnName, classOf[JlProject], 2,
      "_FUNC_(vec, outDims) - Achlioptas +-1 random projection")(
      JlProject.builder),
    reg(IntersectCardSorted.FnName, classOf[IntersectCardSorted], 2,
      "_FUNC_(a, b) - intersection cardinality of two sorted arrays")(
      IntersectCardSorted.builder),
    regRange(ZOrderEncode.FnName, classOf[ZOrderEncode], 2, 4,
      "_FUNC_(a, b[, c[, d]]) - bit-interleaved Z-order key of 2-4 ints")(
      ZOrderEncode.builder),
    reg(LeUInt.FnName, classOf[LeUInt], 3,
      "_FUNC_(bin, offset, len) - little-endian unsigned int from bytes")(
      LeUInt.builder),
    reg(CmsEstimate.FnName, classOf[CmsEstimate], 2,
      "_FUNC_(sketch, item) - count-min sketch point estimate")(
      CmsEstimate.builder),
    reg(CmsMergeAgg.FnName, classOf[CmsMergeAgg], 1,
      "_FUNC_(sketch) - aggregate merge of count-min sketches")(
      CmsMergeAgg.builder))
}
