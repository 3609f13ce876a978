package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, ExpressionInfo, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, PredicateHelper, UnixMicros}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the native as-of join — the last rung of the extension
  * ladder. Analysts write DuckDB's `ASOF JOIN` syntax (the oracle
  * engine's own dialect, so ONE query text runs verbatim on both
  * engines):
  *
  * {{{
  *   SELECT ... FROM trades t
  *   ASOF [LEFT] JOIN quotes q
  *     ON t.sym = q.sym AND t.ts >= q.ts
  * }}}
  *
  * The ON clause needs at least one equality and exactly one inequality;
  * the inequality names the ordering and the direction, matching DuckDB:
  * `l >= r` backward, `l > r` backward strict, `l <= r` forward,
  * `l < r` forward strict. Plain `ASOF JOIN` is an inner join (unmatched
  * left rows drop, DuckDB semantics); `ASOF LEFT JOIN` keeps them with
  * null right columns.
  *
  * Spark's grammar has no ASOF token and `SparkSessionExtensions` offers
  * no way to extend the ANTLR grammar itself, so the standard
  * injected-parser pattern applies: [[AsOfSqlParser]] textually rewrites
  * the one `ASOF [LEFT] JOIN` into a plain `[LEFT] JOIN` the delegate
  * parser accepts, and tags the parsed tree with an [[AsOfSqlRewrite]]
  * marker. Once the subtree resolves, [[AsOfSqlResolution]] (running
  * inside the analyzer's main fixed-point) finds the unique join whose
  * condition has the as-of shape and swaps it for the [[AsOfJoin]]
  * logical node — physical form then chosen from statistics by
  * [[AsOfJoinStrategy]] like any other as-of join. Type coercion has
  * already run by then, so mixed-type keys arrive pre-cast.
  *
  * Scope (documented, enforced): one ASOF JOIN per statement. More would
  * need position tracking through the delegate parse; the reference's
  * analyst queries (README.md:294-313, docs/dashboard.md:59-74) are
  * single-join lookups.
  */
class AsOfSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def planOf(sqlText: String, parse: String => LogicalPlan): LogicalPlan =
    AsOfSqlParser.rewrite(sqlText) match {
      case Some((rewritten, leftOuter, rhsHint)) =>
        AsOfSqlRewrite(leftOuter, rhsHint, parse(rewritten))
      case None => parse(sqlText)
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    planOf(sqlText, delegate.parsePlan)
  override def parseQuery(sqlText: String): LogicalPlan =
    planOf(sqlText, delegate.parseQuery)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object AsOfSqlParser {
  // word-bounded so column/alias names merely CONTAINING "asof" never
  // trigger; string literals containing the exact phrase "ASOF JOIN" are
  // the accepted false-positive (same trade every textual SQL rewriter
  // makes) and fail loudly at conversion, never silently
  private val AsOfPattern =
    java.util.regex.Pattern.compile("(?i)\\bASOF\\s+(LEFT\\s+(OUTER\\s+)?)?JOIN\\b")

  /** Rewrite the single `ASOF [LEFT] JOIN` to the plain join the delegate
    * grammar accepts; None when the text has no ASOF JOIN at all. Also
    * captures the right-hand relation/alias identifiers following the
    * keyword (lower-cased) — the POSITIONAL link the resolution rule uses
    * to make sure it converts the join the analyst wrote `ASOF` on, not
    * some other join in the statement whose ON clause merely happens to
    * have the as-of shape. Empty when the right side is a
    * parenthesized subquery (no single identifier to anchor on).
    */
  private[plans] def rewrite(sqlText: String): Option[(String, Boolean, Set[String])] = {
    val m = AsOfPattern.matcher(sqlText)
    if (!m.find()) None
    else {
      val leftOuter = m.group(1) != null
      val hint = rhsHint(sqlText, m.end())
      val sb = new StringBuffer
      m.appendReplacement(sb, if (leftOuter) "LEFT JOIN" else "INNER JOIN")
      if (m.find()) throw new IllegalArgumentException(
        "ASOF JOIN: one per statement is supported by the SQL surface — " +
          "compose additional as-of joins through AsOfJoinPlan.asofJoin")
      m.appendTail(sb)
      Some((sb.toString, leftOuter, hint))
    }
  }

  private val RhsPattern = java.util.regex.Pattern.compile(
    "^\\s*([A-Za-z_][\\w.]*)(?:\\s+(?:(?i:AS)\\s+)?([A-Za-z_]\\w*))?")

  /** The relation-name last part and optional alias directly after the
    * ASOF JOIN keyword — either will surface as a `SubqueryAlias` over
    * the join's right child once resolved.
    */
  private def rhsHint(sqlText: String, from: Int): Set[String] = {
    val m = RhsPattern.matcher(sqlText.substring(from))
    if (!m.find() || m.group(1) == null) Set.empty
    else {
      val rel = m.group(1).split('.').last.toLowerCase
      val alias = Option(m.group(2)).map(_.toLowerCase)
        .filterNot(Set("on", "using", "lateral"))
      Set(rel) ++ alias
    }
  }

  /** `epoch_us(ts)`: DuckDB's microsecond-epoch scalar, registered so
    * oracle-dialect query text runs unchanged on Spark (it is exactly
    * Spark's `unix_micros`, down to the `UnixMicros` expression — fully
    * codegen'd).
    */
  val epochUsFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("epoch_us"),
    new ExpressionInfo(classOf[UnixMicros].getCanonicalName, "epoch_us"),
    (exprs: Seq[Expression]) => {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"epoch_us expects one timestamp argument, got ${exprs.length}")
      UnixMicros(exprs.head)
    })
}

/** Post-parse marker: "this tree contained one ASOF JOIN, rewritten to a
  * plain join of `joinType`". Exists only between parse and resolution —
  * [[AsOfSqlResolution]] removes it on the analyzer pass that sees the
  * child resolved, so no optimizer or planner rule ever meets one.
  */
case class AsOfSqlRewrite(leftOuter: Boolean, rhsHint: Set[String],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): AsOfSqlRewrite =
    copy(child = newChild)
}

/** Analyzer-side half of the SQL surface: once the marked subtree is
  * resolved (attributes bound, types coerced), find the UNIQUE join whose
  * ON condition has the as-of shape — ≥1 cross-side equality plus exactly
  * one cross-side inequality — and replace it with the [[AsOfJoin]]
  * logical node. Inner ASOF appends the `IsNotNull(right ordering)`
  * filter that drops unmatched lefts (matched rows always carry a
  * non-null right ordering value, unmatched rows never do — the operator
  * excludes null-ordered rights by contract), turning the operator's
  * native left-outer contract into DuckDB's inner semantics.
  */
object AsOfSqlResolution extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // same fast-path discipline as AsOfJoinOptimizations: the rule sits in
    // the analyzer's fixed-point for every query, almost none of which
    // carry the marker
    if (!plan.exists(_.isInstanceOf[AsOfSqlRewrite])) plan
    else plan.transformUp {
      case AsOfSqlRewrite(leftOuter, rhsHint, child) if child.resolved =>
        convert(leftOuter, rhsHint, child)
    }
  }

  /** The as-of shape of a join condition, if it has one: oriented
    * (left, right) equality pairs, the oriented ordering pair, direction,
    * strictness.
    */
  private def asOfShape(l: LogicalPlan, r: LogicalPlan, cond: Expression)
      : Option[(Seq[(Expression, Expression)], (Expression, Expression),
          AsOfDirection, Boolean)] = {
    // orient a binary comparison's operands as (left-side, right-side),
    // flagging whether the textual order was flipped
    def orient(a: Expression, b: Expression): Option[(Expression, Expression, Boolean)] =
      if (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet))
        Some((a, b, false))
      else if (b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet))
        Some((b, a, true))
      else None
    val eqs = Vector.newBuilder[(Expression, Expression)]
    var ineq: Option[((Expression, Expression), AsOfDirection, Boolean)] = None
    var ok = true
    splitConjunctivePredicates(cond).foreach {
      case EqualTo(a, b) => orient(a, b) match {
        case Some((le, re, _)) => eqs += ((le, re))
        case None => ok = false
      }
      case cmp @ (_: GreaterThan | _: GreaterThanOrEqual |
                  _: LessThan | _: LessThanOrEqual) if ineq.isEmpty =>
        val (a, b) = (cmp.children(0), cmp.children(1))
        orient(a, b) match {
          case Some((le, re, flipped)) =>
            // normalize to "left OP right"; a flipped comparison inverts
            val (dir, strict) = (cmp, flipped) match {
              case (_: GreaterThanOrEqual, false) | (_: LessThanOrEqual, true) =>
                (AsOfDirection.Backward, false)
              case (_: GreaterThan, false) | (_: LessThan, true) =>
                (AsOfDirection.Backward, true)
              case (_: LessThanOrEqual, false) | (_: GreaterThanOrEqual, true) =>
                (AsOfDirection.Forward, false)
              case _ =>
                (AsOfDirection.Forward, true)
            }
            ineq = Some(((le, re), dir, strict))
          case None => ok = false
        }
      case _ => ok = false
    }
    val eqList = eqs.result()
    if (ok && eqList.nonEmpty && ineq.isDefined)
      Some((eqList, ineq.get._1, ineq.get._2, ineq.get._3))
    else None
  }

  private def convert(leftOuter: Boolean, rhsHint: Set[String],
      child: LogicalPlan): LogicalPlan = {
    val wantType = if (leftOuter) LeftOuter else Inner
    val shaped = child.collect {
      case j @ Join(l, r, t, Some(cond), _)
          if t == wantType && asOfShape(l, r, cond).isDefined => j
    }
    // positional anchor: the parser captured the relation/alias written
    // right after the ASOF keyword; the converted join's RIGHT subtree
    // must carry that name. Without it, a statement whose real as-of ON
    // clause fails shape detection while some OTHER join coincidentally
    // has the shape (a range join: equality + one inequality) would get
    // THAT join silently converted — the hint turns the mistake into the
    // loud error below. An empty hint (subquery right side) keeps the
    // shape-only behavior.
    def aliases(p: LogicalPlan): Set[String] = p.collect {
      case sa: SubqueryAlias => sa.alias.toLowerCase
    }.toSet
    val candidates =
      if (rhsHint.isEmpty) shaped
      else shaped.filter(j => aliases(j.right).intersect(rhsHint).nonEmpty)
    if (candidates.length != 1) throw new IllegalArgumentException(
      s"ASOF JOIN: expected exactly one ${if (leftOuter) "LEFT " else ""}join " +
        "with an as-of ON shape (>=1 equality plus exactly one inequality " +
        s"between the two sides)" +
        (if (rhsHint.nonEmpty) s" whose right side is ${rhsHint.mkString("/")}"
         else "") +
        s", found ${candidates.length}")
    val target = candidates.head
    child.transformUp {
      case j: Join if j eq target =>
        val (eqs, (lo, ro), dir, strict) =
          asOfShape(j.left, j.right, j.condition.get).get
        if (leftOuter) {
          AsOfJoin(j.left, j.right,
            eqs.map(_._1), eqs.map(_._2), Seq(lo), Seq(ro),
            strict, tolerance = None, direction = dir,
            broadcast = AsOfBroadcast.Auto)
        } else {
          // inner semantics: drop unmatched lefts. The matched-ness
          // witness is a literal TRUE projected onto the right child —
          // null after the join iff the row is unmatched. Filtering on
          // IsNotNull(right ordering EXPRESSION) instead would misfire
          // when ro is non-null-propagating (coalesce(q.ts, 0) evaluates
          // non-null over an all-null right row).
          val marker = Alias(Literal(true), "__asof_matched")()
          val r2 = Project(j.right.output :+ marker, j.right)
          val asof = AsOfJoin(j.left, r2,
            eqs.map(_._1), eqs.map(_._2), Seq(lo), Seq(ro),
            strict, tolerance = None, direction = dir,
            broadcast = AsOfBroadcast.Auto)
          Project(asof.output.filterNot(_.exprId == marker.exprId),
            Filter(IsNotNull(marker.toAttribute), asof))
        }
    }
  }
}
