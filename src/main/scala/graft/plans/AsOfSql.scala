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
  * Multiple ASOF joins per statement compose: each occurrence is matched
  * to its join independently through its right-hand relation/alias anchor
  * (scoped resolution), so an SCD2 lookup chained with a quote
  * attribution runs as ONE statement. Occurrences whose right side is a
  * parenthesized subquery carry no anchor and resolve only when exactly
  * one unclaimed as-of-shaped join of their type remains — genuinely
  * ambiguous statements fail loudly, never guess. The textual rewrite
  * skips string literals, quoted identifiers, and comments: a literal
  * containing the phrase "ASOF JOIN" is never corrupted and never counts
  * as an occurrence.
  */
class AsOfSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def planOf(sqlText: String, parse: String => LogicalPlan): LogicalPlan =
    AsOfSqlParser.rewrite(sqlText) match {
      case Some((rewritten, marks)) =>
        AsOfSqlRewrite(marks, parse(rewritten))
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
  // trigger; matches inside string literals, quoted identifiers, or
  // comments are excluded by the maskedSpans scan below — a literal
  // containing the phrase "ASOF JOIN" is copied through untouched and
  // never counts as an occurrence
  private val AsOfPattern =
    java.util.regex.Pattern.compile("(?i)\\bASOF\\s+(LEFT\\s+(OUTER\\s+)?)?JOIN\\b")

  /** One `ASOF [LEFT] JOIN` occurrence in a statement: its outer-ness and
    * the right-hand relation/alias identifiers following the keyword
    * (lower-cased) — the POSITIONAL anchor the resolution rule uses to
    * match the occurrence to the join the analyst wrote `ASOF` on.
    * Empty hint when the right side is a parenthesized subquery (no
    * single identifier to anchor on).
    */
  final case class AsOfMark(leftOuter: Boolean, rhsHint: Set[String])

  /** `true` at index `i` iff `sql(i)` sits inside a span the textual
    * rewrite must never touch: a string literal (`'…'` or `"…"`, with
    * doubled-quote and backslash escapes — Spark's default dialect reads
    * double quotes as strings), a backtick-quoted identifier, a `--` line
    * comment, or a (nested) bracketed comment. Single linear scan.
    */
  private[plans] def maskedSpans(sql: String): Array[Boolean] = {
    val masked = new Array[Boolean](sql.length)
    var i = 0
    def quoted(q: Char, backslashEscapes: Boolean): Unit = {
      masked(i) = true; i += 1
      var open = true
      while (i < sql.length && open) {
        masked(i) = true
        if (backslashEscapes && sql(i) == '\\' && i + 1 < sql.length) {
          masked(i + 1) = true; i += 2
        } else if (sql(i) == q) {
          if (i + 1 < sql.length && sql(i + 1) == q) { // doubled = escaped
            masked(i + 1) = true; i += 2
          } else { open = false; i += 1 }
        } else i += 1
      }
    }
    while (i < sql.length) sql(i) match {
      case '\'' | '"' => quoted(sql(i), backslashEscapes = true)
      case '`' => quoted('`', backslashEscapes = false)
      case '-' if i + 1 < sql.length && sql(i + 1) == '-' =>
        while (i < sql.length && sql(i) != '\n') { masked(i) = true; i += 1 }
      case '/' if i + 1 < sql.length && sql(i + 1) == '*' =>
        var depth = 1
        masked(i) = true; masked(i + 1) = true; i += 2
        while (i < sql.length && depth > 0) {
          if (sql(i) == '/' && i + 1 < sql.length && sql(i + 1) == '*') {
            masked(i) = true; masked(i + 1) = true; depth += 1; i += 2
          } else if (sql(i) == '*' && i + 1 < sql.length && sql(i + 1) == '/') {
            masked(i) = true; masked(i + 1) = true; depth -= 1; i += 2
          } else { masked(i) = true; i += 1 }
        }
      case _ => i += 1
    }
    masked
  }

  /** Rewrite every unmasked `ASOF [LEFT] JOIN` to the plain join the
    * delegate grammar accepts, collecting one [[AsOfMark]] per occurrence
    * in textual order; None when the text has no unmasked ASOF JOIN at
    * all (literal-only occurrences are left byte-identical).
    */
  private[plans] def rewrite(sqlText: String): Option[(String, Seq[AsOfMark])] = {
    val m = AsOfPattern.matcher(sqlText)
    lazy val masked = maskedSpans(sqlText)
    val sb = new StringBuffer
    val marks = Seq.newBuilder[AsOfMark]
    var n = 0
    while (m.find()) {
      if (!masked(m.start())) {
        val leftOuter = m.group(1) != null
        marks += AsOfMark(leftOuter, rhsHint(sqlText, m.end(), masked))
        m.appendReplacement(sb, if (leftOuter) "LEFT JOIN" else "INNER JOIN")
        n += 1
      }
      // a masked match gets no appendReplacement: the following append
      // copies it through verbatim
    }
    if (n == 0) None
    else {
      m.appendTail(sb)
      Some((sb.toString, marks.result()))
    }
  }

  private val RhsPattern = java.util.regex.Pattern.compile(
    "^\\s*([A-Za-z_][\\w.]*)(?:\\s+(?:(?i:AS)\\s+)?([A-Za-z_]\\w*))?")

  private val AliasPattern = java.util.regex.Pattern.compile(
    "^\\s*(?:(?i:AS)\\s+)?([A-Za-z_]\\w*)")

  private val NonAnchors = Set("on", "using", "lateral")

  /** The anchor identifiers directly after the ASOF JOIN keyword — the
    * relation name's last part and/or its alias for a named relation, or
    * the ALIAS of a parenthesized subquery (found by walking to the
    * matching close paren, skipping masked spans, so literals containing
    * parens can't derail the walk). Any of them will surface as a
    * `SubqueryAlias` over the join's right child once resolved. Empty
    * only for an UNALIASED subquery — no identifier exists to anchor on.
    */
  private def rhsHint(sqlText: String, from: Int,
      masked: Array[Boolean]): Set[String] = {
    var i = from
    while (i < sqlText.length && sqlTextWs(sqlText(i))) i += 1
    if (i < sqlText.length && sqlText(i) == '(') {
      var depth = 0
      var end = -1
      while (i < sqlText.length && end < 0) {
        if (!masked(i)) {
          if (sqlText(i) == '(') depth += 1
          else if (sqlText(i) == ')') { depth -= 1; if (depth == 0) end = i + 1 }
        }
        i += 1
      }
      if (end < 0) Set.empty
      else {
        val m = AliasPattern.matcher(sqlText.substring(end))
        if (!m.find() || m.group(1) == null) Set.empty
        else Set(m.group(1).toLowerCase).diff(NonAnchors)
      }
    } else {
      val m = RhsPattern.matcher(sqlText.substring(from))
      if (!m.find() || m.group(1) == null) Set.empty
      else {
        val rel = m.group(1).split('.').last.toLowerCase
        val alias = Option(m.group(2)).map(_.toLowerCase)
          .filterNot(NonAnchors)
        Set(rel) ++ alias
      }
    }
  }

  private def sqlTextWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

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

/** Post-parse marker: "this tree contained these ASOF JOIN occurrences,
  * each rewritten to a plain join". Exists only between parse and
  * resolution — [[AsOfSqlResolution]] removes it on the analyzer pass
  * that sees the child resolved, so no optimizer or planner rule ever
  * meets one.
  */
case class AsOfSqlRewrite(marks: Seq[AsOfSqlParser.AsOfMark],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): AsOfSqlRewrite =
    copy(child = newChild)
}

/** Analyzer-side half of the SQL surface: once the marked subtree is
  * resolved (attributes bound, types coerced), match each recorded ASOF
  * occurrence to the join whose ON condition has the as-of shape — ≥1
  * cross-side equality plus exactly one cross-side inequality — and whose
  * right subtree carries the occurrence's anchor alias, then replace that
  * join with the [[AsOfJoin]] logical node. Anchored occurrences resolve
  * first (each must match exactly one join); anchor-less occurrences
  * (subquery right sides) take the sole remaining candidate of their join
  * type or fail loudly. Inner ASOF appends a matched-marker filter that
  * drops unmatched lefts (matched rows always carry the marker's TRUE,
  * unmatched rows carry null — safe even when the right ordering
  * expression is non-null-propagating), turning the operator's native
  * left-outer contract into DuckDB's inner semantics.
  */
object AsOfSqlResolution extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // same fast-path discipline as AsOfJoinOptimizations: the rule sits in
    // the analyzer's fixed-point for every query, almost none of which
    // carry the marker
    if (!plan.exists(_.isInstanceOf[AsOfSqlRewrite])) plan
    else plan.transformUp {
      case AsOfSqlRewrite(marks, child) if child.resolved =>
        convert(marks, child)
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

  private def convert(marks: Seq[AsOfSqlParser.AsOfMark],
      child: LogicalPlan): LogicalPlan = {
    // positional anchor: the parser captured the relation/alias written
    // right after each ASOF keyword; a converted join's RIGHT subtree
    // must carry that name. Without it, a statement whose real as-of ON
    // clause fails shape detection while some OTHER join coincidentally
    // has the shape (a range join: equality + one inequality) would get
    // THAT join silently converted — the anchor turns the mistake into
    // the loud error below. Anchored marks resolve FIRST so an
    // anchor-less mark (subquery right side) sees only the leftovers —
    // it converts the sole remaining candidate of its type, or refuses
    // the genuinely ambiguous statement.
    def aliases(p: LogicalPlan): Set[String] = p.collect {
      case sa: SubqueryAlias => sa.alias.toLowerCase
    }.toSet
    // the OUTERMOST SubqueryAlias is the binding one: for `quotes q` the
    // user alias q wraps the relation's own alias, and matching on it
    // first is what lets the same table appear under two ASOF joins with
    // distinct aliases (q, q2) — the subtree-wide set would put the
    // relation name in both and falsely report ambiguity
    def outerAlias(p: LogicalPlan): Set[String] = p match {
      case sa: SubqueryAlias => Set(sa.alias.toLowerCase)
      case _ => Set.empty
    }
    val ordered = marks.filter(_.rhsHint.nonEmpty) ++
      marks.filter(_.rhsHint.isEmpty)
    // one mark converted per pass: conversion rebuilds ancestor nodes, so
    // node identity is only stable within a pass — each iteration
    // re-collects candidates over the current tree (converted joins are
    // AsOfJoin nodes by then and can never match twice)
    ordered.foldLeft(child) { (plan, mark) =>
      val wantType = if (mark.leftOuter) LeftOuter else Inner
      val shaped = plan.collect {
        case j @ Join(l, r, t, Some(cond), _)
            if t == wantType && asOfShape(l, r, cond).isDefined => j
      }
      val candidates =
        if (mark.rhsHint.isEmpty) shaped
        else {
          val byOuter = shaped.filter(j =>
            outerAlias(j.right).intersect(mark.rhsHint).nonEmpty)
          if (byOuter.nonEmpty) byOuter
          else shaped.filter(j =>
            aliases(j.right).intersect(mark.rhsHint).nonEmpty)
        }
      if (candidates.length != 1) throw new IllegalArgumentException(
        s"ASOF JOIN: expected exactly one " +
          s"${if (mark.leftOuter) "LEFT " else ""}join " +
          "with an as-of ON shape (>=1 equality plus exactly one inequality " +
          s"between the two sides)" +
          (if (mark.rhsHint.nonEmpty)
            s" whose right side is ${mark.rhsHint.mkString("/")}"
           else "") +
          s", found ${candidates.length}")
      val target = candidates.head
      plan.transformUp {
        case j: Join if j eq target => convertOne(j, mark.leftOuter)
      }
    }
  }

  private def convertOne(j: Join, leftOuter: Boolean): LogicalPlan = {
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
