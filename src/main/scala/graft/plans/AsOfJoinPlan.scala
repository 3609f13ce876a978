package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** A whole-operator extension — rung (c) of the build ladder: a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` for the BACKWARD AS-OF
  * JOIN, the one relational operator the engine composes from built-ins
  * (q18: union + running `last(ignoreNulls)` window) that deserves its own
  * physical form.
  *
  * Semantics (PostgreSQL-style lateral `ORDER BY ... LIMIT 1`, pandas
  * `merge_asof(direction="backward")`): for every left row, attach the
  * LAST right row with the same equi-key whose ordering tuple is `<` the
  * left's (or `<=` when `strict = false`); no match → right columns null
  * (left outer). Ordering tuples compare lexicographically, so a unique
  * tie-break column (event id) makes the match deterministic.
  *
  * Physical plan: both children hash-CLUSTERED on the equi-key and sorted
  * by (key, ordering) — exactly a sort-merge join's requirements — then a
  * single zipped forward-merge per partition: the right iterator advances
  * monotonically, one buffered row per key group, O(|L| + |R|) time and
  * O(1) state. The window formulation materializes the union of both
  * inputs through one sort; this never unions, never windows, and keeps
  * the left side's partitioning and ordering for downstream reuse.
  * At 100 TB both shapes shuffle the same bytes; the merge halves the
  * sort volume (each side sorts alone) and drops the row-widening union.
  *
  * SQL-join null semantics: null-keyed rows never match (right ones are
  * consumed unbuffered, left ones keep their group empty); right rows
  * with a null ordering tuple can't satisfy `ord < left.ord` and are
  * skipped. Nulls-first child ordering makes both guards single-pass.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    strict: Boolean,
    tolerance: Option[Long] = None) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty equi-key lists")
  require(leftOrder.length == rightOrder.length && leftOrder.nonEmpty,
    "as-of join needs matching, non-empty ordering lists")
  require(tolerance.forall(t =>
      t >= 0 && AsOfJoinExec.toleranceSupported(leftOrder.head.dataType)),
    "tolerance needs a non-negative bound and a timestamp/integral head " +
      "ordering column")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one physical form, the partitioned forward-merge. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lo, ro, strict, tol) =>
      AsOfJoinExec(lk, rk, lo, ro, strict, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    strict: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // a sort-merge join's contract: co-clustered on the equi-keys …
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // … and sorted by (keys, ordering tuple), nulls first
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrder).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrder).map(SortOrder(_, Ascending)))

  // rows are emitted in left-child order within left-child partitions, so
  // both properties survive for downstream operators to reuse
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lk = leftKeys; val rk = rightKeys
    val lo = leftOrder; val ro = rightOrder
    val strictLocal = strict
    val tolLocal = tolerance
    val headType = leftOrder.head.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lk, lOut)
        val rKeyProj = UnsafeProjection.create(rk, rOut)
        val lOrdProj = UnsafeProjection.create(lo, lOut)
        val rOrdProj = UnsafeProjection.create(ro, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
        val ordOrd = RowOrdering.createNaturalAscendingOrdering(lo.map(_.dataType))
        val resultProj = UnsafeProjection.create(out, out)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rOut.size)
        val rBuf = rIter.buffered
        // the head ordering value as a long (µs for timestamps), for the
        // tolerance window; validated representable at plan construction
        val headLong: InternalRow => Long = AsOfJoinExec.headAsLong(headType)
        // O(1) merge state: the best-so-far right row of the CURRENT key
        // group (copied — child iterators reuse row buffers) and its head
        // ordering value
        var lastRight: InternalRow = null
        var lastRightKey: UnsafeRow = null
        var lastRightHead: Long = 0L
        lIter.map { l =>
          val lKey = lKeyProj(l)
          if (lastRightKey != null && keyOrd.compare(lastRightKey, lKey) != 0) {
            lastRight = null; lastRightKey = null
          }
          if (!lKey.anyNull) {
            val lOrd = lOrdProj(l)
            var scanning = true
            while (scanning && rBuf.hasNext) {
              val rKey = rKeyProj(rBuf.head)
              // null-keyed right rows match nothing; consume (nulls sort first)
              val kc = if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
              if (kc < 0) { rBuf.next() }
              else if (kc == 0) {
                val rOrd = rOrdProj(rBuf.head)
                val oc = ordOrd.compare(rOrd, lOrd)
                if (oc < 0 || (!strictLocal && oc == 0)) {
                  val r = rBuf.next()
                  // a null ordering tuple can never satisfy ord < left.ord
                  if (!rOrd.anyNull) {
                    lastRight = r.copy()
                    lastRightKey = lKey.copy()
                    lastRightHead = headLong(rOrd)
                  }
                } else scanning = false
              } else scanning = false
            }
          }
          // the buffered match may have aged out of the tolerance window
          // for THIS left row (it stays buffered: it can never age back in,
          // but a fresher right row may still arrive for a later left row)
          val inWindow = lastRight != null && (tolLocal match {
            case Some(t) => headLong(lOrdProj(l)) - lastRightHead <= t
            case None => true
          })
          resultProj(joined(l, if (inWindow) lastRight else nullRight))
        }
      }
    }
  }
}

object AsOfJoinExec {
  import org.apache.spark.sql.types._

  /** Ordering-head types whose value is losslessly a long — the µs/native
    * units the tolerance bound is expressed in.
    */
  def toleranceSupported(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType |
         ShortType | ByteType | DateType => true
    case _ => false
  }

  /** Read the head ordering value (position 0 of the ordering projection)
    * as a long in its native units.
    */
  def headAsLong(dt: DataType): InternalRow => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => _.getLong(0)
    case IntegerType | DateType => _.getInt(0).toLong
    case ShortType => _.getShort(0).toLong
    case ByteType => _.getByte(0).toLong
    case other => throw new IllegalArgumentException(
      s"tolerance unsupported for head ordering type $other")
  }
}

/** The `Rule[LogicalPlan]` leg of the extension: Catalyst's own pushdown
  * and pruning rules stop at an operator they don't know, so without this
  * a filter above an as-of join runs post-join and the scans read every
  * column. Both rewrites exploit the operator's 1:1-per-left-row contract:
  *
  *  - deterministic predicates referencing ONLY left-side attributes
  *    commute with the join (each output row exists iff its left row
  *    does), so they push into the left child — and from there Spark's
  *    file-source planning carries them into `PushedFilters`;
  *  - a Project above the join needs only its own references plus the
  *    join's key/ordering columns, so both children prune to that set —
  *    and the scans' `ReadSchema` shrinks accordingly.
  *
  * Runs in the user-optimizer fixed-point batch; both cases return the
  * original node unchanged when there is nothing to do, which is the
  * convergence guarantee.
  */
object AsOfJoinOptimizations extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
    case p @ Project(fields, aj: AsOfJoin) =>
      val needed = AttributeSet(fields.flatMap(_.references)) ++
        AttributeSet((aj.leftKeys ++ aj.rightKeys ++ aj.leftOrder ++
          aj.rightOrder).flatMap(_.references))
      def prune(child: LogicalPlan): LogicalPlan = {
        val kept = child.output.filter(needed.contains)
        if (kept.length == child.output.length) child else Project(kept, child)
      }
      val (nl, nr) = (prune(aj.left), prune(aj.right))
      if ((nl eq aj.left) && (nr eq aj.right)) p
      else Project(fields, aj.copy(left = nl, right = nr))
  }
}

object AsOfJoinPlan {

  /** Idempotently add the planner strategy AND the optimizer rule to the
    * session (the config-free path; [[GraftExtensions]] is the
    * `spark.sql.extensions` twin for sessions built with the config).
    */
  def register(spark: SparkSession): Unit = synchronized {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(AsOfJoinOptimizations))
      exp.extraOptimizations = exp.extraOptimizations :+ AsOfJoinOptimizations
  }

  /** Backward as-of join `left ASOF JOIN right ON keys ORDER order`:
    * every left row picks the last right row at-or-before it (strictly
    * before when `strict`), optionally only if that row lies within
    * `tolerance` of the left's head ordering value (native units — µs for
    * timestamps; pandas `merge_asof(tolerance=...)`). Right columns are
    * suffixed (`_r`) — which also re-aliases them to fresh expression
    * ids, keeping a self-join's two sides unambiguous for the optimizer.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      order: Seq[(String, String)],
      strict: Boolean = false,
      rightSuffix: String = "_r",
      tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val r2 = right.select(right.columns.map(c => col(c).as(c + rightSuffix)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoin(lPlan, rPlan,
      keys.map { case (ln, _) => attr(lPlan, ln) },
      keys.map { case (_, rn) => attr(rPlan, rn + rightSuffix) },
      order.map { case (ln, _) => attr(lPlan, ln) },
      order.map { case (_, rn) => attr(rPlan, rn + rightSuffix) },
      strict, tolerance)
    GraftPlanBridge.ofRows(spark, node)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` injection point for
  * sessions configured at build time (clusters, notebooks); behaviourally
  * identical to [[AsOfJoinPlan.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinOptimizations)
  }
}
