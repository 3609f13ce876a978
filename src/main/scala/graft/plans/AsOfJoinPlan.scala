package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** The as-of join's match direction (pandas `merge_asof(direction=...)`).
  *
  *  - [[AsOfDirection.Backward]]: the LAST right row at-or-before the left
  *    row (strictly before when `strict`) — attribution, staleness joins.
  *  - [[AsOfDirection.Forward]]: the FIRST right row at-or-after the left
  *    row (strictly after when `strict`) — next-event / time-to-response.
  *  - [[AsOfDirection.Nearest]]: whichever of those two candidates is
  *    closer by the HEAD ordering column's value (µs for timestamps,
  *    native units otherwise); ties go backward, pandas-style. Requires a
  *    head ordering type losslessly representable as a long.
  */
sealed abstract class AsOfDirection
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection
}

/** Physical-form selection for the as-of join — the same three-way knob
  * Spark's equi-joins expose through hints vs
  * `spark.sql.autoBroadcastJoinThreshold`:
  *
  *  - [[AsOfBroadcast.Auto]] (default): the planner consults the right
  *    side's size statistics and picks [[BroadcastAsOfJoinExec]] when they
  *    fall at-or-under `spark.sql.autoBroadcastJoinThreshold`, else the
  *    partitioned merge [[AsOfJoinExec]] — exactly how BHJ-vs-SMJ is
  *    chosen for ordinary joins, so the same query broadcasts at dev SF
  *    and merges at 100 TB with no code change.
  *  - [[AsOfBroadcast.Force]]: always broadcast (the `broadcast()` hint
  *    analog — caller asserts the right side fits in executor memory).
  *  - [[AsOfBroadcast.Never]]: always merge (pins the partitioned form,
  *    e.g. to guarantee a bucketed layout's zero-exchange plan is the one
  *    being exercised regardless of current stats).
  *
  * See PLANS.md "broadcast vs merge" for the decision table.
  */
sealed abstract class AsOfBroadcast
object AsOfBroadcast {
  case object Auto extends AsOfBroadcast
  case object Force extends AsOfBroadcast
  case object Never extends AsOfBroadcast
}

/** A whole-operator extension — rung (c) of the build ladder: a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` for the AS-OF JOIN, the
  * one relational operator the engine composes from built-ins (q18: union
  * + running `last(ignoreNulls)` window) that deserves its own physical
  * form.
  *
  * Semantics (PostgreSQL-style lateral `ORDER BY ... LIMIT 1`, pandas
  * `merge_asof`): for every left row, attach the matching right row with
  * the same equi-key per [[AsOfDirection]] — backward: last right row
  * whose ordering tuple is `<` the left's (`<=` when `strict = false`);
  * forward: first right row `>` (`>=`); nearest: the closer of the two by
  * head-column distance, ties backward. No match → right columns null
  * (left outer). Ordering tuples compare lexicographically, so a unique
  * tie-break column (event id) makes the match deterministic.
  *
  * Physical plan: both children hash-CLUSTERED on the equi-key and sorted
  * by (key, ordering) — exactly a sort-merge join's requirements — then a
  * single zipped forward-merge per partition: the right iterator advances
  * monotonically with O(1) state per key group (the last strictly-before
  * row, the first/last tuple-equal rows, and a one-row lookahead for the
  * forward candidate), O(|L| + |R|) time. The window formulation
  * materializes the union of both inputs through one sort; this never
  * unions, never windows, and keeps the left side's partitioning and
  * ordering for downstream reuse. At 100 TB both shapes shuffle the same
  * bytes; the merge halves the sort volume (each side sorts alone) and
  * drops the row-widening union.
  *
  * SQL-join null semantics: null-keyed rows never match (right ones are
  * consumed unbuffered, left ones keep their group empty); rows with a
  * null anywhere in their ordering tuple never match on EITHER side — a
  * comparison against NULL is unknown in SQL, so a null-ordered left row
  * emits unmatched in all three directions (the symmetric twin of the
  * right-side exclusion; without it a nulls-first left tuple would
  * spuriously take the group's first right row under Forward). Nulls-first
  * child ordering makes every guard single-pass.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    strict: Boolean,
    tolerance: Option[Long] = None,
    direction: AsOfDirection = AsOfDirection.Backward,
    broadcast: AsOfBroadcast = AsOfBroadcast.Auto) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty equi-key lists")
  require(leftOrder.length == rightOrder.length && leftOrder.nonEmpty,
    "as-of join needs matching, non-empty ordering lists")
  // the merge's comparators are built from LEFT-side types and applied to
  // both sides' projected rows, so a type mismatch must fail at plan
  // construction, not as a runtime ClassCastException mid-merge
  require(leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType },
    "as-of join equi-key dataTypes must match pairwise: " +
      leftKeys.map(_.dataType.simpleString).mkString("(", ",", ")") + " vs " +
      rightKeys.map(_.dataType.simpleString).mkString("(", ",", ")"))
  require(leftOrder.zip(rightOrder).forall { case (l, r) => l.dataType == r.dataType },
    "as-of join ordering dataTypes must match pairwise: " +
      leftOrder.map(_.dataType.simpleString).mkString("(", ",", ")") + " vs " +
      rightOrder.map(_.dataType.simpleString).mkString("(", ",", ")"))
  require(tolerance.forall(t =>
      t >= 0 && AsOfJoinExec.toleranceSupported(leftOrder.head.dataType)),
    "tolerance needs a non-negative bound and a timestamp/integral head " +
      "ordering column")
  require(direction != AsOfDirection.Nearest ||
      AsOfJoinExec.toleranceSupported(leftOrder.head.dataType),
    "direction=nearest measures distance on the head ordering column, " +
      "which must be a timestamp/integral type")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule — the shuffle-vs-broadcast duality every equi-join family
  * has, resolved the way Spark resolves it for its own joins: under
  * [[AsOfBroadcast.Auto]] the right child's estimated size is compared
  * against `spark.sql.autoBroadcastJoinThreshold` (≤ 0 disables, same
  * contract); [[AsOfBroadcast.Force]]/[[AsOfBroadcast.Never]] override the
  * statistics in either direction. The planner never silently broadcasts a
  * side whose stats exceed the threshold — at 100 TB Auto therefore always
  * lands on the partitioned merge.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lo, ro, strict, tol, dir, bcast) =>
      val useBroadcast = bcast match {
        case AsOfBroadcast.Force => true
        case AsOfBroadcast.Never => false
        case AsOfBroadcast.Auto =>
          val threshold =
            org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
          threshold > 0 && r.stats.sizeInBytes <= threshold
      }
      if (useBroadcast)
        BroadcastAsOfJoinExec(lk, rk, lo, ro, strict, tol, dir,
          planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lo, ro, strict, tol, dir,
          planLater(l), planLater(r)) :: Nil
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
    direction: AsOfDirection,
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
    val dir = direction
    val headType = leftOrder.head.dataType
    // the head ordering value as a long (µs for timestamps) drives the
    // tolerance window and nearest's distance; validated representable at
    // plan construction, so only materialize the reader when needed
    val needHead = tolLocal.isDefined || dir == AsOfDirection.Nearest
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
        val headLong: InternalRow => Long =
          if (needHead) AsOfJoinExec.headAsLong(headType) else null
        // O(1) merge state for the CURRENT key group (rows copied — child
        // iterators reuse row buffers). Which slots are populated depends
        // on direction:
        //   prev     last right row with ordering tuple strictly < the
        //            current left's (backward/nearest candidate)
        //   eqFirst  first right row with tuple == the current left's
        //            (forward non-strict candidate)
        //   eqLast   last such row (backward/nearest non-strict candidate;
        //            ages into prev when the left advances past it)
        // The forward strictly-after candidate is the UNCONSUMED rBuf.head
        // — a peek, so it stays available for later left rows.
        val needPrev = dir != AsOfDirection.Forward
        val needEqFirst = dir == AsOfDirection.Forward && !strictLocal
        val needEqLast = dir != AsOfDirection.Forward
        var groupKey: UnsafeRow = null
        var prev: InternalRow = null
        var prevHead: Long = 0L
        var eqFirst: InternalRow = null
        var eqLast: InternalRow = null
        var eqOrd: UnsafeRow = null
        var eqHead: Long = 0L
        lIter.map { l =>
          val lKey = lKeyProj(l)
          if (groupKey != null && keyOrd.compare(groupKey, lKey) != 0) {
            groupKey = null; prev = null
            eqFirst = null; eqLast = null; eqOrd = null
          }
          var matched: InternalRow = null
          val lOrd = lOrdProj(l)
          // null-keyed lefts never match; neither do lefts with a null
          // anywhere in the ordering tuple (comparison-with-NULL is
          // unknown — and they sort nulls-first, so skipping their scan
          // leaves the merge state consistent for the group's later rows)
          if (!lKey.anyNull && !lOrd.anyNull) {
            // tuple-equal state from an earlier (smaller) left row ages
            // into the strictly-before slot
            if (eqOrd != null && ordOrd.compare(eqOrd, lOrd) < 0) {
              if (needPrev && eqLast != null) { prev = eqLast; prevHead = eqHead }
              eqFirst = null; eqLast = null; eqOrd = null
            }
            var scanning = true
            while (scanning && rBuf.hasNext) {
              val rKey = rKeyProj(rBuf.head)
              // null-keyed right rows match nothing; consume (nulls sort first)
              val kc = if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
              if (kc < 0) { rBuf.next() }
              else if (kc == 0) {
                val rOrd = rOrdProj(rBuf.head)
                val oc = ordOrd.compare(rOrd, lOrd)
                if (oc < 0) {
                  val r = rBuf.next()
                  // a null ordering tuple never matches — consume, drop
                  if (needPrev && !rOrd.anyNull) {
                    prev = r.copy()
                    if (needHead) prevHead = headLong(rOrd)
                    if (groupKey == null) groupKey = lKey.copy()
                  }
                } else if (oc == 0) {
                  val r = rBuf.next()
                  if (!rOrd.anyNull) {
                    if (eqOrd == null) eqOrd = rOrd.copy()
                    if (needEqFirst && eqFirst == null) eqFirst = r.copy()
                    if (needEqLast) eqLast = r.copy()
                    if (needHead) eqHead = headLong(rOrd)
                    if (groupKey == null) groupKey = lKey.copy()
                  }
                } else scanning = false
              } else scanning = false
            }
            // ---- candidate selection ----
            // backward: last tuple <= (non-strict) or < (strict) the left's
            var b: InternalRow = null; var bHead = 0L
            if (dir != AsOfDirection.Forward) {
              if (!strictLocal && eqLast != null) { b = eqLast; bHead = eqHead }
              else { b = prev; bHead = prevHead }
            }
            // forward: first tuple >= (non-strict) or > (strict) — the
            // tuple-equal first row, else the unconsumed lookahead
            var f: InternalRow = null; var fHead = 0L
            if (dir != AsOfDirection.Backward) {
              if (needEqFirst && eqFirst != null) { f = eqFirst; fHead = eqHead }
              else if (rBuf.hasNext) {
                val hKey = rKeyProj(rBuf.head)
                if (!hKey.anyNull && keyOrd.compare(hKey, lKey) == 0) {
                  val hOrd = rOrdProj(rBuf.head)
                  if (!hOrd.anyNull && ordOrd.compare(hOrd, lOrd) > 0) {
                    f = rBuf.head
                    if (needHead) fHead = headLong(hOrd)
                  }
                }
              }
            }
            matched = AsOfJoinExec.choose(dir, tolLocal, headLong, lOrd,
              b, bHead, f, fHead)
          }
          resultProj(joined(l, if (matched != null) matched else nullRight))
        }
      }
    }
  }
}

/** The broadcast form of the as-of join — the shuffle-vs-broadcast
  * duality every equi-join family has, for the case production hits
  * constantly: a HUGE event stream as-of-joined to a SMALL reference side
  * (an SCD dimension, a quotes snapshot, a model-version table). The
  * right side broadcasts whole; the per-key ord-SORTED index built from
  * it is memoized per (executor, broadcast, operator) — the first task to
  * land on an executor builds it, every later task reuses it (the same
  * sharing discipline Spark's hashed relations use) — and every left row
  * answers by binary search. The left child needs NO exchange and NO sort
  * (its partitioning and ordering pass straight through), which at 100 TB
  * deletes the entire left-side shuffle the merge form pays. Chosen by
  * the planner from right-side statistics under [[AsOfBroadcast.Auto]],
  * or forced with [[AsOfBroadcast.Force]]: the planner never silently
  * swaps a right side that stats say exceeds the broadcast threshold
  * into executor memory.
  *
  * Semantics are IDENTICAL to [[AsOfJoinExec]] in all three directions
  * (the property suite runs both forms against the same brute force):
  * same null-key/null-ordering exclusions on both sides, same strictness,
  * same tolerance window, same [[AsOfJoinExec.choose]] candidate pick.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    strict: Boolean,
    tolerance: Option[Long],
    direction: AsOfDirection,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the whole point: nothing required of the left, the right broadcasts
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Identifies THIS operator instance's index in the executor-side cache:
    * generated on the driver at construction and shipped inside the task
    * closure, so two different as-of joins probing the SAME broadcast
    * (exchange reuse) still build their own per-key/per-ordering indexes.
    */
  private val indexCacheKey: String = java.util.UUID.randomUUID().toString

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lk = leftKeys; val rk = rightKeys
    val lo = leftOrder; val ro = rightOrder
    val strictLocal = strict
    val tolLocal = tolerance
    val dir = direction
    val headType = leftOrder.head.dataType
    val needHead = tolLocal.isDefined || dir == AsOfDirection.Nearest
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val cacheKey = indexCacheKey
    left.execute().mapPartitions { lIter =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lk, lOut)
        val lOrdProj = UnsafeProjection.create(lo, lOut)
        val ordOrd = RowOrdering.createNaturalAscendingOrdering(lo.map(_.dataType))
        val resultProj = UnsafeProjection.create(out, out)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rOut.size)
        val headLong: InternalRow => Long =
          if (needHead) AsOfJoinExec.headAsLong(headType) else null
        // key → ord-sorted (ord, row) entries, built ONCE per (executor,
        // broadcast, operator) and shared by every task that lands here —
        // not once per partition (with thousands of left tasks that would
        // re-pay the build's sort thousands of times over). The same
        // null-key / null-ordering exclusions as the merge's consume path
        // (such rows can never match).
        val index = BroadcastAsOfJoinExec.indexFor(bcast.value, cacheKey) {
          val rKeyProj = UnsafeProjection.create(rk, rOut)
          val rOrdProj = UnsafeProjection.create(ro, rOut)
          val idxOrd =
            RowOrdering.createNaturalAscendingOrdering(lo.map(_.dataType))
          val buffers = new java.util.HashMap[UnsafeRow,
            scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]()
          bcast.value.foreach { r =>
            val k = rKeyProj(r)
            if (!k.anyNull) {
              val o = rOrdProj(r)
              if (!o.anyNull) {
                var buf = buffers.get(k)
                if (buf == null) {
                  buf = scala.collection.mutable.ArrayBuffer
                    .empty[(UnsafeRow, InternalRow)]
                  buffers.put(k.copy(), buf)
                }
                buf += ((o.copy(), r))
              }
            }
          }
          val built = new java.util.HashMap[UnsafeRow,
            Array[(UnsafeRow, InternalRow)]]()
          buffers.forEach((k, buf) => built.put(k,
            buf.sortWith((a, b) => idxOrd.compare(a._1, b._1) < 0).toArray))
          built
        }
        lIter.map { l =>
          val lKey = lKeyProj(l)
          var matched: InternalRow = null
          if (!lKey.anyNull) {
            val entries = index.get(lKey)
            if (entries != null) {
              val lOrd = lOrdProj(l)
              // the symmetric left-side null-ordering exclusion the merge
              // form applies: a null-ordered left emits unmatched
              if (!lOrd.anyNull) {
              // lower/upper bound of the tuple-equal run
              var a = 0; var z = entries.length
              while (a < z) {
                val m = (a + z) >>> 1
                if (ordOrd.compare(entries(m)._1, lOrd) < 0) a = m + 1 else z = m
              }
              val lb = a
              a = lb; z = entries.length
              while (a < z) {
                val m = (a + z) >>> 1
                if (ordOrd.compare(entries(m)._1, lOrd) <= 0) a = m + 1 else z = m
              }
              val ub = a
              val prev = if (lb > 0) entries(lb - 1) else null
              val eqFirst = if (lb < ub) entries(lb) else null
              val eqLast = if (lb < ub) entries(ub - 1) else null
              val fwd = if (ub < entries.length) entries(ub) else null
              var b: InternalRow = null; var bHead = 0L
              if (dir != AsOfDirection.Forward) {
                val e = if (!strictLocal && eqLast != null) eqLast else prev
                if (e != null) {
                  b = e._2; if (needHead) bHead = headLong(e._1)
                }
              }
              var f: InternalRow = null; var fHead = 0L
              if (dir != AsOfDirection.Backward) {
                val e =
                  if (dir == AsOfDirection.Forward && !strictLocal &&
                      eqFirst != null) eqFirst
                  else fwd
                if (e != null) {
                  f = e._2; if (needHead) fHead = headLong(e._1)
                }
              }
              matched = AsOfJoinExec.choose(dir, tolLocal, headLong, lOrd,
                b, bHead, f, fHead)
              }
            }
          }
          resultProj(joined(l, if (matched != null) matched else nullRight))
        }
      }
    }
  }
}

/** Executor-side cache for [[BroadcastAsOfJoinExec]]'s per-key sorted
  * index, mirroring how Spark shares one hashed relation per executor:
  * entries are keyed on the broadcast VALUE (weakly — when the broadcast
  * is destroyed or evicted the index is collectable with it) and, within
  * one broadcast, on the operator instance's UUID (exchange reuse can feed
  * two different as-of joins from one broadcast). The build runs under the
  * cache lock, so concurrent first tasks on an executor wait for one build
  * instead of racing duplicates — the same trade Spark's relation
  * deserialization makes.
  */
object BroadcastAsOfJoinExec {
  type Index = java.util.HashMap[UnsafeRow, Array[(UnsafeRow, InternalRow)]]
  private val cache = new java.util.WeakHashMap[AnyRef,
    java.util.concurrent.ConcurrentHashMap[String, Index]]()

  /** Observability hook (and the spec's witness that N partitions share
    * ONE build): counts index builds in this JVM.
    */
  val indexBuildCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Two-level locking so one join's index build never convoys another's:
    * the global lock guards only the cheap weak-map lookup, while the
    * build itself runs under `computeIfAbsent`'s per-key bin lock —
    * concurrent queries over DIFFERENT broadcasts (or different operators
    * on one broadcast) build in parallel, and tasks needing the SAME
    * index still see exactly one build.
    */
  private[plans] def indexFor(broadcastValue: AnyRef, operatorKey: String)(
      build: => Index): Index = {
    val perOp = cache.synchronized {
      var m = cache.get(broadcastValue)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Index]()
        cache.put(broadcastValue, m)
      }
      m
    }
    perOp.computeIfAbsent(operatorKey, _ => {
      indexBuildCount.incrementAndGet()
      build
    })
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

  /** The direction/tolerance candidate pick shared by the merge and the
    * broadcast-index execs: given the backward candidate `b` (last tuple
    * at-or-before per strictness) and the forward candidate `f` (first
    * tuple after, or first tuple-equal for non-strict Forward), apply the
    * tolerance window and the direction rule. `headLong == null` means
    * neither tolerance nor nearest needs head values. A null left head
    * makes distances undefined — then tolerance can't hold, and nearest
    * degrades to backward preference.
    */
  private[plans] def choose(
      dir: AsOfDirection, tol: Option[Long],
      headLong: InternalRow => Long, lOrd: InternalRow,
      b0: InternalRow, bHead: Long, f0: InternalRow, fHead: Long): InternalRow = {
    var b = b0; var f = f0
    if (headLong != null) {
      if (lOrd.isNullAt(0)) {
        if (tol.isDefined) { b = null; f = null }
        if (b != null) b else f
      } else {
        val lHead = headLong(lOrd)
        tol.foreach { t =>
          if (b != null && lHead - bHead > t) b = null
          if (f != null && fHead - lHead > t) f = null
        }
        dir match {
          case AsOfDirection.Backward => b
          case AsOfDirection.Forward => f
          case AsOfDirection.Nearest =>
            if (b != null && f != null) {
              // ties go backward, pandas-style
              if (lHead - bHead <= fHead - lHead) b else f
            } else if (b != null) b else f
        }
      }
    } else if (dir == AsOfDirection.Forward) f else b
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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // fast-path guard: the rule sits in session-global extraOptimizations
    // once registered, so every query's fixed-point batch calls it — skip
    // the transform allocation for the overwhelming majority of plans
    // that contain no AsOfJoin node (and keep the match surface strictly
    // limited to plans that do)
    if (!plan.exists(_.isInstanceOf[AsOfJoin])) plan else applyToAsOf(plan)
  }

  private def applyToAsOf(plan: LogicalPlan): LogicalPlan = plan.transform {
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

  /** As-of join `left ASOF JOIN right ON keys ORDER order`: every left
    * row picks the right row per [[AsOfDirection]] — backward (default):
    * the last right row at-or-before it (strictly before when `strict`);
    * forward: the first at-or-after; nearest: the closer of those two by
    * head-column distance, ties backward — optionally only if that row
    * lies within `tolerance` of the left's head ordering value (native
    * units — µs for timestamps; pandas `merge_asof(tolerance=...)`).
    * Right columns are suffixed (`_r`) — which also re-aliases them to
    * fresh expression ids, keeping a self-join's two sides unambiguous
    * for the optimizer.
    *
    * Determinism: ordering tuples compare lexicographically, and when
    * multiple right rows share an identical FULL ordering tuple within a
    * key group the match's non-ordering payload columns are whichever row
    * the (unstable-within-ties) child sort emits last (backward) / the
    * lookahead sees first (forward). Append a unique tie-break column
    * (event id) to `order` to make the matched row itself deterministic.
    *
    * `broadcast` picks the physical form ([[AsOfBroadcast]]): Auto
    * (default) consults the right side's size statistics against
    * `spark.sql.autoBroadcastJoinThreshold` exactly like Spark's own
    * equi-joins; Force/Never override. See PLANS.md "broadcast vs merge"
    * for the decision table.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      order: Seq[(String, String)],
      strict: Boolean = false,
      rightSuffix: String = "_r",
      tolerance: Option[Long] = None,
      direction: AsOfDirection = AsOfDirection.Backward,
      broadcast: AsOfBroadcast = AsOfBroadcast.Auto): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val r2 = right.select(
      right.columns.map(c => col(c).as(c + rightSuffix)).toIndexedSeq: _*)
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
      strict, tolerance, direction, broadcast)
    GraftPlanBridge.ofRows(spark, node)
  }

  /** TIME-SLICED as-of join — the skew escape hatch for the partitioned
    * merge, now an operator instead of a paragraph (PLANS.md "broadcast
    * vs merge", last row): the merge form clusters each equi-key's WHOLE
    * history onto one task, so one hot key (a bot user with 10M events)
    * serializes, and AQE's skew split does not apply to custom nodes.
    * When the join carries a tolerance — attribution windows always do —
    * the composite-key pattern restores parallelism EXACTLY:
    *
    *  1. both sides get a slice key `floor(head_ts / sliceUs)`;
    *  2. right rows replicate into the adjacent slice(s) a candidate
    *     could be matched from (backward: the NEXT slice; forward: the
    *     PREVIOUS; nearest: both) — with `toleranceUs <= sliceUs`, every
    *     in-window candidate of a left in slice s lives in slice s-1/s
    *     (backward) etc., so the replicated group contains a superset of
    *     the true candidates and the tolerance check at emit discards
    *     the rest;
    *  3. the native as-of join runs with (keys :+ slice) as the
    *     equi-key — the hot key's history now spreads across
    *     `span / sliceUs` independent tasks.
    *
    * Cost: the right side replicates 2× (3× for nearest) — bytes, not
    * semantics — which at 100 TB is the standard salting trade: bounded
    * amplification for unbounded parallelism. Results are row-for-row
    * identical to `asofJoin(..., tolerance = Some(toleranceUs))`
    * (property-swept in PropertySpec; q85 hash-checks against q77's
    * oracle). Null ordering heads get a null slice and stay unmatched,
    * matching the plain operator's null semantics.
    */
  def asofJoinTimeSliced(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      order: Seq[(String, String)],
      toleranceUs: Long,
      sliceUs: Long,
      strict: Boolean = false,
      rightSuffix: String = "_r",
      direction: AsOfDirection = AsOfDirection.Backward,
      broadcast: AsOfBroadcast = AsOfBroadcast.Auto): DataFrame = {
    require(sliceUs > 0 && toleranceUs >= 0 && toleranceUs <= sliceUs,
      "time-sliced as-of needs 0 <= tolerance <= slice width: a candidate " +
        "must never be more than one slice away")
    import org.apache.spark.sql.functions.{array, col, explode, lit, pmod, unix_micros}
    val slice = "__asof_slice"
    // the internal slice/shift columns are added with withColumn, which
    // silently REPLACES a same-named user column — refuse up front rather
    // than drop user data on the way out
    Seq(slice, "__asof_shift").foreach { n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"asofJoinTimeSliced: reserved internal column name '$n' already " +
          "exists on an input — rename it before the join")
    }
    // the head ordering column drives slicing, in the same long units the
    // tolerance is expressed in (µs for timestamps, native otherwise)
    def headLong(df: DataFrame, name: String): Column = {
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      df.schema(name).dataType match {
        case TimestampType | TimestampNTZType => unix_micros(col(name))
        case _ => col(name).cast("long")
      }
    }
    // the slice KEY is the slice's start instant (ts - ts mod width) —
    // exact LONG arithmetic end to end, no division at all. A quotient
    // formulation with `/` would round heads above 2^53 (nanosecond
    // epochs: Spark's `/` on longs is double division) and perturb slice
    // boundaries, silently dropping boundary-adjacent candidates vs the
    // plain tolerance as-of. pmod is non-negative, so the start floors
    // toward -inf for negative timestamps too; adjacency shifts move by
    // whole widths.
    def sliceOf(ts: Column): Column = ts - pmod(ts, lit(sliceUs))
    val lSliced = left.withColumn(slice, sliceOf(headLong(left, order.head._1)))
    // replicate via ONE scan + explode of the shift offsets (a union of
    // per-shift branches would re-scan the right side once per copy)
    val shifts = (direction match {
      case AsOfDirection.Backward => Seq(0L, 1L) // visible to the NEXT slice's lefts
      case AsOfDirection.Forward => Seq(0L, -1L)
      case AsOfDirection.Nearest => Seq(-1L, 0L, 1L)
    }).map(_ * sliceUs)
    val rSliced = right
      .withColumn("__asof_shift", explode(array(shifts.map(lit): _*)))
      .withColumn(slice,
        sliceOf(headLong(right, order.head._2)) + col("__asof_shift"))
      .drop("__asof_shift")
    asofJoin(lSliced, rSliced,
      keys :+ (slice -> slice), order,
      strict, rightSuffix, Some(toleranceUs), direction, broadcast)
      .drop(slice, slice + rightSuffix)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` injection point for
  * sessions configured at build time (clusters, notebooks). Superset of
  * [[AsOfJoinPlan.register]]: the planner strategy and optimizer rule are
  * identical, and on top of them the config-built path adds the SQL
  * surface — the `ASOF JOIN` parser ([[AsOfSqlParser]]), its resolution
  * rule ([[AsOfSqlResolution]]), and the `epoch_us` scalar — which only a
  * session built with the extension can carry (Spark exposes no post-hoc
  * parser injection, so `register` can't add these to a live session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinOptimizations)
    ext.injectParser((_, delegate) => new AsOfSqlParser(delegate))
    // DML statements (MERGE INTO / DELETE FROM / UPDATE) over lake views
    // dispatch to the native copy-on-write operations; parser order is
    // immaterial — each wrapper passes non-matching statements through
    ext.injectParser((_, delegate) => new LakeDmlParser(delegate))
    ext.injectResolutionRule(_ => AsOfSqlResolution)
    // merge-on-read: typed-lake relations with live delete files resolve
    // to (scan LEFT ANTI JOIN delete rows) — deleted rows never reach SQL
    ext.injectResolutionRule(_ => MorScanResolution)
    ext.injectFunction(AsOfSqlParser.epochUsFunction)
    // the scalar-function leg of the SQL surface: every graft codegen'd
    // expression resolves by its graft_* name in ad-hoc SQL without any
    // DataFrame helper having registered it first
    graft.functions.GraftFunctions.all.foreach(ext.injectFunction)
  }
}
