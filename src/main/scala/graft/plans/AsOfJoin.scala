package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DayTimeIntervalType, TimestampType}
import org.apache.spark.sql.{Column, DataFrame}

/** The full custom-operator stack of the brief's tier (c): a logical node, an
  * analysis rule, a planner strategy, and a physical operator — all wired
  * through the PUBLIC `SparkSessionExtensions` surface (GraftExtensions), no
  * `private[sql]` seams.
  *
  * Semantics (backward as-of, inclusive, left-outer — DuckDB
  * `ASOF LEFT JOIN … ON l.k = r.k AND l.ts >= r.ts`, Flink temporal join,
  * pandas `merge_asof`): every LEFT row pairs with the single RIGHT row
  * holding the LARGEST `r.ts <= l.ts` within its key group, or nulls when no
  * such row exists. SQL NULL discipline: a null key or null timestamp on
  * either side never matches.
  *
  * Why a physical operator instead of the window formulation
  * (ops/TimeSeries.scala q_join_asof, union + last(ignoreNulls) window):
  * the window plan shuffles LEFT ∪ RIGHT together and then sorts the union,
  * carrying both sides' payload columns through one oversized exchange and
  * needing the null-padding/side-tag scaffolding. [[AsOfJoinExec]] instead
  * declares `ClusteredDistribution` on each side's keys and per-partition
  * `(keys, ts)` ordering, and streams BOTH sorted sides through a single
  * forward merge — one pass, O(1) state (the last candidate row), no
  * candidate expansion, no window buffer. At 100 TB that is the same
  * exchange count as a sort-merge join with strictly less data movement
  * than the union trick, and skew degrades it linearly (state stays one
  * row regardless of key population).
  *
  * The public-API vehicle is a semantic HINT marker: [[AsOf.joinBackward]]
  * emits `left.join(right, keyEq && rTs <= lTs).hint("graft_asof")`, and the
  * injected hint-resolution rule ([[AsOfJoinHintRule]]) rewrites that exact
  * shape into [[AsOfJoinPlan]] before the analyzer's unresolved-hint sweep
  * drops unknown hints. The hint names a different operator, not a different
  * execution of the same operator — so the rule FAILS LOUDLY (analysis-time
  * `IllegalArgumentException`) on any condition it cannot prove is the as-of
  * shape, rather than silently degrading to an inner join.
  *
  * Correctness gate: `q_join_asof_native` (ops/TimeSeries.scala) runs this
  * operator against q_join_asof's DuckDB `ASOF LEFT JOIN` oracle verbatim —
  * the hash gate pins merge-join output ≡ window formulation ≡ DuckDB's
  * native as-of. AsOfJoinSpec adds partition-count invariance, null paths,
  * and a random-data brute-force reference.
  */
case class AsOfJoinPlan(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    left: LogicalPlan, right: LogicalPlan,
    toleranceUs: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Analysis rule: `UnresolvedHint("graft_asof", _, Join)` → [[AsOfJoinPlan]].
  * Injected both as a hint-resolution rule (DataFrame path: children arrive
  * already analyzed) and a resolution rule (SQL path: fires once the join
  * resolves, still ahead of the unresolved-hint sweep).
  */
case class AsOfJoinHintRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, Nil, j @ Join(l, r, Inner, Some(cond), _))
        if name.equalsIgnoreCase("graft_asof") && j.resolved =>
      extract(l, r, cond).getOrElse(throw new IllegalArgumentException(
        "graft_asof hint requires an inner join whose condition is " +
          "cross-side equi conjunct(s) plus exactly one r.ts <= l.ts bound; got: " + cond.sql))
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case x => Seq(x)
  }

  /** A foldable negative DayTimeInterval offset — what `lTs - INTERVAL I`
    * resolves to at analysis time (TimestampAddInterval with an un-folded
    * UnaryMinus literal) or after folding (a negative literal). */
  private def negIntervalUs(e: Expression): Option[Long] = e match {
    case Literal(us: Long, _: DayTimeIntervalType) if us < 0 => Some(us)
    case UnaryMinus(Literal(us: Long, _: DayTimeIntervalType), _) if us > 0 => Some(-us)
    case _ => None
  }

  /** `l.ts - I` as the analyzer leaves it:
    * Cast(DatetimeSub[replacement = TimestampAddInterval(lt, -I)]) — the
    * RuntimeReplaceable sugar node and the no-op timestamp Cast both
    * unwrap before matching the shifted timestamp. */
  private object ShiftedBack {
    def unapply(e: Expression): Option[(AttributeReference, Long)] = e match {
      case Cast(inner, TimestampType, _, _) => unapply(inner)
      case rr: RuntimeReplaceable => unapply(rr.replacement)
      case TimestampAddInterval(lt: AttributeReference, off, _) =>
        negIntervalUs(off).map(us => (lt, -us))
      case _ => None
    }
  }

  private def extract(l: LogicalPlan, r: LogicalPlan,
                      cond: Expression): Option[AsOfJoinPlan] = {
    val lOut = l.outputSet
    val rOut = r.outputSet
    def sideOf(a: Attribute): Int = if (lOut.contains(a)) 0 else if (rOut.contains(a)) 1 else -1
    // (keys, upper bounds rt<=lt, tolerance lowers rt>lt-I, unrecognized)
    val init = (Vector.empty[(Expression, Expression)],
                Vector.empty[(Expression, Expression)],
                Vector.empty[(Expression, Expression, Long)], false)
    val (keys, bounds, tols, bad) = split(cond).foldLeft(init) {
      case ((ks, bs, ts, o), EqualTo(a: AttributeReference, b: AttributeReference))
          if sideOf(a) == 0 && sideOf(b) == 1 => (ks :+ (a: Expression, b: Expression), bs, ts, o)
      case ((ks, bs, ts, o), EqualTo(a: AttributeReference, b: AttributeReference))
          if sideOf(a) == 1 && sideOf(b) == 0 => (ks :+ (b: Expression, a: Expression), bs, ts, o)
      case ((ks, bs, ts, o), LessThanOrEqual(rt: AttributeReference, lt: AttributeReference))
          if sideOf(rt) == 1 && sideOf(lt) == 0 => (ks, bs :+ (lt: Expression, rt: Expression), ts, o)
      case ((ks, bs, ts, o), GreaterThanOrEqual(lt: AttributeReference, rt: AttributeReference))
          if sideOf(lt) == 0 && sideOf(rt) == 1 => (ks, bs :+ (lt: Expression, rt: Expression), ts, o)
      // staleness tolerance: r.ts > l.ts - I  (either comparison spelling)
      case ((ks, bs, ts, o), GreaterThan(rt: AttributeReference, ShiftedBack(lt, us)))
          if sideOf(rt) == 1 && sideOf(lt) == 0 =>
        (ks, bs, ts :+ (lt: Expression, rt: Expression, us), o)
      case ((ks, bs, ts, o), LessThan(ShiftedBack(lt, us), rt: AttributeReference))
          if sideOf(rt) == 1 && sideOf(lt) == 0 =>
        (ks, bs, ts :+ (lt: Expression, rt: Expression, us), o)
      case ((ks, bs, ts, _), _) => (ks, bs, ts, true)
    }
    if (bad || keys.isEmpty || bounds.size != 1 || tols.size > 1) return None
    val (lTs, rTs) = bounds.head
    if (lTs.dataType != rTs.dataType) return None
    val tolUs = tols.headOption.map { case (lt, rt, us) =>
      // the tolerance must bound the SAME ts pair as the as-of bound, and
      // the µs merge compare requires true timestamps
      if (!lt.semanticEquals(lTs) || !rt.semanticEquals(rTs) ||
          lTs.dataType != TimestampType) return None
      us
    }
    Some(AsOfJoinPlan(keys.map(_._1), keys.map(_._2), lTs, rTs, l, r, tolUs))
  }
}

/** Planner strategy: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. */
case class AsOfJoinStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lts, rts, l, r, tol) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r), tol) :: Nil
    case _ => Nil
  }
}

/** Merge as-of join. Requires both children clustered on their keys
  * (EnsureRequirements co-partitions the two shuffles exactly as it does for
  * a sort-merge join) and sorted by (keys, ts) within partitions; streams the
  * two sorted iterators through one forward pass holding a single buffered
  * candidate row. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan,
    toleranceUs: Option[Long] = None) extends SparkPlan with BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // One output row per left row, in the left child's (keys, ts) order.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
      // the right side null-pads on a miss, so the projection must treat
      // even non-nullable right columns as nullable — binding to the raw
      // rOut would codegen away the null check and read 0 from the pad row
      val resultProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // Right-side lookahead (copied: source iterators reuse row buffers).
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTsRow: UnsafeRow = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next().copy()
            rKey = rKeyProj(rRow).copy()
            rTsRow = rTsProj(rRow).copy()
          } else { rRow = null; rKey = null; rTsRow = null }
        advanceRight()

        // Latest right row consumed for the current key run (the candidate).
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchTsUs: Long = Long.MinValue

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l).copy()
          val lTsRow = lTsProj(l).copy()
          val lValid = !lKey.anyNull && !lTsRow.isNullAt(0)
          // Consume right rows ordered before (lKey, lTs]: anything with a
          // smaller key can never match a later left row (left keys ascend),
          // and same-key rows with ts <= lTs update the candidate.
          var cont = rRow != null
          while (cont) {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0 || (kc == 0 && (rTsRow.isNullAt(0) ||
                (lValid && tsOrd.compare(rTsRow, lTsRow) <= 0)))) {
              if (kc == 0 && !rKey.anyNull && !rTsRow.isNullAt(0)) {
                matchRow = rRow; matchKey = rKey
                matchTsUs = rTsRow.getLong(0)
              }
              advanceRight()
              cont = rRow != null
            } else cont = false
          }
          numOut += 1
          // Tolerance is a filter on the candidate, not the merge: the
          // freshest same-key candidate is still the unique possible match —
          // it's just discarded when staler than the bound (strict <,
          // mirroring `r.ts > l.ts - I`). Only valid for TimestampType
          // (µs longs), enforced by the hint rule.
          val hit = lValid && matchRow != null &&
            keyOrd.compare(matchKey, lKey) == 0 &&
            toleranceUs.forall(tol => lTsRow.getLong(0) - matchTsUs < tol)
          if (hit) { numMatched += 1; resultProj(joined(l, matchRow)) }
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }
}

/** User-facing facade. */
object AsOf {
  /** Backward-inclusive left-outer as-of join: each left row takes the right
    * row with the largest `rightTs <= leftTs` in its key group. Column names
    * must be unambiguous across the two frames (alias before joining). */
  def joinBackward(leftDf: DataFrame, rightDf: DataFrame,
                   keys: Seq[(Column, Column)],
                   leftTsCol: Column, rightTsCol: Column): DataFrame = {
    val cond = keys.map { case (a, b) => a === b }.reduce(_ && _) &&
      rightTsCol <= leftTsCol
    leftDf.join(rightDf, cond).hint("graft_asof")
  }

  /** Backward as-of with a staleness TOLERANCE: the candidate must also
    * satisfy `rightTs > leftTs - tolerance` (strict — a row exactly
    * `tolerance` old does not match). `tolerance` is an interval Column,
    * e.g. `expr("INTERVAL 2 HOURS")`; timestamps only. The exec applies the
    * bound as an O(1) filter on its merge candidate — same plan, finite
    * staleness, which is what keeps as-of state evictable in production. */
  def joinBackwardTol(leftDf: DataFrame, rightDf: DataFrame,
                      keys: Seq[(Column, Column)],
                      leftTsCol: Column, rightTsCol: Column,
                      tolerance: Column): DataFrame = {
    val cond = keys.map { case (a, b) => a === b }.reduce(_ && _) &&
      rightTsCol <= leftTsCol && rightTsCol > leftTsCol - tolerance
    leftDf.join(rightDf, cond).hint("graft_asof")
  }
}
