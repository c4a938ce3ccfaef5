package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Catalyst optimizer rule: rewrite the naive bounded-interval join into the
  * time-bucketed equi join — automatically, as a plan transformation, instead
  * of asking every query author to hand-write the `q_join_range_bucketed`
  * formulation.
  *
  * Matched shape (what the DataFrame API / SQL produces for
  * "b within (a, a + I]" — see q_join_range, ops/TimeSeries.scala):
  *
  *   Join Inner, (k_a = k_b) AND (ts_b > ts_a)
  *                          AND (ts_b <= TimestampAddInterval(ts_a, I))
  *
  * with `I` a positive constant DayTimeInterval literal and both ts sides
  * TIMESTAMP attributes. Rewrite:
  *
  *   Project(join.output)
  *     Join Inner, original-cond AND (graft_bkt = graft_bkt_b)
  *       Generate(explode([us_a div I, us_a div I + 1])) over left
  *       Project(right.output :+ us_b div I as graft_bkt_b)
  *
  * Why this is sound: with bucket width exactly `I` µs, any pair with
  * ts_a < ts_b <= ts_a + I has floor(us_b/I) ∈ {floor(us_a/I),
  * floor(us_a/I)+1}, and the two exploded bucket ids are distinct — so every
  * qualifying pair survives exactly once, and the original range conjuncts
  * (kept verbatim in the join condition) filter the false candidates. The
  * planner then extracts (k, bucket) as the equi-join keys, turning an
  * unbounded per-key sort-merge residual scan into hash-partitionable work
  * bounded by bucket population — measured 24× → 5.5× at the 10× tier
  * (BASELINE.md). Floor division is spelled (us − pmod(us, I)) div I so
  * pre-epoch timestamps (negative µs) bucket by true floor, not
  * truncation-toward-zero.
  *
  * Scope guards: inner joins only; exactly the two-sided bound pattern (one
  * lower, one upper on the same ts pair); at least one cross-side equi
  * conjunct (so the result is a real equi join, not a bucket-only join);
  * idempotence via the reserved `graft_bkt` name (the rule runs inside the
  * fixed-point operator-optimization batch). Default OFF —
  * `spark.graft.rewrite.intervalJoin=true` enables it (conf-scoped in
  * q_join_range_auto; q_join_range itself stays the declared naive
  * baseline).
  */
case class IntervalJoinBucketing(session: SparkSession) extends Rule[LogicalPlan] {

  private val Flag = "spark.graft.rewrite.intervalJoin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.getOption(Flag).contains("true")) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint).getOrElse(j)
    }
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  /** Floor division of a µs long by a positive constant width — exact floor
    * (not truncation) so negative timestamps bucket correctly. */
  private def floorDiv(us: Expression, w: Long): Expression =
    IntegralDivide(Subtract(us, Pmod(us, Literal(w))), Literal(w))

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjs = splitConj(cond)
    // idempotence: the rewritten join's condition references graft_bkt
    if (conjs.exists(_.references.exists(_.name.startsWith("graft_bkt"))))
      return None
    val leftOut = left.outputSet
    val rightOut = right.outputSet
    def isLeft(a: Attribute) = leftOut.contains(a)
    def isRight(a: Attribute) = rightOut.contains(a)

    val hasEqui = conjs.exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (isLeft(a) && isRight(b)) || (isLeft(b) && isRight(a))
      case _ => false
    }
    if (!hasEqui) return None

    // lower bound: ts_b > ts_a (either spelling)
    val lowers = conjs.flatMap {
      case GreaterThan(b: AttributeReference, a: AttributeReference)
        if isRight(b) && isLeft(a) => Some((a, b))
      case LessThan(a: AttributeReference, b: AttributeReference)
        if isLeft(a) && isRight(b) => Some((a, b))
      case _ => None
    }
    // upper bound: ts_b <= ts_a + I, I a positive DayTimeInterval literal
    val found: Seq[(AttributeReference, AttributeReference, Long)] =
      lowers.flatMap { case (aTs, bTs) =>
        conjs.collectFirst {
          case LessThanOrEqual(b2: AttributeReference,
                               TimestampAddInterval(a2: AttributeReference,
                                                    Literal(us: Long, _: DayTimeIntervalType),
                                                    _))
            if b2.semanticEquals(bTs) && a2.semanticEquals(aTs) && us > 0 =>
            (aTs, bTs, us)
        }
      }
    if (found.isEmpty) return None
    val (aTs, bTs, widthUs) = found.head
    if (aTs.dataType != TimestampType || bTs.dataType != TimestampType)
      return None

    val aBkt = AttributeReference("graft_bkt", LongType, nullable = true)()
    val b0 = floorDiv(UnixMicros(aTs), widthUs)
    val genLeft = Generate(
      Explode(CreateArray(Seq(b0, Add(b0, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(aBkt), child = left)
    val bAlias = Alias(floorDiv(UnixMicros(bTs), widthUs), "graft_bkt_b")()
    val projRight = Project(right.output :+ bAlias, right)
    val newJoin = Join(genLeft, projRight, Inner,
      Some(And(cond, EqualTo(aBkt, bAlias.toAttribute))), hint)
    Some(Project(j.output, newJoin))
  }
}
