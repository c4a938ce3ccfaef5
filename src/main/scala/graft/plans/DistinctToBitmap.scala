package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, BitOrAgg, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst optimizer rule: rewrite `COUNT(DISTINCT c)` over an integral
  * column into the 62-bit-word bitmap aggregation — automatically, as a plan
  * transformation, instead of asking the query author to hand-write the
  * `q_agg_bitmap` formulation (the second injected rule beside
  * [[IntervalJoinBucketing]]; same conf-gated, oracle-row-identity pattern).
  *
  * Matched shape (exactly what `groupBy(g).agg(countDistinct(c))` produces,
  * BEFORE Spark's own RewriteDistinctAggregates runs — injected operator-
  * optimization rules sit in the earlier fixed-point batch):
  *
  *   Aggregate [g...], [g..., count(distinct c) AS n]
  *
  * with every grouping expression an Attribute, every output either a
  * grouping attribute or THE single distinct count, and `c` an integral
  * attribute. Rewrite:
  *
  *   Aggregate [g...], [g..., coalesce(sum(bit_count(bits)), 0) AS n]
  *     Aggregate [g..., word], [g..., bit_or(shiftleft(1, pmod(c, 62))) AS bits]
  *       Project [child.out, (c - pmod(c, 62)) div 62 AS word]
  *
  * Why this wins at scale: Spark plans a distinct count as a two-round
  * aggregation whose FIRST shuffle carries every distinct (g, c) pair —
  * corpus-sized for high-cardinality c. The bitmap form's first shuffle
  * carries one 8-byte word per 62 adjacent values present (the roaring-
  * bitmap container idea in pure SQL types), with map-side bit_or combine;
  * the second round is bounded by |groups| × word-span. Exactness: every
  * value sets exactly one bit in exactly one word, bit_or is idempotent, so
  * popcount sums are the true distinct count — the oracle gate (row
  * identity vs COUNT(DISTINCT)) holds by construction, not approximation.
  *
  * Scope guards: single distinct count, no other aggregate in the node (a
  * mixed node would need every other aggregate re-aggregated through the
  * two levels); integral c (byte/short/int/long — floor-div words handle
  * negatives); attribute-only groupings; no FILTER clause; idempotence via
  * the reserved `graft_bm_` name prefix. All-null groups yield 0 via the
  * COALESCE (count(distinct) ignores nulls; nulls reach a null word whose
  * popcount sum is null). Default OFF — `spark.graft.rewrite.distinctBitmap
  * =true` enables (conf-scoped in q_agg_distinct_auto).
  */
case class DistinctToBitmap(session: SparkSession) extends Rule[LogicalPlan] {

  private val Flag = "spark.graft.rewrite.distinctBitmap"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.getOption(Flag).contains("true")) return plan
    plan.transformUp {
      case a: Aggregate => rewrite(a).getOrElse(a)
    }
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Exact floor division (not truncation) so negative values word
    * correctly — the IntervalJoinBucketing floorDiv on a value column. */
  private def floorDiv(v: Expression, w: Long): Expression =
    IntegralDivide(Subtract(v, Pmod(v, Literal(w))), Literal(w))

  private def rewrite(a: Aggregate): Option[LogicalPlan] = {
    // idempotence: our own intermediate aggregate carries graft_bm_ names
    if (a.aggregateExpressions.exists(_.name.startsWith("graft_bm_")))
      return None
    if (!a.groupingExpressions.forall(_.isInstanceOf[Attribute])) return None
    val groupAttrs = a.groupingExpressions.map(_.asInstanceOf[Attribute])

    // every output: a grouping attribute, or THE one count-distinct alias
    var distinctAlias: Option[(Alias, Expression)] = None
    val ok = a.aggregateExpressions.forall {
      case attr: Attribute if groupAttrs.exists(_.semanticEquals(attr)) => true
      case al @ Alias(AggregateExpression(Count(Seq(c)), Complete, true, None, _), _)
          if isIntegral(c) && c.deterministic && distinctAlias.isEmpty =>
        distinctAlias = Some((al, c)); true
      case _ => false
    }
    if (!ok || distinctAlias.isEmpty) return None
    val (countAlias, c) = distinctAlias.get

    val cLong = if (c.dataType == LongType) c else Cast(c, LongType)
    val wordAlias = Alias(floorDiv(cLong, 62L), "graft_bm_word")()
    val projected = Project(a.child.output :+ wordAlias, a.child)

    val bit = ShiftLeft(Literal(1L), Cast(Pmod(cLong, Literal(62L)), IntegerType))
    val bitsAlias = Alias(
      AggregateExpression(BitOrAgg(bit), Complete, isDistinct = false),
      "graft_bm_bits")()
    val agg1 = Aggregate(
      groupAttrs :+ wordAlias.toAttribute,
      (groupAttrs :+ bitsAlias).asInstanceOf[Seq[NamedExpression]],
      projected)

    val popSum = AggregateExpression(
      Sum(BitwiseCount(bitsAlias.toAttribute)), Complete, isDistinct = false)
    // keep the ORIGINAL count attribute's exprId so parent plans resolve
    val countOut = Alias(Coalesce(Seq(popSum, Literal(0L))), countAlias.name)(
      exprId = countAlias.exprId)
    val finalExprs = a.aggregateExpressions.map {
      case attr: Attribute => attr
      case _ => countOut
    }
    Some(Aggregate(groupAttrs, finalExprs, agg1))
  }
}
