package graft

import graft.functions.{FloatDot, FreqItems, HilbertKey, NGrams, TDigest, TopK}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library registration via the public extension point: build sessions with
  * `spark.sql.extensions=graft.GraftExtensions` and every graft-native
  * function ([[FloatDot]], [[TopK]], [[HilbertKey]], [[TDigest]], the
  * [[NGrams]] generator) resolves in SQL/`expr` with no imperative
  * setup — the deployment story for a cluster where the session is built by
  * the platform, not the query author. Query builders still call each
  * function's `register` as an idempotent fallback so they work
  * against plain sessions too.
  *
  * Also injects the two conf-gated optimizer rules (default off — see
  * their scaladoc): [[graft.plans.IntervalJoinBucketing]] (bounded-
  * interval-join bucketing) and [[graft.plans.DistinctToBitmap]]
  * (COUNT(DISTINCT integral) → word-bitmap aggregation).
  *
  * And the merge as-of join custom operator ([[graft.plans.AsOfJoinPlan]] —
  * see ops/plans/AsOfJoin.scala): its hint-marker analysis rule at both the
  * hint-resolution and resolution extension points (DataFrame vs SQL paths)
  * plus the planner strategy producing [[graft.plans.AsOfJoinExec]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "graft_float_dot"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_float_dot takes exactly 2 arguments")
        FloatDot(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopK].getName, "graft_topk"),
      TopK.builder))
    e.injectFunction((
      FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertKey].getName, "graft_hilbert"),
      HilbertKey.builder))
    e.injectFunction((
      FunctionIdentifier("graft_tdigest"),
      new ExpressionInfo(classOf[TDigest].getName, "graft_tdigest"),
      TDigest.builder))
    e.injectFunction((
      FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[FreqItems].getName, "graft_freq_items"),
      FreqItems.builder))
    e.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "graft_ngrams"),
      NGrams.builder))
    e.injectOptimizerRule(graft.plans.IntervalJoinBucketing)
    e.injectOptimizerRule(graft.plans.DistinctToBitmap)
    e.injectHintResolutionRule(graft.plans.AsOfJoinHintRule)
    e.injectResolutionRule(graft.plans.AsOfJoinHintRule)
    e.injectPlannerStrategy(graft.plans.AsOfJoinStrategy)
  }
}
