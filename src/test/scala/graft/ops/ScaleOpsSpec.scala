package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("q_skew_salted equals the direct (unsalted) aggregation exactly") {
    val salted = ScaleOps.queries("q_skew_salted")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(Det.moneySum(col("l_extendedprice")).as("sum_cents"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("q_join_bucketed: the bucketed join plans WITHOUT a shuffle exchange") {
    // disable broadcast so the planner must co-locate — at test SF the dim
    // side is tiny and would otherwise (correctly) broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = ScaleOps.queries("q_join_bucketed")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
      // bucket-aligned inputs: no hashpartitioning exchange below the join
      val below = plan.substring(joinIdx)
      assert(!below.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$below")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
