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

  test("q_cache_reuse: aggregations are served from the in-memory relation") {
    val v = "li_cache_spec"
    Tables.lineitem(spark, sf).where(col("l_quantity") > 25)
      .createOrReplaceTempView(v)
    spark.sql(s"CACHE TABLE $v")
    try {
      val agg = spark.table(v).groupBy(col("l_returnflag")).count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryRelation"),
        s"cached view not served from the columnar cache:\n$plan")
      // and the cache is semantics-neutral
      val direct = Tables.lineitem(spark, sf).where(col("l_quantity") > 25)
        .groupBy(col("l_returnflag")).count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toSet == direct)
    } finally spark.sql(s"UNCACHE TABLE IF EXISTS $v")
  }

  test("q_agg_countmin: exact counts correct and CMS contract flags hold") {
    val rows = ScaleOps.queries("q_agg_countmin")(spark, sf).collect()
    assert(rows.length == 10)
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("l_suppkey"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact.getOrElse(r.getLong(0), 0L))
      assert(r.getBoolean(2), s"CMS underestimated key ${r.getLong(0)}")
      assert(r.getBoolean(3), s"CMS overestimate beyond εN for key ${r.getLong(0)}")
    }
  }

  test("q_filter_bloom: no false negatives, bounded false positives") {
    val r = ScaleOps.queries("q_filter_bloom")(spark, sf).collect()(0)
    assert(r.getBoolean(1), "bloom filter dropped a customer that has orders")
    assert(r.getBoolean(3), "false-positive rate above bound")
    assert(r.getLong(0) > 0 && r.getLong(2) > 0)
  }

  test("q_zorder_key: the Morton key de-interleaves back to both dimensions") {
    val rows = EtlOps.queries("q_zorder_key")(spark, sf).collect()
    val src = graft.Tables.part(spark, sf)
      .select(org.apache.spark.sql.functions.col("p_partkey"),
              org.apache.spark.sql.functions.col("p_size"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val z = r.getLong(1)
      var x = 0L; var y = 0L
      for (k <- 0 until 16) {
        x |= ((z >> (2 * k)) & 1) << k
        y |= ((z >> (2 * k + 1)) & 1) << k
      }
      assert(x == src(r.getLong(0)).toLong, s"x lane of ${r.getLong(0)}")
      assert(y == r.getLong(0) % 65536, s"y lane of ${r.getLong(0)}")
      assert(r.getLong(2) == ((z >> 30) & 3))
    }
  }
}
