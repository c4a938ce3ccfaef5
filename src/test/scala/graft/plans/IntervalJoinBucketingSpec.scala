package graft.plans

import graft.{SparkEntry, SparkSpec}

/** The conf-gated interval-join bucketing rewrite (GraftExtensions →
  * IntervalJoinBucketing): plan-shape and row-identity contracts. */
class IntervalJoinBucketingSpec extends SparkSpec {

  private val Flag = "spark.graft.rewrite.intervalJoin"

  private def withFlag[T](v: String)(body: => T): T = {
    val prev = spark.conf.getOption(Flag)
    spark.conf.set(Flag, v)
    try body finally prev match {
      case Some(p) => spark.conf.set(Flag, p)
      case None => spark.conf.unset(Flag)
    }
  }

  test("disabled by default: the naive plan keeps no bucket column") {
    val p = SparkEntry.queries("q_join_range")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("graft_bkt"), "rule must be conf-gated OFF by default")
  }

  test("enabled: rewrite fires once, joins on (key, bucket), output schema unchanged") {
    withFlag("true") {
      val df = SparkEntry.queries("q_join_range")(spark, sf)
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("graft_bkt"), s"rewrite did not fire:\n${p.take(600)}")
      // idempotence inside the fixed-point batch: exactly one Generate
      assert("Generate explode".r.findAllIn(p).size == 1,
        s"rewrite must apply exactly once:\n${p.take(600)}")
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("graft_bkt"), "bucket key must reach the physical join")
      assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoop"))
      assert(df.columns.toSeq == Seq("id_a", "id_b"), "projection must restore the original output")
    }
  }

  test("rewritten join is row-identical to the naive join") {
    val naive = SparkEntry.queries("q_join_range")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val auto = SparkEntry.queries("q_join_range_auto")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(auto == naive, "bucketing rewrite changed the result")
    assert(naive.nonEmpty)
  }

  test("non-matching joins are untouched under the flag") {
    withFlag("true") {
      // equi-only join: no interval bounds — must not be rewritten
      val p = SparkEntry.queries("q_join_inner")(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("graft_bkt"))
      // as-of uses a one-sided bound — must not be rewritten
      val p2 = SparkEntry.queries("q_join_asof")(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(!p2.contains("graft_bkt"))
    }
  }
}
