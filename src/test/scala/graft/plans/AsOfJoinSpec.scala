package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The graft-native merge as-of join (plans/AsOfJoin.scala): plan-shape,
  * equivalence to the window formulation, partition invariance, null
  * semantics, a seeded brute-force reference, and the loud-failure contract
  * of the hint marker. */
class AsOfJoinSpec extends SparkSpec {

  test("AsOfJoinExec is the executed operator and the plan has no window/union scaffolding") {
    val df = SparkEntry.queries("q_join_asof_native")(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), s"custom exec node missing:\n${phys.take(800)}")
    assert(!phys.contains("Window"), "native plan must not fall back to the window formulation")
    assert(!phys.contains("Union"), "native plan must not union the two sides")
  }

  test("native merge ≡ window formulation on real data") {
    val native = SparkEntry.queries("q_join_asof_native")(spark, sf).collect().map(_.toSeq).toSeq
    val window = SparkEntry.queries("q_join_asof")(spark, sf).collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native == window)
  }

  test("result is invariant to shuffle partition count") {
    def run(): Seq[Seq[Any]] =
      SparkEntry.queries("q_join_asof_native")(spark, sf).collect().map(_.toSeq).toSeq
    val base = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      assert(run() == base, "partitions=1 changed the result")
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      assert(run() == base, "partitions=17 changed the result")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("t", LongType),
    StructField("v", StringType)))

  private def frame(rows: Seq[(java.lang.Long, java.lang.Long, String)]) = {
    val data = rows.map { case (k, t, v) => Row(k, t, v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 3), schema)
  }

  private def asof(l: Seq[(java.lang.Long, java.lang.Long, String)],
                   r: Seq[(java.lang.Long, java.lang.Long, String)]) =
    AsOf.joinBackward(
      frame(l).select(col("k").as("lk"), col("t").as("lt"), col("v").as("lv")),
      frame(r).select(col("k").as("rk"), col("t").as("rt"), col("v").as("rv")),
      Seq((col("lk"), col("rk"))), col("lt"), col("rt"))
      .select(col("lv"), col("rv")).collect()
      .map(x => (x.getString(0), if (x.isNullAt(1)) null else x.getString(1))).toSet

  test("null keys and null timestamps never match; unmatched keys null-pad") {
    val res = asof(
      l = Seq((1L: java.lang.Long, 10L: java.lang.Long, "a"),
              (1L, 5L, "b"), (2L, 10L, "c"), (null, 10L, "d"), (3L, null, "e")),
      r = Seq((1L: java.lang.Long, 7L: java.lang.Long, "r7"),
              (1L, 10L, "r10"), (1L, 11L, "r11"),
              (null, 1L, "rnullk"), (3L, 1L, "r3"), (9L, 1L, "r9")))
    assert(res == Set(
      ("a", "r10"),   // inclusive bound: rt == lt matches
      ("b", null),    // earliest right for k=1 is 7 > 5
      ("c", null),    // k=2 has no right rows
      ("d", null),    // null left key never matches
      ("e", null)))   // null left ts never matches
  }

  test("seeded random data matches a driver-side brute force") {
    val rnd = new scala.util.Random(42)
    def gen(n: Int, tag: String) = (0 until n).map { i =>
      ((rnd.nextInt(8).toLong: java.lang.Long),
       (rnd.nextInt(50).toLong: java.lang.Long), s"$tag$i")
    }
    val l = gen(200, "L")
    val r = gen(150, "R")
    // Brute force: per left row, the right row with max rt <= lt; ties on rt
    // within a key cannot happen to disagree on rv only if unique — make the
    // pick total by (rt, rv) max, mirroring sorted-order last-wins.
    val expected = l.map { case (k, t, v) =>
      val cands = r.filter(x => x._1 == k && x._2 <= t)
      val pick = if (cands.isEmpty) null
        else cands.maxBy(x => (x._2.longValue, x._3))._3
      (v, pick)
    }.toSet
    // The merge keeps the LAST right row in (key, ts, tie) sorted order; with
    // duplicate (k, rt) pairs the operator's pick among ties is the last in
    // sort order — sort order on the payload is not declared, so dedup ties
    // first for a total contract (mirrors q_join_asof's D3 pre-merge).
    val rDedup = r.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
    val expectedDedup = l.map { case (k, t, v) =>
      val cands = rDedup.filter(x => x._1 == k && x._2 <= t)
      val pick = if (cands.isEmpty) null
        else cands.maxBy(x => (x._2.longValue, x._3))._3
      (v, pick)
    }.toSet
    assert(expected.map(_._1) == expectedDedup.map(_._1))
    assert(asof(l.map(x => (x._1, x._2, x._3)), rDedup) == expectedDedup)
  }

  test("the hint fails loudly on a non-as-of condition instead of degrading") {
    val lf = frame(Seq((1L: java.lang.Long, 1L: java.lang.Long, "a")))
      .select(col("k").as("lk"), col("t").as("lt"))
    val rf = frame(Seq((1L: java.lang.Long, 1L: java.lang.Long, "b")))
      .select(col("k").as("rk"), col("t").as("rt"))
    // Dataset analysis is eager, so the rule rejects at .hint() itself.
    val e = intercept[Exception] {
      lf.join(rf, col("lk") === col("rk") && col("rt") < col("lt"))
        .hint("graft_asof") // strict bound, not the as-of shape
        .collect()
    }
    assert(e.getMessage.contains("graft_asof"), s"wrong failure: ${e.getMessage}")
  }

  test("tolerance: native exec ≡ interval-join formulation on real data") {
    val native = SparkEntry.queries("q_join_asof_tol_native")(spark, sf)
    val phys = native.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), "tolerance form must still use the merge exec")
    assert(!phys.contains("Window"))
    val interval = SparkEntry.queries("q_join_asof_tol")(spark, sf)
    assert(native.collect().map(_.toSeq).toSeq == interval.collect().map(_.toSeq).toSeq)
  }

  test("q_scd2_lookup runs through the exec (its oracle can't see which plan ran)") {
    val phys = SparkEntry.queries("q_scd2_lookup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), "SCD2 lookup must use the merge exec")
  }

  test("tolerance boundary is strict: a candidate exactly tol old does not match") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val lf = Seq((1L, ts(120)), (2L, ts(120))).toDF("lk", "lt")
    // key 1: click exactly 60 min old (excluded); key 2: 59 min old (kept)
    val rf = Seq((1L, ts(60), 10L), (2L, ts(61), 20L)).toDF("rk", "rt", "rid")
    val out = AsOf.joinBackwardTol(lf, rf, Seq((col("lk"), col("rk"))),
        col("lt"), col("rt"), expr("INTERVAL 1 HOUR"))
      .select(col("lk"), col("rid")).orderBy(col("lk")).collect()
    assert(out(0).isNullAt(1), "exactly-tolerance-old candidate must be excluded")
    assert(out(1).getLong(1) == 20L)
  }
}
