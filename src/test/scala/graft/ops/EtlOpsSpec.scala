package graft.ops

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Semantics checks for the ETL-lifecycle operators (EtlOps). */
class EtlOpsSpec extends SparkSpec {

  test("q_geo_cell: cell-bucketed join equals the brute-force quadratic join") {
    // sf0.001's 150 points are too sparse for any pair to fall within the
    // radius; the 1500-point tier yields ~100 pairs and the cross join is
    // still tiny (2.25M candidate rows).
    val sf = "/root/testdata/sf0.01"
    val cellJoin = SparkEntry.queries("q_geo_cell")(spark, sf)
      .select("a_key", "b_key", "dsq").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = Tables.customer(spark, sf).select(
      col("c_custkey").as("key"),
      (conv(substring(md5(concat(lit("x"), col("c_custkey").cast("string"))), 1, 6), 16, 10)
        .cast("long") % 10000).as("xi"),
      (conv(substring(md5(concat(lit("y"), col("c_custkey").cast("string"))), 1, 6), 16, 10)
        .cast("long") % 10000).as("yi"))
    val a = pts.select(col("key").as("a_key"), col("xi").as("ax"), col("yi").as("ay"))
    val b = pts.select(col("key").as("b_key"), col("xi").as("bx"), col("yi").as("by_"))
    val dsq = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
              (col("ay") - col("by_")) * (col("ay") - col("by_"))
    val brute = a.crossJoin(b).where(col("a_key") < col("b_key") && dsq < 2500)
      .select(col("a_key"), col("b_key"), dsq.as("dsq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cellJoin == brute, "cell bucketing must lose/invent no pairs")
    assert(brute.nonEmpty, "fixture should produce at least one close pair")
  }

  test("q_scd2: versions partition the event log; exactly one current row per user") {
    val scd = SparkEntry.queries("q_scd2")(spark, sf).cache()
    val nEvents = Tables.events(spark, sf).count()
    assert(scd.agg(sum("n_events")).head.getLong(0) == nEvents,
      "every event must land in exactly one version interval")
    val perUser = scd.groupBy("user_id")
      .agg(sum(col("is_current")).as("cur"), count(lit(1)).as("nv"))
    assert(perUser.where(col("cur") =!= 1).isEmpty, "exactly one open interval per user")
    // intervals chain: valid_to of version k == valid_from of version k+1
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("version")
    val chained = scd.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
    assert(chained.where(col("valid_to") =!= col("next_from")).isEmpty,
      "intervals must tile the timeline with no gaps")
    assert(chained.where(col("event_type") === col("next_type")).isEmpty,
      "adjacent versions must differ (runs were collapsed)")
    scd.unpersist()
  }

  test("q_winsorize: thresholds ordered, ~5% clipped per side, sum within bounds") {
    val rows = SparkEntry.queries("q_winsorize")(spark, sf).collect()
    val counts = Tables.orders(spark, sf).groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val (p, lo, hi) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (nLo, nHi, clip) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val n = counts(p)
      assert(lo <= hi, s"$p: lo > hi")
      assert(nLo <= n * 6 / 100 && nHi <= n * 6 / 100, s"$p: clipped more than ~5%")
      assert(clip >= n * lo && clip <= n * hi, s"$p: clipped sum outside [n*lo, n*hi]")
    }
  }

  test("q_cdc_merge: delete/upsert/insert/keep semantics against the log") {
    val merged = SparkEntry.queries("q_cdc_merge")(spark, sf).cache()
    val events = Tables.events(spark, sf).cache()
    val baseKeys = Tables.customer(spark, sf)
      .where(col("c_custkey") % 4 =!= 0).select(col("c_custkey"))
      .collect().map(_.getLong(0)).toSet
    // last op per user, recomputed independently
    val lastOps = events.orderBy(col("ts").desc, col("event_id").desc)
      .select("user_id", "event_type").collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.head.getString(1) }
    val out = merged.select("key", "src").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((u, op) <- lastOps) {
      if (op == "error") assert(!out.contains(u), s"user $u deleted by last error op")
      else if (baseKeys(u)) assert(out(u) == "updated")
      else assert(out(u) == "inserted")
    }
    for (k <- baseKeys -- lastOps.keySet) assert(out(k) == "kept")
    merged.unpersist(); events.unpersist()
  }

  test("q_incr_agg: incremental refresh equals the from-scratch aggregate") {
    val incr = SparkEntry.queries("q_incr_agg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val full = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Det.moneySum(col("o_totalprice")).as("c"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(incr.toSeq == full.toSeq)
  }

  test("q_dq_rules: referential rule matches an independent anti-join count") {
    val rules = SparkEntry.queries("q_dq_rules")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orphans = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count()
    val nLi = Tables.lineitem(spark, sf).count()
    val nOrd = Tables.orders(spark, sf).count()
    assert(rules("lineitem.orderkey_in_orders") == (nLi, orphans))
    assert(rules("lineitem.qty_in_1_50")._1 == nLi)
    assert(rules("orders.totalprice_positive")._1 == nOrd)
    assert(rules.size == 5)
  }

  test("q_profile: row count and distinct counts match the table") {
    val prof = SparkEntry.queries("q_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = Tables.lineitem(spark, sf).count()
    assert(prof.values.forall(_.getLong(1) == n))
    assert(prof("l_returnflag").getLong(3) == 3) // A/N/R
    assert(prof.values.forall(_.getLong(2) == 0L), "no nulls in lineitem")
  }

  test("q_anomaly_mad: value-at-rank median/MAD match a driver brute force") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "cast(round(value * 100) as long) as cents", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).map { case (et, rows) =>
      val sorted = rows.sortBy(x => (x._2, x._3)).map(_._2)
      val med = sorted(((sorted.length + 1) / 2) - 1)
      val devs = rows.map(x => ((x._2 - med).abs, x._3))
      val mad = devs.sortBy(identity).map(_._1).apply(((devs.length + 1) / 2) - 1)
      et -> (med, mad, rows.length.toLong, devs.count(_._1 > 3 * mad).toLong)
    }
    val got = SparkEntry.queries("q_anomaly_mad")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want, s"got=$got want=$want")
    assert(got.values.exists(_._4 > 0), "expect some 3-MAD outliers at sf0.001")
  }
}
