package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AggWindowSpec extends SparkSpec {

  test("q_agg_approx_distinct within 5% of exact (SURVEY §5.2)") {
    val approx = Aggregations.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1, 0.05 * n), s"$k: ${approx(k)} vs $n")
    }
  }

  test("q_win_running equals brute-force per-customer prefix sums") {
    val rows = Windows.queries("q_win_running")(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("string"),
              round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      val sorted = os.toSeq.sortBy(o => (o._3, o._2)) // ISO strings sort chronologically
      sorted.scanLeft(0L)(_ + _._4).tail.zip(sorted).map { case (run, o) => (ck, o._2) -> run }
    }.toMap
    rows.foreach { r =>
      assert(r.getLong(2) == expected((r.getLong(0), r.getLong(1))))
    }
  }

  test("q_topk_group returns at most 3 rows per customer, ranked") {
    val df = Windows.queries("q_topk_group")(spark, sf)
    val bad = df.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"), max(col("rn")).as("mx"))
      .where(col("n") > 3 || col("mx") > 3).count()
    assert(bad == 0)
  }

  test("q_agg_hll_sketch: direct and two-level-merged estimates both within 5% of exact") {
    val rows = Aggregations.queries("q_agg_hll_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: merged estimate outside 5% of exact ${r.getLong(1)}")
      assert(r.getBoolean(3), s"${r.getString(0)}: direct estimate outside 5% of exact ${r.getLong(1)}")
    }
  }

  test("q_agg_regr: integer-moment slope matches brute-force OLS; builtin regr_slope agrees") {
    val rows = Aggregations.queries("q_agg_regr")(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
              round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val pts = li.filter(_._1 == r.getString(0)).map(p => (p._2.toDouble, p._3.toDouble))
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getLong(2) - math.round(1e6 * slope)) <= 1,
        s"${r.getString(0)}: slope_e6 ${r.getLong(2)} vs brute ${math.round(1e6 * slope)}")
      assert(r.getBoolean(4), s"${r.getString(0)}: builtin regr_slope drifted from exact moments")
    }
  }

  test("q_agg_bool agrees with direct predicate counts") {
    val rows = Aggregations.queries("q_agg_bool")(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    rows.foreach { r =>
      val grp = orders.filter(_._1 == r.getString(0))
      assert(r.getBoolean(1) == grp.forall(_._2 > 1000))
      assert(r.getBoolean(2) == grp.exists(_._3 == "F"))
      assert(r.getLong(4) == grp.count(_._2 > 200000))
    }
  }

  test("q_corr_matrix matches brute-force Pearson per (flag, pair); bounds hold") {
    val rows = Aggregations.queries("q_corr_matrix")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
              expr("cast(round(l_extendedprice * 100) as bigint) div 100"),
              round(col("l_discount") * 10000).cast("long"),
              round(col("l_tax") * 10000).cast("long"))
      .collect().map(r => (r.getString(0), Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val pairIdx = Seq("qty_price" -> (0, 1), "qty_disc" -> (0, 2), "qty_tax" -> (0, 3),
                      "price_disc" -> (1, 2), "price_tax" -> (1, 3), "disc_tax" -> (2, 3))
    for (flag <- li.map(_._1).distinct; (pair, (i, j)) <- pairIdx) {
      val pts = li.filter(_._1 == flag).map(_._2)
      val n = pts.length.toDouble
      def s(k: Int) = pts.map(_(k).toDouble).sum
      def ss(a: Int, b: Int) = pts.map(p => p(a).toDouble * p(b).toDouble).sum
      val num = n * ss(i, j) - s(i) * s(j)
      val den = math.sqrt((n * ss(i, i) - s(i) * s(i)) * (n * ss(j, j) - s(j) * s(j)))
      val want = math.round(1e6 * num / den)
      val (gotN, gotCorr) = rows((flag, pair))
      assert(gotN == pts.length)
      assert(math.abs(gotCorr - want) <= 1, s"$flag/$pair: $gotCorr vs $want")
      assert(math.abs(gotCorr) <= 1000000L, s"$flag/$pair out of [-1, 1]")
    }
    assert(rows.size == li.map(_._1).distinct.size * 6)
  }

  test("q_win_rolling_median equals a brute-force trailing-5 exact median") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = orders.groupBy(_._1).flatMap { case (ck, os) =>
      val sorted = os.sortBy(_._2)
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 4), i + 1).map(_._3).sorted
        val med2 = if (frame.length % 2 == 1) frame(frame.length / 2) * 2
                   else frame(frame.length / 2 - 1) + frame(frame.length / 2)
        (ck, sorted(i)._2) -> med2
      }
    }
    val got = Windows.queries("q_win_rolling_median")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == want, "rolling median mismatch")
    assert(got.nonEmpty)
  }

  test("q_gini equals brute-force Gini per nation; bounds hold") {
    val spend = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cn = Tables.customer(spark, sf).select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val natName = Tables.nation(spark, sf).select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val want = cn.filter(c => spend.contains(c._1))
      .groupBy(c => natName(c._2)).map { case (nn, cs) =>
        val xs = cs.map(c => (spend(c._1), c._1)).sortBy(identity).map(_._1)
        val n = xs.length
        val six = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
        val g = 2.0 * six / (n.toDouble * xs.sum) - (n + 1.0) / n
        nn -> (n.toLong, math.round(1e6 * g))
      }
    val got = Aggregations.queries("q_gini")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"got=$got want=$want")
    got.values.foreach { case (_, g) => assert(g >= 0 && g <= 1000000L) }
  }

  test("custom GeoMean Aggregator merges correctly across partitions") {
    import graft.functions.GeoMean
    val geo = udaf(GeoMean)
    val vals = Seq(1.0, 2.0, 4.0, 8.0)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("v").repartition(4)
    val got = df.agg(geo(col("v"))).collect()(0).getDouble(0)
    val want = math.exp(vals.map(math.log).sum / vals.size) // = 2.828...
    assert(math.abs(got - want) < 1e-12)
  }

  test("q_agg_bitmap: popcount sum is the exact distinct count in every group") {
    val rows = graft.SparkEntry.queries("q_agg_bitmap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"bitmap=${r.getLong(1)} exact=${r.getLong(2)}")
      assert(r.getBoolean(3))
    }
  }
}
