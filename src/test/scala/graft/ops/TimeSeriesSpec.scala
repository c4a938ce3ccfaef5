package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  test("q_join_asof matches brute-force latest-click-at-or-before") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicks = events.filter(_._4 == "click")
    val purchases = events.filter(_._4 == "purchase")
    val want = purchases.map { case (pid, u, pus, _) =>
      val eligible = clicks.filter(c => c._2 == u && c._3 <= pus)
      val best = if (eligible.isEmpty) None
      else {
        val mx = eligible.map(_._3).max // latest ts; tie → max event_id
        Some(eligible.filter(_._3 == mx).map(_._1).max)
      }
      pid -> best
    }.toMap
    val got = TimeSeries.queries("q_join_asof")(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want)
    assert(want.values.exists(_.isEmpty) || want.nonEmpty) // sanity: non-trivial
  }

  test("q_session_batch: sessions partition events; intra-gap <= 30min holds") {
    val sess = TimeSeries.queries("q_session_batch")(spark, sf)
    val totalEvents = sess.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(totalEvents == Tables.events(spark, sf).count())
    // every session length is consistent: singleton sessions have len 0
    assert(sess.where(col("n_events") === 1 && col("len_us") =!= 0).count() == 0)
    assert(sess.where(col("len_us") < 0).count() == 0)
  }

  test("q_tumble_batch counts add up to total events") {
    val n = TimeSeries.queries("q_tumble_batch")(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }

  test("q_slide_batch: every event lands in exactly 4 sliding windows") {
    val n = TimeSeries.queries("q_slide_batch")(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(n == 4 * Tables.events(spark, sf).count())
  }

  test("q_funnel: stage counts are monotone and match a brute-force walk") {
    val r = TimeSeries.queries("q_funnel")(spark, sf).collect()(0)
    val (nView, nClick, nPurchase) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nView >= nClick && nClick >= nPurchase && nView > 0)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2).getTime))
    val byUser = ev.groupBy(_._1)
    def stage(prev: Map[Long, Long], tpe: String): Map[Long, Long] =
      prev.flatMap { case (u, t) =>
        byUser(u).filter(e => e._2 == tpe && e._3 > t)
          .map(_._3).minOption.map(u -> _)
      }
    val t0 = byUser.view.mapValues(_.filter(_._2 == "view").map(_._3).minOption)
      .collect { case (u, Some(t)) => u -> t }.toMap
    val t1 = stage(t0, "click")
    val t2 = stage(t1, "purchase")
    assert(nView == t0.size && nClick == t1.size && nPurchase == t2.size)
  }

  test("q_time_rollup_multi: every grain independently totals the event count") {
    val rows = TimeSeries.queries("q_time_rollup_multi")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val total = Tables.events(spark, sf).count()
    val byGrain = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byGrain.keySet == Set("hour", "day", "week"))
    byGrain.foreach { case (g, n) => assert(n == total, s"grain $g: $n != $total") }
  }

  test("q_rfm: quartiles balanced and segments cover every customer") {
    val rows = TimeSeries.queries("q_rfm")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._4).sum == nCust, "segments must partition the customer base")
    for (dim <- 0 to 2) {
      val byQ = rows.groupBy(r => dim match {
        case 0 => r._1; case 1 => r._2; case 2 => r._3
      }).view.mapValues(_.map(_._4).sum)
      assert(byQ.keySet == Set(1, 2, 3, 4))
      assert(byQ.values.max - byQ.values.min <= 1, s"dim $dim quartiles unbalanced: $byQ")
    }
  }

  test("q_uniq_paths: trigram counts equal a brute-force per-user walk") {
    val rows = TimeSeries.queries("q_uniq_paths")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect().map { r =>
        val us = r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000
        (r.getLong(0), r.getString(1), us, r.getLong(3))
      }
    val brute = ev.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._3, e._4)).map(_._2)
      seq.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (p, n) => assert(brute(p) == n, s"path $p") }
    assert(rows.values.min >= brute.values.toSeq.sorted.reverse.take(10).min)
  }

  test("q_win_gapfill: spine is dense, observed hours untouched, interpolation bounded") {
    val rows = TimeSeries.queries("q_win_gapfill")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    rows.groupBy(_._1).foreach { case (_, hs) =>
      val hours = hs.map(_._2).sorted
      assert(hours.zip(hours.tail).forall(p => p._2 == p._1 + 1), "hour spine must be gapless")
      assert(!hs.minBy(_._2)._4 && !hs.maxBy(_._2)._4, "series endpoints are observed, not filled")
    }
    val observed = Tables.events(spark, sf)
      .groupBy(col("event_type"),
               expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .agg(expr("sum(cast(round(value * 100) as bigint))").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (t, h, v, interp) =>
      if (!interp) assert(v == observed((t, h)))
      else assert(!observed.contains((t, h)))
    }
  }

  test("q_asof_nearest matches a brute-force nearest-click scan") {
    val rows = TimeSeries.queries("q_asof_nearest")(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                           r.getTimestamp(3).getTime * 1000 +
                             r.getTimestamp(3).getNanos / 1000 % 1000))
    val clicksByUser = ev.filter(_._2 == "click").groupBy(_._1)
    val purchases = ev.filter(_._2 == "purchase")
      .map(p => p._3 -> (p._1, p._4)).toMap
    rows.foreach { r =>
      val (user, tp) = purchases(r.getLong(0))
      clicksByUser.get(user) match {
        case None => assert(r.isNullAt(1) && r.isNullAt(3))
        case Some(cs) =>
          val best = cs.minBy { c =>
            val d = math.abs(c._4 - tp)
            val back = c._4 <= tp
            (d, if (back) 0 else 1, if (back) -c._3 else c._3)
          }
          assert(r.getLong(1) == best._3,
            s"purchase ${r.getLong(0)}: got ${r.getLong(1)}, want ${best._3}")
          assert(r.getLong(2) == math.abs(best._4 - tp))
      }
    }
  }

  test("q_cohort_retention: offset-0 cell is the cohort size and bounds later offsets") {
    val rows = TimeSeries.queries("q_cohort_retention")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val base = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(rows.map(_._3).sum >= Tables.events(spark, sf)
      .select(col("user_id")).distinct().count())
    rows.foreach { case (cw, k, n) =>
      assert(base.contains(cw), s"cohort $cw missing its offset-0 cell")
      assert(n <= base(cw), s"cohort $cw offset $k: $n > cohort size ${base(cw)}")
    }
    assert(base.values.sum == Tables.events(spark, sf)
      .select(col("user_id")).distinct().count(),
      "every user belongs to exactly one cohort")
  }

  test("q_time_weighted equals a driver-side exact segment walk") {
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val want = byUser.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).toList
      val segs = ordered.sliding(2).collect { case List(a, b) =>
        val durMs = (b._2 - a._2) / 1000
        (math.round(a._4 * 100), durMs)
      }.toSeq
      val dsum = segs.map(_._2).sum
      if (segs.isEmpty || dsum <= 0) None
      else Some(u -> (segs.size.toLong, Math.floorDiv(segs.map(s => s._1 * s._2).sum, dsum)))
    }
    val got = TimeSeries.queries("q_time_weighted")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q_ewma equals a driver-side exact 8-tap integer smoother") {
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val want = byUser.map { case (u, rows) =>
      val latest = rows.sortBy(r => (-r._2, -r._3)).take(8)
      val wsum = latest.zipWithIndex.map { case (r, i) =>
        math.round(r._4 * 100) * (1L << (7 - i)) }.sum
      val den = latest.indices.map(i => 1L << (7 - i)).sum
      u -> (latest.size.toLong, Math.floorDiv(wsum, den))
    }
    val got = TimeSeries.queries("q_ewma")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q_abtest recomputes from raw counts; arms cover all events") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0) % 2, r.getString(1)))
    def cnt(arm: Long) = ev.count(_._1 == arm).toLong
    def pur(arm: Long) = ev.count(e => e._1 == arm && e._2 == "purchase").toLong
    val (n0, x0, n1, x1) = (cnt(0), pur(0), cnt(1), pur(1))
    val p = (x0 + x1).toDouble / (n0 + n1)
    val z = (x0.toDouble / n0 - x1.toDouble / n1) /
      math.sqrt(p * (1 - p) * (1.0 / n0 + 1.0 / n1))
    val r = TimeSeries.queries("q_abtest")(spark, sf).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((n0, x0, n1, x1)))
    assert(n0 + n1 == ev.length)
    assert(math.abs(r.getLong(4) - math.round(1e6 * z)) <= 1)
  }

  test("q_seasonality: per-type counts sum to totals; deviation formula exact") {
    val rows = TimeSeries.queries("q_seasonality")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byType = rows.groupBy(_._1)
    val evCnt = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (et, hs) =>
      val tot = hs.map(_._3).sum
      assert(tot == evCnt(et), s"$et hour counts must sum to the type total")
      hs.foreach { case (_, _, n, dev) =>
        assert(dev == n * 24 * 10000 / tot - 10000)
      }
      assert(hs.map(_._2).distinct.length == hs.length, "one row per hour")
    }
  }

  test("q_psi_drift equals a driver-side PSI walk over the same bins") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val (mn, mx) = (ev.map(_._3).min, ev.map(_._3).max)
    val want = ev.groupBy(_._1).map { case (et, es) =>
      def bin(v: Double) = math.min(math.floor(v / 10).toInt, 10) + 1
      val a = es.filter(e => e._3 * 2 < mn + mx)
      val b = es.filter(e => e._3 * 2 >= mn + mx)
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val psi = (1 to 11).map { k =>
        val ca = a.count(e => bin(e._2) == k).toLong
        val cb = b.count(e => bin(e._2) == k).toLong
        val pa = (ca + 1).toDouble / (na + 11)
        val pb = (cb + 1).toDouble / (nb + 11)
        math.round(1e8 * (pa - pb) * math.log(pa / pb))
      }.sum
      et -> (na, nb, psi)
    }
    val got = TimeSeries.queries("q_psi_drift")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"got=$got want=$want")
  }

  test("q_join_interval_overlap: bucketed candidates equal the brute-force overlap join") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val v = ev.filter(_._3 == "view").map(x => (x._1, x._2, x._4, x._4 + 300000000L))
    val p = ev.filter(_._3 == "purchase").map(x => (x._1, x._2, x._4 - 600000000L, x._4))
    val want = (for {
      (iv, uv, sv, evd) <- v
      (ip, up, sp, ep) <- p
      if uv == up && sv <= ep && sp <= evd
    } yield (iv, ip)).sorted.toSeq
    val got = graft.SparkEntry.queries("q_join_interval_overlap")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"got=${got.size} want=${want.size}")
  }

  test("q_conv_attr: credit is conserved exactly and channels are bounded") {
    val rows = graft.SparkEntry.queries("q_conv_attr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalCents = Tables.events(spark, sf)
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("sum(cast(round(value * 100) as long))").collect()(0).getLong(0)
    assert(rows.map(_._3).sum == totalCents,
      "attribution must conserve total purchase value to the cent")
    assert(rows.map(_._1).forall(c => c == -1L || (c >= 0 && c < 5)))
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("q_join_asof_fwd: negated-key merge equals brute-force next-click") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // pre-merged clicks: per (user, ts) keep max event_id
    val cl = ev.filter(_._3 == "click").groupBy(x => (x._2, x._4))
      .map { case ((u, t), rs) => (u, t, rs.map(_._1).max) }.toSeq
    val want = ev.filter(_._3 == "purchase").map { case (pid, u, _, pts) =>
      val nxt = cl.filter(c => c._1 == u && c._2 >= pts)
      pid -> (if (nxt.isEmpty) null else (nxt.minBy(c => (c._2, -c._3))._3: java.lang.Long))
    }.sortBy(_._1).toSeq
    val got = graft.SparkEntry.queries("q_join_asof_fwd")(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else (r.getLong(1): java.lang.Long))).toSeq
    assert(got == want)
    assert(got.exists(_._2 != null))
  }

  test("q_window_funnel: greedy in-order depth matches a driver walk") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val H = 3600000000L
    val byU = ev.groupBy(_._1)
    val want = byU.map { case (_, rows) =>
      val vs = rows.filter(_._2 == "view").map(_._3)
      val cs = rows.filter(_._2 == "click").map(_._3)
      val ps = rows.filter(_._2 == "purchase").map(_._3)
      val depths = vs.map { v =>
        val c1 = cs.filter(c => c > v && c <= v + H)
        if (c1.isEmpty) 1
        else {
          val c = c1.min
          if (ps.exists(pp => pp > c && pp <= v + H)) 3 else 2
        }
      }
      if (depths.isEmpty) 0 else depths.max
    }.filter(_ > 0).groupBy(identity).map { case (dp, us) => (dp, us.size.toLong) }
    val got = graft.SparkEntry.queries("q_window_funnel")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want, s"got=$got want=$want")
  }

  test("q_m4_downsample: per-bucket min/max/first/last match a driver pass") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us",
                  "cast(round(value * 100) as long) as cents", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val t0 = ev.map(_._2).min; val t1 = ev.map(_._2).max
    val want = ev.groupBy(x => (x._1, math.min(63L, (x._2 - t0) * 64 / (t1 - t0 + 1)))).map {
      case ((et, b), rows) =>
        val inOrder = rows.sortBy(x => (x._2, x._4))
        (et, b) -> (rows.size.toLong, rows.map(_._3).min, rows.map(_._3).max,
                    inOrder.head._3, inOrder.last._3)
    }
    val got = graft.SparkEntry.queries("q_m4_downsample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == want)
    assert(got.keys.map(_._2).max <= 63L)
  }
}
