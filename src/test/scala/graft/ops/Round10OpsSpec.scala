package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Driver-side semantic twins for the round-10 operators. The DuckDB
  * oracles are the cross-engine gate; these pin the SEMANTICS with
  * independent brute-force recomputations (AnalyticsOpsSpec pattern).
  */
class Round10OpsSpec extends SparkSpec {

  test("q_phash_dedup matches an independent pure-Scala aHash brute force") {
    // Recompute every hash from the CLOSED-FORM pixel grid (no ImageIO, no
    // renderPng — a fully independent transcription), then brute-force all
    // pairs. Agreement pins PNG encode→decode round-trip, block mapping,
    // bit rule, packing, banding recall (lossless at Hamming ≤ 3), and the
    // threshold filter.
    def ahash(id: Long): (Long, Long) = {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val bs = new Array[Long](64); val bc = new Array[Long](64)
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = (id * 31 + x * 7 + y * 13) % 256
        val bi = (y * 8 / h) * 8 + x * 8 / w
        bs(bi) += p; bc(bi) += 1; total += p
      }
      val n = w.toLong * h
      var hi = 0L; var lo = 0L
      for (bi <- 0 until 64 if bs(bi) * n > total * bc(bi)) {
        val by = bi / 8
        val bit = 1L << ((by % 4) * 8 + bi % 8)
        if (by < 4) hi |= bit else lo |= bit
      }
      (hi, lo)
    }
    val hs = (0L until 24L).map(i => i -> ahash(i)).toMap
    val brute = (for {
      a <- 0L until 24L; b <- (a + 1) until 24L
      d = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) +
          java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if d <= 3
    } yield (a, b, d)).toSet
    val got = SparkEntry.queries("q_phash_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == brute.map(t => (t._1, t._2, t._3.toLong)))
  }

  test("q_recursive_cte equals a driver-side fold over monthly totals") {
    val monthly = graft.Tables.orders(spark, sf)
      .selectExpr("month(o_orderdate) as m",
                  "cast(round(o_totalprice * 100) as bigint) as c")
      .groupBy("m").sum("c").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = (2 to 12).scanLeft(1L -> monthly(1)) {
      case ((_, acc), m) => m.toLong -> (acc + acc / 100 + monthly(m))
    }
    val got = SparkEntry.queries("q_recursive_cte")(spark, sf).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toSeq
    assert(got == expected)
  }

  test("q_benford digit counts sum to the table size; digits are 1-9") {
    val rows = SparkEntry.queries("q_benford")(spark, sf).collect()
    val total = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getInt(0)).forall(d => d >= 1 && d <= 9))
    // exp_e8 column = total × frozen share; shares sum to 1e8 (±1 ulp)
    assert(math.abs(rows.map(_.getLong(2)).sum - total * 100000001L) == 0)
  }

  test("q_interval_merge matches a driver-side sweep at sf0.001") {
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts) as st").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).map { case (u, rows) =>
      val iv = rows.sortBy(r => (r._3, r._2)).map(r => (r._3, r._3 + 1800000000L))
      val islands = iv.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, (s0, e0)) => List((s0, e0))
        case ((s0, e0) :: rest, (s1, e1)) =>
          if (s1 > e0) (s1, e1) :: (s0, e0) :: rest
          else (s0, math.max(e0, e1)) :: rest
      }
      u -> (islands.size.toLong,
            islands.map { case (s0, e1) => e1 - s0 }.sum / 1000000L)
    }
    val got = SparkEntry.queries("q_interval_merge")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("q_win_distinct_count matches a driver-side sliding window") {
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts) as us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.zipWithIndex.toSeq.map { case (r, i) =>
        r._2 -> sorted.slice(math.max(0, i - 7), i + 1).map(_._4).distinct.size
      }
    }.toMap
    val got = SparkEntry.queries("q_win_distinct_count")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }

  test("q_label_prop labels partition the node set; deterministic re-run") {
    val rows = SparkEntry.queries("q_label_prop")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val again = SparkEntry.queries("q_label_prop")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // member counts cover every node exactly once
    assert(rows.map(_._2).sum > 0)
    rows.foreach { case (_, n, lo, hi) => assert(n >= 1 && lo <= hi) }
  }

  test("q_kmv_setops invariants: inter <= union, exact audit consistent") {
    val rows = SparkEntry.queries("q_kmv_setops")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ue, ie) = (r.getLong(2), r.getLong(3))
      val (xu, xi) = (r.getLong(4), r.getLong(5))
      assert(ie <= ue, "estimate ordering")
      assert(xi <= xu, "exact ordering")
      // 128-min sketch at these vocabulary sizes: estimate within 3x truth
      assert(ue <= 3 * xu && xu <= 3 * ue, s"union est $ue vs exact $xu")
    }
  }

  test("q_dp_count noise is bounded and deterministic") {
    val rows = SparkEntry.queries("q_dp_count")(spark, sf).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
    // Laplace(b=2) noise from 32-bit uniforms: |noise| <= 2·ln(2^32) ≈ 44.4
    rows.foreach { case (_, n, dp) => assert(math.abs(dp - n) <= 45) }
    val again = SparkEntry.queries("q_dp_count")(spark, sf).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q_sql_udf inlines: equals the direct-expression aggregation") {
    val got = SparkEntry.queries("q_sql_udf")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = graft.Tables.lineitem(spark, sf)
      .selectExpr(
        "case when l_discount >= 0.08 then 'deep' when l_discount >= 0.04 then 'mid' else 'low' end as band",
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint) as c")
      .groupBy("band").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("c").as("rev_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == direct)
  }

  test("q_auc equals the O(n^2) pair definition at sf0.001") {
    val rows = graft.Tables.documents(spark, sf)
      .selectExpr("case when lang = 'en' then 1 else 0 end as y", "n_chars")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    val expected = u2 * 10000 / (2L * pos.length * neg.length)
    val r = SparkEntry.queries("q_auc")(spark, sf).collect().head
    assert(r.getLong(0) == pos.length && r.getLong(1) == neg.length)
    assert(r.getLong(2) == expected)
  }

  test("q_lift_curve: capture is monotone and ends at 10000") {
    val rows = SparkEntry.queries("q_lift_curve")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1 to 10))
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    assert(rows.last._4 == 10000L)
    // deciles split the corpus evenly (±1)
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
  }

  test("q_tdigest_rollup: levels are consistent and digests stay in bracket") {
    val rows = SparkEntry.queries("q_tdigest_rollup")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val leafN = rows.collect { case ((rf, ls), (n, _, _)) if rf != "ALL" && ls != "ALL" => n }.sum
    assert(rows(("ALL", "ALL"))._1 == leafN, "grand total must equal leaf sum")
    rows.values.foreach { case (_, _, ok) => assert(ok, "digest left the 2.5% rank bracket") }
  }

  test("s_late_drop drops exactly the late replay set") {
    // sum of window counts = on-time rows (every late row dropped, no
    // on-time row lost to the flush rule beyond the watermark tail)
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("event_id", "unix_millis(ts) as ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxMs = evs.map(_._2).max
    val late = evs.count(e => e._2 < maxMs - 2 * 3600 * 1000L && e._1 % 97 == 0)
    assert(late > 0, "fixture must contain late rows for the op to test anything")
    val tumble = SparkEntry.queries("s_tumble_wm")(spark, sf).collect()
      .map(_.getLong(2)).sum
    val got = SparkEntry.queries("s_late_drop")(spark, sf).collect()
      .map(_.getLong(2)).sum
    // s_tumble_wm aggregates ALL rows in flushed windows; s_late_drop the
    // on-time subset of the same windows (late rows 2h+ stale always fall
    // in flushed windows)
    assert(tumble - got == late)
  }
}
