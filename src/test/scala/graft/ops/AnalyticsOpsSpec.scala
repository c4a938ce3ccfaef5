package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Driver-side brute-force twins for the round-9 analytics operators —
  * q_skyline's windowed staircase sweep is checked against the O(n²)
  * dominance definition, q_acf against a direct Pearson recomputation, and
  * q_mutual_info against its information-theoretic invariants. (The DuckDB
  * oracles are the cross-engine gate; these pin the SEMANTICS.)
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("q_skyline equals the O(n^2) dominance definition at sf0.001") {
    val parts = graft.Tables.part(spark, sf)
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
                 math.round(r.getDouble(2) * 100)))
    val brute = parts.filter { case (_, s0, p0) =>
      !parts.exists { case (_, s1, p1) =>
        s1 >= s0 && p1 <= p0 && (s1 > s0 || p1 < p0)
      }
    }.map(_._1).toSet
    val got = SparkEntry.queries("q_skyline")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute)
  }

  test("q_acf matches a driver-side Pearson recomputation at sf0.001") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(date_trunc('day', ts) as date) as day")
      .groupBy("event_type", "day").count()
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val expected = for {
      (et, series) <- daily.toSeq
      k <- 1 to 3
      if series.length > k
    } yield {
      val x = series.dropRight(k).map(_.toDouble)
      val y = series.drop(k).map(_.toDouble)
      val n = x.length
      val (sx, sy) = (x.sum, y.sum)
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val sxx = x.map(a => a * a).sum
      val syy = y.map(a => a * a).sum
      val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
      val r = if (den == 0) None
              else Some(math.round(1e6 * (n * sxy - sx * sy) / den))
      ((et, k), (n.toLong, r))
    }
    val got = SparkEntry.queries("q_acf")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
                 (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    assert(got.keySet == expected.map(_._1).toSet)
    expected.foreach { case (key, (n, r)) =>
      val (gn, gr) = got(key)
      assert(gn == n, s"$key n")
      // lag pairing direction differs (x=current vs x=past) — Pearson is
      // symmetric so the value must match exactly up to the last unit.
      assert((gr, r) match {
        case (Some(a), Some(b)) => math.abs(a - b) <= 1
        case (a, b) => a == b
      }, s"$key acf $gr vs $r")
    }
  }

  test("q_mutual_info: per-token MI is p(t)*KL >= 0 and ordering is pinned") {
    val rows = SparkEntry.queries("q_mutual_info")(spark, sf).collect()
    assert(rows.length == 20)
    // each row: t, n_langs, mi_e8 — MI of a single token's contingency row
    // is non-negative up to per-cell rounding (≤ 0.5e-8 per lang cell)
    rows.foreach(r => assert(r.getLong(2) >= -100, r.toString))
    val mis = rows.map(r => (r.getLong(2), r.getString(0)))
    assert(mis.sameElements(mis.sortBy { case (m, t) => (-m, t) }))
  }
}
