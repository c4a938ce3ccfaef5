package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Independent driver-side transcriptions of this round's analytic ops —
  * the semantic-twin pattern (Round10OpsSpec): each brute force recomputes
  * the full contract from the raw tables in plain Scala and must match the
  * declared query row for row at sf0.001.
  */
class Round11OpsSpec extends SparkSpec {

  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("q_sim_bq ≡ brute-force sign-bit Hamming prefilter + exact rerank") {
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def norm(v: Array[Float]): Double = {
      // FloatDot's sequential fold: float pairs multiplied in double, summed
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(acc)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc / (norm(a) * norm(b))
    }
    def code(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach { j => if (v(j) > 0) lo |= (1L << j) }
      (0 until 32).foreach { j => if (v(j + 32) > 0) hi |= (1L << j) }
      (lo, hi)
    }
    val nz = embs.filter { case (_, v) => norm(v) > 0 }
    val codes = nz.map { case (id, v) => id -> code(v) }.toMap
    val expected = nz.filter(_._1 < 10).flatMap { case (qId, qv) =>
      val (ql, qh) = codes(qId)
      val cand = nz.map { case (nId, nv) =>
        val (nl, nh) = codes(nId)
        (nId, nv, java.lang.Long.bitCount(ql ^ nl) + java.lang.Long.bitCount(qh ^ nh))
      }.sortBy { case (nId, _, hamm) => (hamm, nId) }.take(40)
      cand.map { case (nId, nv, _) => (nId, cos(qv, nv)) }
        .sortBy { case (nId, sc) => (-sc, nId) }.take(5).zipWithIndex
        .map { case ((nId, sc), i) => (qId, nId, halfUp(sc * 10000).toInt, i + 1) }
    }
    val got = SparkEntry.queries("q_sim_bq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == expected.toSeq)
  }

  test("q_assoc_rules ≡ brute-force support/confidence/lift over baskets") {
    val bi = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = bi.map(_._1).distinct.length.toLong
    val supp = bi.groupBy(_._2).map { case (i, xs) => i -> xs.length.toLong }
    val baskets = bi.groupBy(_._1).values.map(_.map(_._2).toSeq.sorted)
    val pairSupp = baskets.toSeq
      .flatMap(items => for (a <- items; b <- items if a < b) yield (a, b))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      .filter(_._2 >= 2)
    val rules = pairSupp.toSeq.flatMap { case ((a, b), sp) =>
      Seq((a, b, sp), (b, a, sp)) }
    val expected = rules.map { case (ant, cons, sp) =>
      val sa = supp(ant); val sc = supp(cons)
      (ant, cons, sp, sa,
       math.floor((sp * 10000).toDouble / sa.toDouble + 0.5).toLong,
       math.floor((sp * n * 10000).toDouble / (sa * sc).toDouble + 0.5).toLong)
    }.sortBy { case (ant, cons, _, _, _, lift) => (-lift, ant, cons) }.take(20)
    val got = SparkEntry.queries("q_assoc_rules")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected)
  }

  test("q_survival_km ≡ brute-force Kaplan–Meier table") {
    val us = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (_, xs) =>
        val ts = xs.map(_._2)
        (ts.min, ts.max)
      }.toSeq
    val gmax = us.map(_._2).max
    val lc = us.map { case (f, l) =>
      ((l - f) / 86400000000L, l < gmax - 7L * 86400000000L) }
    val hist = lc.groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    val dT = lc.filter(_._2).groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    val expected = dT.keys.toSeq.sorted.flatMap { t =>
      val n = hist.collect { case (u, c) if u >= t => c }.sum
      val d = dT(t)
      if (n > d) Some((t, d, n,
        math.round(1e8 * (math.log((n - d).toDouble) - math.log(n.toDouble)))))
      else None
    }
    // cumulative log-survival over ascending t
    val cum = expected.scanLeft(0L)(_ + _._4).tail
    val withCum = expected.zip(cum).map { case ((t, d, n, _), c) => (t, d, n, c) }
    val got = SparkEntry.queries("q_survival_km")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == withCum)
  }

  test("q_stl_decomp ≡ brute-force trend/seasonal/residual decomposition") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(date_trunc('day', ts)) div 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (tpe, xs) =>
      val cnt = xs.groupBy(_._2).map { case (d, ys) => d -> ys.length.toLong }
      val (d0, d1) = (cnt.keys.min, cnt.keys.max)
      val dense = (d0 to d1).map(d => d -> cnt.getOrElse(d, 0L))
      val full = dense.zipWithIndex.collect {
        case ((d, c), i) if i >= 3 && i <= dense.length - 4 =>
          val t7 = (i - 3 to i + 3).map(j => dense(j)._2).sum
          (d, c, t7, 7 * c - t7, d % 7)
      }
      val seas = full.groupBy(_._5).map { case (dow, ys) =>
        dow -> math.floor(
          (ys.map(_._4).sum * 10000).toDouble / (ys.length * 7).toDouble + 0.5).toLong
      }
      full.map { case (d, c, t7, _, dow) =>
        val trendE4 = math.floor((t7 * 10000).toDouble / 7.0 + 0.5).toLong
        (tpe, d, c, trendE4, seas(dow), c * 10000 - trendE4 - seas(dow))
      }
    }.sortBy { case (tpe, d, _, _, _, _) => (tpe, d) }
    val got = SparkEntry.queries("q_stl_decomp")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected)
  }
}
