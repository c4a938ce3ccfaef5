package graft.ops

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  /** Collected co-occurrence edge set (u < v), the shared fixture. */
  private lazy val edgeSet: Set[(String, String)] =
    GraphOps.edges(spark, sf).collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("q_triangle equals a brute-force enumeration over the edge set") {
    val adj = edgeSet.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    // Brute force: for each edge (u,v), every common neighbor c closes the
    // triangle {u,v,c}. Over the triangle's three edges, each of its nodes
    // appears as the common neighbor exactly once — so perNode is exact,
    // and the edge-wise total counts every triangle exactly 3 times.
    var total = 0L
    val perNode = new scala.collection.mutable.HashMap[String, Long]().withDefaultValue(0L)
    edgeSet.foreach { case (u, v) =>
      adj(u).intersect(adj(v)).foreach { c =>
        total += 1
        perNode(c) += 1
      }
    }
    assert(total % 3 == 0, "each triangle must be seen exactly 3 times")
    val want = perNode.toSeq.sortBy { case (n, c) => (-c, n) }.take(20)
    val got = GraphOps.queries("q_triangle")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty, "graph should contain triangles at sf0.001")
  }

  test("q_kcore equals a driver-side 3-round peel; rounds only shrink") {
    var e = edgeSet
    var sizes = List(e.size)
    for (_ <- 1 to 3) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (k, vs) => k -> vs.size }
      val keep = deg.filter(_._2 >= 3).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
      sizes ::= e.size
    }
    assert(sizes == sizes.sorted, "peel rounds must be monotonically shrinking")
    val want = e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (k, vs) => k -> vs.size.toLong }
    val got = GraphOps.queries("q_kcore")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.nonEmpty, "3-core should be non-empty at sf0.001")
  }

  test("q_link_pred equals brute-force common-neighbor scoring on the strong co-order graph") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val strong = li.groupBy(_._1).values.toSeq
      .flatMap { items =>
        val ps = items.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
      }
      // NOT .collect { case (p, _) => p }: a tuple-valued function on a Map
      // rebuilds a Map keyed by p._1 and silently drops pairs sharing a key
      .groupBy(identity).filter(_._2.size >= 2).keySet
    val deg = strong.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (k, vs) => k -> vs.size }
    // hub guard is a no-op at this tier; assert that so a data change that
    // activates it forces this brute force to model it too
    assert(deg.values.max <= 64, "fixture assumes the deg<=64 hub guard never fires")
    val adj = strong.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val cand = adj.toSeq.flatMap { case (_, ns) =>
      val s = ns.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.groupBy(identity).map { case (p, occ) => (p, occ.size.toLong) }
      .filterNot { case (p, _) => strong(p) }
    val want = cand.toSeq.map { case ((a, b), cn) =>
      val jac = cn * 10000 / (deg(a) + deg(b) - cn)
      (a, b, cn, jac)
    }.sortBy { case (a, b, cn, jac) => (-cn, -jac, a, b) }.take(20)
    val got = GraphOps.queries("q_link_pred")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty, "strong co-order graph should yield candidates at sf0.001")
  }

  test("q_hits equals a driver-side exact integer HITS walk") {
    val e = graft.Tables.orders(spark, sf).select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.flatMap { case (o, p) => e.get(o).map(c => (c, p)) }.distinct
    val M = 1000000000L
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> v * M / tot }
    }
    val h1 = norm(edges.groupBy(_._1).map { case (c, es) => c -> 1000L * es.size })
    val a1 = norm(edges.groupBy(_._2).map { case (p, es) => p -> es.map(x => h1(x._1)).sum })
    val h2 = norm(edges.groupBy(_._1).map { case (c, es) => c -> es.map(x => a1(x._2)).sum })
    val a2 = norm(edges.groupBy(_._2).map { case (p, es) => p -> es.map(x => h2(x._1)).sum })
    val want = a2.toSeq.sortBy { case (p, a) => (-a, p) }.take(20)
    val got = GraphOps.queries("q_hits")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty)
  }
}
