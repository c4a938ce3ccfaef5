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
}
