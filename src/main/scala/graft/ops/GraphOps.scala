package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-analytics operators over the token co-occurrence graph — the
  * corpus-shaped graph the engine already mines (`q_tok_cooccur` PMI,
  * `q_pagerank` TextRank, `q_dedup_cluster*` connected components). Three
  * classic distributed primitives complete the family: triangle counting
  * (clustering-coefficient / community-density evidence), k-core
  * decomposition (the standard "dense-subgraph" peel), and common-neighbor
  * link prediction (the Jaccard/Adamic-Adar candidate-pair shape).
  *
  * Graph construction (shared by both queries and both oracles): nodes are
  * ≥4-char tokens, an undirected edge (u, v), u < v, exists when the tokens
  * co-occur in ≥ 3 documents. Per-document pair expansion is C(t, 2) with
  * t ≈ 19 distinct qualifying tokens — a CONSTANT per-doc bound (curation
  * pipelines cap document length), so edge building is linear in the corpus
  * and the node space grows with the vocabulary (Heaps' law), not a fixed
  * key set — the corpus-scaling blocking rule every family here follows.
  *
  * Scale posture, triangle counting: the naive wedge join generates
  * Σ deg(x)² wedges — a hub node makes that quadratic. This implementation
  * orients every edge from the (degree, name)-smaller endpoint to the larger
  * (the Suri–Vassilvitskii / node-iterator++ MR formulation): each triangle
  * is generated exactly once as a wedge at its minimum vertex, and per-node
  * wedge fan-out is bounded by the node's OUT-degree in the orientation,
  * which is O(√|E|) for any graph (arboricity bound) — hubs shed their
  * wedges to their low-degree neighbors. Both stages are plain equi-joins on
  * the wedge apex / closing edge, hash-partitionable at any scale.
  *
  * Scale posture, k-core: real deployments peel to a fixpoint with a
  * driver-side convergence check on a per-round count; the query form fixes
  * THREE peel rounds so the oracle stays expressible as unrolled CTEs (the
  * q_pagerank / q_dedup_cluster technique — fixed iteration count, identical
  * trajectory on both engines). Each round is one degree aggregation plus
  * two semi-join filters — the same shuffle key (edge endpoint) every round,
  * so AQE reuses the partitioning; state never leaves the cluster.
  */
object GraphOps extends OpModule {

  /** Minimum co-occurrence support for an edge. */
  private val MinSupport = 3

  /** Undirected co-occurrence edges (u < v lexicographic, n_co ≥ 3).
    * Pair generation is a MAP-SIDE double explode of each document's own
    * distinct-token array — the r14 optimization replacing the token-list
    * self-join on doc_id, which paid two exchanges of the exploded token
    * table plus a sort-merge before the same (u, v) aggregate (measured
    * 0.49 → 0.37 s at sf0.1, pair set bit-identical; the per-doc fan-out
    * is the identical C(k, 2), only WHERE it happens moves). The (u, v)
    * count keeps map-side partial aggregation, so the one remaining
    * exchange carries pre-reduced pair counts. */
  private[ops] def edges(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(array_distinct(split(trim(lower(col("text"))), " ")).as("xs"))
      .select(explode(col("xs")).as("u"), col("xs"))
      .where(length(col("u")) >= 4)
      .select(col("u"), explode(col("xs")).as("v"))
      .where(length(col("v")) >= 4 && col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_co"))
      .where(col("n_co") >= MinSupport)
      .select(col("u"), col("v"))

  /** Strong co-purchase part edges (u < v, co-ordered in ≥ 2 distinct
    * orders) — the shared edge set of q_label_prop / q_link_pred /
    * q_modularity. Same map-side pair-generation shape as [[edges]]:
    * collect_set(p) per order replaces the (o, p)-distinct + self-join on
    * o (two exchanges of the item table gone; collect_set order does not
    * matter — every pair explodes and the count is order-blind). */
  private[ops] def strongCoPurchase(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(collect_set(col("p")).as("xs"))
      .select(explode(col("xs")).as("u"), col("xs"))
      .select(col("u"), explode(col("xs")).as("v"))
      .where(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_co"))
      .where(col("n_co") >= 2)
      .select(col("u"), col("v"))

  /** The same construction as a DuckDB CTE prefix (both oracles embed it). */
  private val EdgesSql =
    """tk AS (
      |  SELECT doc_id, UNNEST(LIST_DISTINCT(STRING_SPLIT(TRIM(LOWER(text)), ' '))) AS t
      |  FROM documents),
      |tok AS (SELECT doc_id, t FROM tk WHERE LENGTH(t) >= 4),
      |e AS (SELECT a.t AS u, b.t AS v FROM tok a
      |      JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
      |      GROUP BY a.t, b.t HAVING COUNT(*) >= 3)""".stripMargin

  /** Shared by q_hits and q_hits_cached — the twins differ only in
    * materialization strategy, so one oracle pins both. */
  private val HitsOracle =
    """WITH e AS (
      |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |h1 AS (SELECT c, COUNT(*) * 1000 AS h FROM e GROUP BY c),
      |h1n AS (SELECT c, CAST(h * 1000000000 // (SELECT SUM(h) FROM h1) AS BIGINT) AS h FROM h1),
      |a1 AS (SELECT p, CAST(SUM(h1n.h) AS BIGINT) AS a FROM e JOIN h1n ON e.c = h1n.c GROUP BY p),
      |a1n AS (SELECT p, CAST(a * 1000000000 // (SELECT SUM(a) FROM a1) AS BIGINT) AS a FROM a1),
      |h2 AS (SELECT c, CAST(SUM(a1n.a) AS BIGINT) AS h FROM e JOIN a1n ON e.p = a1n.p GROUP BY c),
      |h2n AS (SELECT c, CAST(h * 1000000000 // (SELECT SUM(h) FROM h2) AS BIGINT) AS h FROM h2),
      |a2 AS (SELECT p, CAST(SUM(h2n.h) AS BIGINT) AS a FROM e JOIN h2n ON e.c = h2n.c GROUP BY p),
      |a2n AS (SELECT p, CAST(a * 1000000000 // (SELECT SUM(a) FROM a2) AS BIGINT) AS a FROM a2)
      |SELECT p AS partkey, a AS auth_e9 FROM a2n
      |ORDER BY auth_e9 DESC, partkey LIMIT 20""".stripMargin

  /** HITS (Kleinberg hubs & authorities), 2 unrolled iterations over the
    * BIPARTITE customer→part purchase graph — shared by q_hits and its
    * materialization twin q_hits_cached (`cutPerStep`: localCheckpoint each
    * bounded half-step score frame before it is re-referenced). */
  private def hits(s: SparkSession, d: String, cutPerStep: Boolean): DataFrame = {
    val e = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey").as("c"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
                                         col("l_partkey").as("p")), "o_orderkey")
      .select(col("c"), col("p")).distinct()
      // round-10: e feeds 5 joins/aggregates — materialize once (measured
      // 60 file scans in the static plan without it)
      .localCheckpoint(true)
    val M = 1000000000L
    def normalized(raw: DataFrame, key: String, v: String): DataFrame = {
      // the un-normalized aggregate is the frame referenced twice (total +
      // value join) — cut HERE, not after the crossJoin
      val scores = if (cutPerStep) raw.localCheckpoint(true) else raw
      val tot = scores.agg(sum(col(v)).as("tot"))
      scores.crossJoin(broadcast(tot))
        .select(col(key), expr(s"$v * ${M}L div tot").as(v))
    }
    // auth0 = 1000 for every part → hub1 = 1000 * deg(c), exact.
    val hub1 = normalized(
      e.groupBy(col("c")).agg((count(lit(1)) * 1000L).as("h")), "c", "h")
    val auth1 = normalized(
      e.join(hub1, "c").groupBy(col("p")).agg(sum(col("h")).as("a")), "p", "a")
    val hub2 = normalized(
      e.join(auth1, "p").groupBy(col("c")).agg(sum(col("a")).as("h")), "c", "h")
    val auth2 = normalized(
      e.join(hub2, "c").groupBy(col("p")).agg(sum(col("h")).as("a")), "p", "a")
    auth2.select(col("p").as("partkey"), col("a").as("auth_e9"))
      .orderBy(col("auth_e9").desc, col("partkey")).limit(20)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Degree-ordered triangle counting; output = top-20 nodes by the number
    // of triangles they participate in (cnt DESC, node — D3 tie-break).
    "q_triangle" -> ((s, d) => {
      // round-10: the derived edge list feeds degree + orientation +
      // wedge + closing joins — materialize once (18 static file scans
      // without it; edges are an aggregate, NOT the corpus, so the
      // checkpoint is bounded)
      val e = edges(s, d).localCheckpoint(true)
      val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("dg"))
      val ed = e
        .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
        .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
      // Orient from the (degree, name)-smaller endpoint.
      val o = ed.select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
             struct(col("u").as("src"), col("v").as("dst"), col("dv").as("ddst")))
          .otherwise(
             struct(col("v").as("src"), col("u").as("dst"), col("du").as("ddst"))).as("r"))
        .select(col("r.src"), col("r.dst"), col("r.ddst"))
      // Wedges at the minimum vertex; the closing edge b→c exists in the
      // orientation iff (deg, name) orders b before c — the wedge predicate.
      val wedge = o.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
        .join(o.select(col("src"), col("dst").as("c"), col("ddst").as("dc")), Seq("src"))
        .where(col("db") < col("dc") || (col("db") === col("dc") && col("b") < col("c")))
      val tri = wedge
        .join(o.select(col("dst").as("c"), col("src").as("b")), Seq("b", "c"))
        .select(col("src").as("a"), col("b"), col("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
        .orderBy(col("n_tri").desc, col("node")).limit(20)
    }),

    // Link prediction by common-neighbor count + Jaccard over the STRONG
    // part co-purchase graph: an edge is a part pair co-ordered in ≥ 2
    // distinct orders; for non-adjacent pairs, how many shared strong
    // partners do they have ("frequently bought with the same things, never
    // together")? The token co-occurrence graph above is useless here — at
    // every tier it converges to a small complete graph (24-node clique at
    // sf0.01: zero non-adjacent pairs) — while the co-purchase graph's node
    // count grows with the part catalog and its degree stays O(1) (orders
    // per part and items per order are corpus-independent ratios), so both
    // the pair expansion (C(items/order, 2) per order — constant) and the
    // wedge expansion (C(deg, 2) per center) stay linear in corpus size.
    // The degree-≤64 hub guard is a no-op at harness tiers (max strong
    // degree 13) but bounds the wedge fan-out against a future hot part —
    // the standard common-neighbor/Adamic-Adar hub filter. Equi-joins and
    // aggregations only; no all-pairs anywhere.
    "q_link_pred" -> ((s, d) => {
      val e = strongCoPurchase(s, d)
        // round-10 localCheckpoint: reused by degree/hub-filter/wedge
        // stages (42 static file scans without it)
        .localCheckpoint(true)
      val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("dg"))
      val keep = deg.where(col("dg") <= 64).select(col("x"))
      val e2 = e.join(keep.select(col("x").as("u")), Seq("u"), "left_semi")
                .join(keep.select(col("x").as("v")), Seq("v"), "left_semi")
      val d2 = e2.select(explode(array(col("u"), col("v"))).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("dg"))
      val nb = e2.select(col("u").as("c"), col("v").as("n"))
        .unionAll(e2.select(col("v").as("c"), col("u").as("n")))
      val cand = nb.select(col("c"), col("n").as("a"))
        .join(nb.select(col("c"), col("n").as("b")), Seq("c"))
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
      cand
        .join(e2.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"), "left_anti")
        .join(d2.select(col("x").as("a"), col("dg").as("da")), "a")
        .join(d2.select(col("x").as("b"), col("dg").as("db")), "b")
        .select(col("a"), col("b"), col("cn"),
                expr("cn * 10000 div (da + db - cn)").as("jac_e4"))
        .orderBy(col("cn").desc, col("jac_e4").desc, col("a"), col("b"))
        .limit(20)
    }),

    // HITS (Kleinberg hubs & authorities), 2 unrolled iterations over the
    // BIPARTITE customer→part purchase graph: hub(customer) = Σ auth(parts
    // they order), auth(part) = Σ hub(customers ordering it), each half-step
    // normalized to a 1e9 total-mass budget. All arithmetic is exact longs
    // (init 1000 units, scale-by-1e9 floor division against the 1-row
    // broadcast total), so both engines walk the identical trajectory — the
    // q_pagerank discipline on a bipartite graph. Scale posture: the edge
    // list is one orders⋈lineitem equi join + distinct (linear in lineitem),
    // every iteration is two aggregations on endpoint keys that grow with
    // the customer/part catalogs, and the normalization totals are 1-row
    // broadcasts. Degrees are O(1) per node (items per order, orders per
    // customer are corpus-independent ratios), so no hub blow-up; output is
    // TakeOrdered top-20.
    "q_hits" -> ((s, d) => hits(s, d, cutPerStep = false)),

    // Materialization twin of q_hits, hash-pinned to the same oracle: each
    // HALF-STEP's normalized score frame is localCheckpointed. The score
    // frames are BOUNDED (one row per customer/part — catalog-sized at any
    // corpus scale, the localCheckpoint rule), and each is referenced
    // twice downstream (its own normalization total + the next half-step's
    // join), with the re-references COMPOUNDING across the four unrolled
    // half-steps (hub1's chain re-evaluates up to 8× inside auth2's
    // lineage unless ReuseExchange catches every duplicate). The twin
    // exists to measure whether cutting the lineage beats exchange reuse
    // here (the q_assoc_rules caveat: sometimes it does NOT) — BASELINE.md
    // records both at sf0.1/sf1.
    "q_hits_cached" -> ((s, d) => hits(s, d, cutPerStep = true)),

    // 3-round k-core peel (k = 3): every round recomputes degrees and drops
    // nodes below k plus their edges. Output = surviving nodes with their
    // degree in the round-3 subgraph.
    "q_kcore" -> ((s, d) => {
      // round-10: cut lineage at the start AND per peel round — the loop
      // otherwise compounds un-materialized edge builds (54 file scans in
      // the static plan), the q_dedup_cluster localCheckpoint discipline
      var e = edges(s, d).localCheckpoint(true)
      for (_ <- 1 to 3) {
        val keep = e.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("dg"))
          .where(col("dg") >= 3)
          .select(col("x"))
        e = e.join(keep.select(col("x").as("u")), Seq("u"), "left_semi")
             .join(keep.select(col("x").as("v")), Seq("v"), "left_semi")
             .localCheckpoint(true)
      }
      e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .orderBy(col("node"))
    }),

    // Newman modularity of a node partition — the graph-quality audit for
    // any community/label assignment: Q = Σ_c [e_c/m − (d_c/2m)²] over the
    // strong co-purchase part graph (q_link_pred's edge set, no hub cap —
    // modularity is per-EDGE work, no wedge expansion), partitioned by the
    // catalog's own p_brand. Shapes: the edge list is the one co-order
    // self-join (linear in lineitem, bounded per-order fan-out); brands
    // attach via two broadcast part-dim joins; e_c/d_c/m are three exact
    // integer aggregates of the edge table. Per-brand Q contribution
    // rounds at 1e8 from one shared double expression — bit-stable, and
    // the global Q is the (deducible) integer sum of the column.
    // Synchronous label propagation (2 rounds) — the near-linear community
    // detector beside q_dedup_cluster's min-label components: each round
    // every node adopts its neighbors' MAJORITY label (tie → min label —
    // deterministic, where textbook LPA breaks ties randomly). Runs on the
    // strong CO-PURCHASE graph (q_modularity's edge set), whose diameter
    // keeps 2-hop propagation local — the dense token graph collapses to
    // one community in 2 rounds (measured), which tests nothing. One round
    // = one join on the neighbor key + one (node, label) aggregate + one
    // per-node top-1 window — the same shuffle key every round, so the
    // partitioning reuses; rounds are fixed at 2 so the oracle unrolls
    // (q_pagerank's fixed-trajectory technique; production iterates to
    // convergence with a driver-side delta count). Output = per-community
    // membership summary.
    "q_label_prop" -> ((s, d) => {
      val e = strongCoPurchase(s, d)
      // edges materialize ONCE (localCheckpoint, the q_dedup_cluster
      // idiom) — both vote rounds and the seed read the same edge blocks
      // instead of re-running the co-purchase build per round
      val nb = e.select(col("u").as("c"), col("v").as("n"))
        .unionAll(e.select(col("v").as("c"), col("u").as("n")))
        .localCheckpoint(true)
      def round(lbl: DataFrame): DataFrame = {
        val votes = nb.join(lbl.withColumnRenamed("node", "n"), Seq("n"))
          .groupBy(col("c"), col("lab")).agg(count(lit(1)).as("nv"))
        // top-1 = max(nv, −lab): majority count, min-label tie-break — a
        // map-side-combinable AGGREGATE, not a per-node sort window
        votes.groupBy(col("c"))
          .agg(max(struct(col("nv"), (-col("lab")).as("nl"))).as("m"))
          .select(col("c").as("node"), (-col("m.nl")).as("lab"))
      }
      val l0 = nb.select(col("c").as("node")).distinct()
        .withColumn("lab", col("node"))
      round(round(l0))
        .groupBy(col("lab"))
        .agg(count(lit(1)).as("n_members"),
             min(col("node")).as("min_member"), max(col("node")).as("max_member"))
        .orderBy(col("lab"))
    }),

    "q_modularity" -> ((s, d) => {
      val e = strongCoPurchase(s, d)
      val brand = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      // round-10 localCheckpoint: eb feeds m/d_c/e_c (12 static scans)
      val eb = e.join(broadcast(brand.select(col("p_partkey").as("u"), col("p_brand").as("bu"))), Seq("u"))
                .join(broadcast(brand.select(col("p_partkey").as("v"), col("p_brand").as("bv"))), Seq("v"))
                .localCheckpoint(true)
      val m = eb.agg(count(lit(1)).as("m"))
      val dC = eb.select(explode(array(col("bu"), col("bv"))).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("d_c"))
      val eC = eb.where(col("bu") === col("bv"))
        .groupBy(col("bu").as("b")).agg(count(lit(1)).as("e_c"))
      dC.join(eC, Seq("b"), "left")
        .na.fill(0L, Seq("e_c"))
        .crossJoin(broadcast(m))
        .select(col("b").as("brand"), col("e_c"), col("d_c"), col("m"),
          expr("""cast(round(1e8 * (cast(e_c as double) / m
                |  - (cast(d_c as double) * d_c) / (4.0 * m * m))) as bigint)"""
            .stripMargin).as("q_e8"))
        .orderBy(col("brand"))
    }),

    // BFS levels from a deterministic seed (the graph's min node id) over
    // the strong co-purchase graph — 3 unrolled rounds of the standard
    // distributed BFS: frontier ⋈ adjacency → distinct → anti-join
    // visited. Each round is one equi shuffle bounded by frontier degree;
    // per-level output is (count, min, max) so the oracle pins the exact
    // reached SET per depth, not just sizes. Unrolled (not iterate-to-
    // convergence) like q_hits/q_pagerank: a fixed trajectory both engines
    // replay exactly; full closure lives in q_dedup_cluster's min-label
    // iteration.
    "q_bfs_levels" -> ((s, d) => {
      val e = strongCoPurchase(s, d)
      // edges materialize once (round-10: the q_label_prop localCheckpoint
      // fix — each of the 3 expand rounds plus the seed/l0 derivation was
      // re-running the co-purchase build; 5.57 → 4.41 s at sf0.1, sf1 in
      // BASELINE round-10)
      val nb = e.select(col("u").as("c"), col("v").as("n"))
        .unionAll(e.select(col("v").as("c"), col("u").as("n")))
        .localCheckpoint(true)
      val seed = nb.agg(min(col("c")).as("seed"))
      val l0 = nb.select(col("c").as("node")).distinct()
        .crossJoin(broadcast(seed)).where(col("node") === col("seed"))
        .select(col("node"))
      def expand(frontier: DataFrame, visited: DataFrame): DataFrame =
        frontier.join(nb, frontier("node") === nb("c"))
          .select(col("n").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
      val l1 = expand(l0, l0)
      val l2 = expand(l1, l0.unionAll(l1))
      val l3 = expand(l2, l0.unionAll(l1).unionAll(l2))
      Seq((l0, 0), (l1, 1), (l2, 2), (l3, 3))
        .map { case (df, lvl) =>
          df.agg(count(lit(1)).as("n_nodes"), min(col("node")).as("min_node"),
                 max(col("node")).as("max_node"))
            .select(lit(lvl).as("level"), col("n_nodes"), col("min_node"),
                    col("max_node"))
        }
        .reduce(_ unionAll _)
        .orderBy(col("level"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_triangle" ->
      s"""WITH $EdgesSql,
        |deg AS (
        |  SELECT x, COUNT(*) AS dg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x),
        |o AS (
        |  SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
        |              THEN e.u ELSE e.v END AS src,
        |         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
        |              THEN e.v ELSE e.u END AS dst,
        |         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
        |              THEN dv.dg ELSE du.dg END AS ddst
        |  FROM e JOIN deg du ON e.u = du.x JOIN deg dv ON e.v = dv.x),
        |w AS (
        |  SELECT x.src, x.dst AS b, y.dst AS c
        |  FROM o x JOIN o y ON x.src = y.src
        |  WHERE x.ddst < y.ddst OR (x.ddst = y.ddst AND x.dst < y.dst)),
        |tri AS (
        |  SELECT w.src AS a, w.b, w.c
        |  FROM w JOIN o ON o.src = w.b AND o.dst = w.c)
        |SELECT node, COUNT(*) AS n_tri FROM (
        |  SELECT a AS node FROM tri UNION ALL
        |  SELECT b AS node FROM tri UNION ALL
        |  SELECT c AS node FROM tri)
        |GROUP BY node ORDER BY n_tri DESC, node LIMIT 20""".stripMargin,

    "q_link_pred" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
        |deg AS (
        |  SELECT x, COUNT(*) AS dg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x),
        |keepn AS (SELECT x FROM deg WHERE dg <= 64),
        |e2 AS (SELECT u, v FROM e
        |       WHERE u IN (SELECT x FROM keepn) AND v IN (SELECT x FROM keepn)),
        |d2 AS (
        |  SELECT x, COUNT(*) AS dg FROM (
        |    SELECT u AS x FROM e2 UNION ALL SELECT v AS x FROM e2) GROUP BY x),
        |nb AS (SELECT u AS c, v AS n FROM e2 UNION ALL SELECT v AS c, u AS n FROM e2),
        |cand AS (
        |  SELECT x.n AS a, y.n AS b, COUNT(*) AS cn
        |  FROM nb x JOIN nb y ON x.c = y.c AND x.n < y.n
        |  GROUP BY x.n, y.n),
        |nonadj AS (
        |  SELECT a, b, cn FROM cand
        |  WHERE NOT EXISTS (SELECT 1 FROM e2 WHERE e2.u = cand.a AND e2.v = cand.b))
        |SELECT a, b, cn, cn * 10000 // (da.dg + db.dg - cn) AS jac_e4
        |FROM nonadj JOIN d2 da ON nonadj.a = da.x JOIN d2 db ON nonadj.b = db.x
        |ORDER BY cn DESC, jac_e4 DESC, a, b LIMIT 20""".stripMargin,

    // Floor vs truncating integer division agree (all values positive);
    // every SUM is cast back to BIGINT before reuse (DuckDB SUM(BIGINT) →
    // HUGEINT, which pandas reads as float64 — the q_seasonality trap).
    "q_hits" -> HitsOracle,

    // the twin is a materialization strategy, never semantics
    "q_hits_cached" -> HitsOracle,

    "q_kcore" ->
      s"""WITH $EdgesSql,
        |n1 AS (SELECT x FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |       GROUP BY x HAVING COUNT(*) >= 3),
        |e1 AS (SELECT u, v FROM e WHERE u IN (SELECT x FROM n1) AND v IN (SELECT x FROM n1)),
        |n2 AS (SELECT x FROM (SELECT u AS x FROM e1 UNION ALL SELECT v AS x FROM e1)
        |       GROUP BY x HAVING COUNT(*) >= 3),
        |e2 AS (SELECT u, v FROM e1 WHERE u IN (SELECT x FROM n2) AND v IN (SELECT x FROM n2)),
        |n3 AS (SELECT x FROM (SELECT u AS x FROM e2 UNION ALL SELECT v AS x FROM e2)
        |       GROUP BY x HAVING COUNT(*) >= 3),
        |e3 AS (SELECT u, v FROM e2 WHERE u IN (SELECT x FROM n3) AND v IN (SELECT x FROM n3))
        |SELECT node, COUNT(*) AS deg FROM (
        |  SELECT u AS node FROM e3 UNION ALL SELECT v AS node FROM e3)
        |GROUP BY node ORDER BY node""".stripMargin,

    "q_label_prop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
        |nb AS (SELECT u AS c, v AS n FROM e UNION ALL SELECT v AS c, u AS n FROM e),
        |l0 AS (SELECT DISTINCT c AS node, c AS lab FROM nb),
        |v1 AS (
        |  SELECT nb.c, l0.lab, COUNT(*) AS nv
        |  FROM nb JOIN l0 ON nb.n = l0.node GROUP BY nb.c, l0.lab),
        |l1 AS (
        |  SELECT c AS node, lab FROM (
        |    SELECT c, lab,
        |           ROW_NUMBER() OVER (PARTITION BY c ORDER BY nv DESC, lab) AS rn
        |    FROM v1) WHERE rn = 1),
        |v2 AS (
        |  SELECT nb.c, l1.lab, COUNT(*) AS nv
        |  FROM nb JOIN l1 ON nb.n = l1.node GROUP BY nb.c, l1.lab),
        |l2 AS (
        |  SELECT c AS node, lab FROM (
        |    SELECT c, lab,
        |           ROW_NUMBER() OVER (PARTITION BY c ORDER BY nv DESC, lab) AS rn
        |    FROM v2) WHERE rn = 1)
        |SELECT lab, COUNT(*) AS n_members, MIN(node) AS min_member,
        |       MAX(node) AS max_member
        |FROM l2 GROUP BY lab ORDER BY lab""".stripMargin,

    "q_modularity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
        |eb AS (
        |  SELECT e.u, e.v, pu.p_brand AS bu, pv.p_brand AS bv
        |  FROM e JOIN part pu ON e.u = pu.p_partkey
        |         JOIN part pv ON e.v = pv.p_partkey),
        |m AS (SELECT COUNT(*) AS m FROM eb),
        |d_c AS (
        |  SELECT b, COUNT(*) AS d_c FROM (
        |    SELECT bu AS b FROM eb UNION ALL SELECT bv AS b FROM eb) GROUP BY b),
        |e_c AS (SELECT bu AS b, COUNT(*) AS e_c FROM eb WHERE bu = bv GROUP BY bu)
        |SELECT d_c.b AS brand, COALESCE(e_c.e_c, 0) AS e_c, d_c.d_c, m.m,
        |  CAST(ROUND(1e8 * (CAST(COALESCE(e_c.e_c, 0) AS DOUBLE) / m.m
        |    - (CAST(d_c.d_c AS DOUBLE) * d_c.d_c) / (4.0 * m.m * m.m))) AS BIGINT) AS q_e8
        |FROM d_c LEFT JOIN e_c ON d_c.b = e_c.b, m
        |ORDER BY brand""".stripMargin,

    "q_bfs_levels" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
        |nb AS (SELECT u AS c, v AS n FROM e UNION ALL SELECT v AS c, u AS n FROM e),
        |l0 AS (SELECT MIN(c) AS node FROM nb),
        |l1 AS (
        |  SELECT DISTINCT nb.n AS node FROM nb JOIN l0 ON nb.c = l0.node
        |  WHERE nb.n NOT IN (SELECT node FROM l0)),
        |l2 AS (
        |  SELECT DISTINCT nb.n AS node FROM nb JOIN l1 ON nb.c = l1.node
        |  WHERE nb.n NOT IN (SELECT node FROM l0 UNION ALL SELECT node FROM l1)),
        |l3 AS (
        |  SELECT DISTINCT nb.n AS node FROM nb JOIN l2 ON nb.c = l2.node
        |  WHERE nb.n NOT IN (SELECT node FROM l0 UNION ALL SELECT node FROM l1
        |                     UNION ALL SELECT node FROM l2))
        |SELECT 0 AS level, COUNT(*) AS n_nodes, MIN(node) AS min_node,
        |       MAX(node) AS max_node FROM l0
        |UNION ALL SELECT 1, COUNT(*), MIN(node), MAX(node) FROM l1
        |UNION ALL SELECT 2, COUNT(*), MIN(node), MAX(node) FROM l2
        |UNION ALL SELECT 3, COUNT(*), MIN(node), MAX(node) FROM l3
        |ORDER BY level""".stripMargin,
  )
}
