package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 — join operators.
  *
  * Scale posture (100 TB): fact-fact joins (`lineitem ⋈ orders`) shuffle on
  * the join key and are left to sort-merge / shuffled-hash under AQE; all
  * dimension joins (`customer/nation/region/part/supplier`-sized sides) are
  * explicitly `broadcast()` so the fact table is never shuffled for them.
  * Non-equi joins keep at least one equi conjunct where the data allows so
  * the planner can hash-partition instead of falling back to a nested-loop
  * over the full cross product.
  */
object Joins extends OpModule {

  /** Flagship (TPC-H Q5 analog): revenue per (region, nation) for 1996
    * orders. lineitem⋈orders shuffles on orderkey; orders⋈customer shuffles
    * on custkey; nation/region broadcast. Revenue summed in exact cents (D1).
    */
  def star5(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
             col("o_orderdate") <  to_timestamp(lit("1997-01-01")))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue_cents"),
           count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_star5" -> ((s, d) => star5(s, d)),

    "q_join_inner" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Same semantics as inner, broadcast forced — the 100 TB dim-join pattern.
    "q_join_broadcast" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("o_orderkey"), col("n_name"))
        .orderBy(col("o_orderkey"))),

    // Left outer with a join-side predicate: null padding must survive.
    "q_join_left" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
              col("c_custkey") === col("o_custkey") && col("o_totalprice") > 150000,
              "left")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)),

    // Right outer — the mirrored null-padding contract.
    "q_join_right" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
              col("o_custkey") === col("c_custkey") && col("o_totalprice") > 150000,
              "right")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)),

    "q_join_full" -> ((s, d) => {
      val c = Tables.customer(s, d).where(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"))
      val o = Tables.orders(s, d).where(col("o_totalprice") > 100000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select(col("c_custkey"), col("c_name"), col("o_custkey"), col("n_orders"))
        .orderBy(coalesce(col("c_custkey"), col("o_custkey")))
    }),

    "q_join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "q_join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 250000),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // Pure theta (non-equi) join: suppliers with account balances within ±10.
    // Planner: broadcast-nested-loop — acceptable because supplier is a dim
    // table at every SF; a fact-sized theta join would get the q_join_range
    // bucketing treatment instead.
    "q_join_theta" -> ((s, d) => {
      val a = Tables.supplier(s, d).select(col("s_suppkey").as("sa"), col("s_acctbal").as("ba"))
      val b = Tables.supplier(s, d).select(col("s_suppkey").as("sb"), col("s_acctbal").as("bb"))
      a.join(broadcast(b),
             col("sa") =!= col("sb") &&
             col("bb") >= col("ba") - 10 && col("bb") <= col("ba") + 10)
        .select(col("sa"), col("sb"))
        .orderBy(col("sa"), col("sb"))
    }),

    "q_join_cross" -> ((s, d) =>
      Tables.region(s, d).crossJoin(broadcast(Tables.nation(s, d)))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))),

    // LATERAL correlated subquery (Spark 4 SQL): each BUILDING customer's
    // single largest order. Catalyst decorrelates the per-row subquery into
    // a window/limit over the orders side + one join on the correlation key
    // — so at scale this costs one shuffle on o_custkey, never a per-row
    // re-execution of the inner query.
    "q_join_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_lat_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_lat_v")
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
              |FROM customer_lat_v c,
              |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat_v o
              |         WHERE o.o_custkey = c.c_custkey
              |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
              |WHERE c.c_mktsegment = 'BUILDING'
              |ORDER BY c.c_custkey""".stripMargin)
    }),

    // Null-aware anti join: NOT IN over a subquery is NOT the same operator
    // as NOT EXISTS once the list can contain NULL — one NULL makes every
    // comparison UNKNOWN and the result empty. Spark plans the null-aware
    // variant (a distinct physical join mode); both behaviors are pinned
    // side by side so a planner regression in either direction is caught.
    "q_join_null_aware" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_naaj_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_naaj_v")
      s.sql("""SELECT variant, n FROM (
              |  SELECT 'no_nulls' AS variant, COUNT(*) AS n FROM customer_naaj_v
              |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_naaj_v
              |                          WHERE o_totalprice > 250000)
              |  UNION ALL
              |  SELECT 'with_nulls', COUNT(*) FROM customer_naaj_v
              |  WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 250000
              |                                      THEN o_custkey END
              |                          FROM orders_naaj_v)) t
              |ORDER BY variant""".stripMargin)
    }),

    // Blocked fuzzy-match join (entity resolution / record linkage): a
    // "dirty" registry — supplier names with one deterministic character
    // corruption — is linked back to the clean registry by best edit
    // distance among DELETION-NEIGHBORHOOD candidates (symmetric-delete /
    // FastSS blocking): each side expands every name into its |name|
    // delete-one-char variants and candidates equi-join on (position,
    // variant) — two equal-length names share a variant at position i iff
    // they agree everywhere except i, so every single-substitution
    // corruption is caught by construction (100% recall for the declared
    // error model) while block sizes stay bounded by the alphabet, not the
    // registry. This replaced a fixed-cardinality substring block (last two
    // id digits, 100 values) whose buckets grew linearly with the registry
    // and whose candidate pairs grew quadratically (measured 11.7× at the
    // 10× tier): deletion-variant keys are name-derived, so their
    // cardinality scales WITH the corpus. The expansion is |name|× rows of
    // short strings — linear scan+shuffle — and a pair can share at most
    // one (i, variant) key, so no distinct is needed before the levenshtein
    // top-1 (tie-broken on the candidate key, D3). `is_correct` pins
    // linkage quality: a blocking or ranking regression surfaces as a hash
    // mismatch, not a silent recall drop.
    "q_er_join" -> ((s, d) => {
      Tables.supplier(s, d)
        .select(col("s_suppkey").as("dk"),
                expr("concat(substr(s_name, 1, 9), 'O', substr(s_name, 11))").as("dn"))
        .createOrReplaceTempView("er_dirty_v")
      Tables.supplier(s, d)
        .select(col("s_suppkey").as("ck"), col("s_name").as("cn"))
        .createOrReplaceTempView("er_clean_v")
      s.sql("""WITH dv AS (
              |  SELECT dk, dn, i, concat(substr(dn, 1, i - 1), substr(dn, i + 1)) AS v
              |  FROM er_dirty_v LATERAL VIEW explode(sequence(1, length(dn))) t AS i),
              |cv AS (
              |  SELECT ck, cn, i, concat(substr(cn, 1, i - 1), substr(cn, i + 1)) AS v
              |  FROM er_clean_v LATERAL VIEW explode(sequence(1, length(cn))) t AS i)
              |SELECT dk, ck AS matched_key, dist, (dk = ck) AS is_correct FROM (
              |  SELECT dv.dk, cv.ck, levenshtein(dv.dn, cv.cn) AS dist,
              |    ROW_NUMBER() OVER (PARTITION BY dv.dk
              |                       ORDER BY levenshtein(dv.dn, cv.cn), cv.ck) AS rn
              |  FROM dv JOIN cv ON dv.i = cv.i AND dv.v = cv.v) t
              |WHERE rn = 1 ORDER BY dk""".stripMargin)
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_join_star5" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT o_orderkey, n_name
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, o_orderkey
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_totalprice > 150000
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT JOIN customer
        |  ON o_custkey = c_custkey AND o_totalprice > 150000
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "q_join_full" ->
      """SELECT c.c_custkey, c.c_name, o.o_custkey, o.n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |           WHERE o_totalprice > 100000 GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY COALESCE(c.c_custkey, o.o_custkey)""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_theta" ->
      """SELECT a.s_suppkey AS sa, b.s_suppkey AS sb
        |FROM supplier a JOIN supplier b
        |  ON a.s_suppkey <> b.s_suppkey
        | AND b.s_acctbal >= a.s_acctbal - 10 AND b.s_acctbal <= a.s_acctbal + 10
        |ORDER BY sa, sb""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c.c_custkey""".stripMargin,

    "q_join_null_aware" ->
      """SELECT variant, n FROM (
        |  SELECT 'no_nulls' AS variant, COUNT(*) AS n FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                          WHERE o_totalprice > 250000)
        |  UNION ALL
        |  SELECT 'with_nulls', COUNT(*) FROM customer
        |  WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 250000
        |                                      THEN o_custkey END
        |                          FROM orders)) t
        |ORDER BY variant""".stripMargin,

    "q_er_join" ->
      """WITH dirty AS (
        |  SELECT s_suppkey AS dk,
        |    SUBSTR(s_name, 1, 9) || 'O' || SUBSTR(s_name, 11) AS dn
        |  FROM supplier),
        |clean AS (SELECT s_suppkey AS ck, s_name AS cn FROM supplier),
        |dv0 AS (SELECT dk, dn, UNNEST(RANGE(1, LEN(dn) + 1)) AS i FROM dirty),
        |dv AS (SELECT dk, dn, i, SUBSTR(dn, 1, i - 1) || SUBSTR(dn, i + 1) AS v FROM dv0),
        |cv0 AS (SELECT ck, cn, UNNEST(RANGE(1, LEN(cn) + 1)) AS i FROM clean),
        |cv AS (SELECT ck, cn, i, SUBSTR(cn, 1, i - 1) || SUBSTR(cn, i + 1) AS v FROM cv0)
        |SELECT dk, ck AS matched_key, CAST(dist AS INTEGER) AS dist,
        |  (dk = ck) AS is_correct FROM (
        |  SELECT dv.dk, cv.ck, LEVENSHTEIN(dv.dn, cv.cn) AS dist,
        |    ROW_NUMBER() OVER (PARTITION BY dv.dk
        |                       ORDER BY LEVENSHTEIN(dv.dn, cv.cn), cv.ck) AS rn
        |  FROM dv JOIN cv ON dv.i = cv.i AND dv.v = cv.v) t
        |WHERE rn = 1 ORDER BY dk""".stripMargin,
  )
}
