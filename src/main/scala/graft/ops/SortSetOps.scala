package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 — sort, limit/top-k, pagination, set operations.
  *
  * Scale posture: `q_topk_global` must plan as `TakeOrderedAndProject`
  * (per-partition heap + driver merge of k rows) — a global sort of 100 TB to
  * take 25 rows would be wrong; asserted in `PlanAuditSpec`. Set ops are
  * hash-based shuffles on the full row, which is the correct distributed
  * formulation.
  */
object SortSetOps extends OpModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multi-key sort with an explicitly nullable computed key and
    // NULLS FIRST/ DESC mixes; trailing unique key for D4 total order.
    "q_sort_multi" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
                nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
                col("c_acctbal"))
        .orderBy(col("seg").asc_nulls_first, col("c_acctbal").desc, col("c_custkey"))),

    "q_topk_global" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    "q_limit_offset" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(40).limit(20)),

    "q_union_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), lit("urgent").as("src"))
        .unionByName(
          o.where(col("o_totalprice") > 200000)
            .select(col("o_orderkey"), lit("big").as("src")))
        .orderBy(col("o_orderkey"), col("src"))
    }),

    // Schema-evolution union: an old record era lacking a column and a new
    // era with it (and a different column order) combine by NAME with NULL
    // padding (`allowMissingColumns`) — the in-flight complement to
    // src_schema_evolve's at-rest mergeSchema. Positional UNION would
    // silently misalign the reordered columns; by-name is the only safe
    // spelling once schemas drift.
    "q_union_evolve" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val era1 = o.where(year(col("o_orderdate")) < 1997)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val era2 = o.where(year(col("o_orderdate")) >= 1997)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_orderstatus"))
      era1.unionByName(era2, allowMissingColumns = true)
        .orderBy(col("o_orderkey"))
    }),

    "q_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .unionByName(o.where(col("o_totalprice") > 200000).select(col("o_custkey")))
        .distinct()
        .orderBy(col("o_custkey"))
    }),

    "q_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .intersect(o.where(col("o_totalprice") > 200000).select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    "q_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_totalprice") > 200000).select(col("o_custkey"))
        .except(o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // Bag-semantics set ops: multiplicities are preserved (min of the two
    // counts for INTERSECT ALL; count difference for EXCEPT ALL). Spark
    // rewrites both into a count-aggregate on the full row + generate —
    // one hash shuffle, same cost shape as the DISTINCT variants.
    "q_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_totalprice") > 150000).select(col("o_custkey"))
        .intersectAll(o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    "q_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.where(col("o_totalprice") > 150000).select(col("o_custkey"))
        .exceptAll(o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_sort_multi" ->
      """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
        |FROM customer
        |ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey""".stripMargin,

    "q_topk_global" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin,

    "q_union_all" ->
      """SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, 'big' AS src FROM orders WHERE o_totalprice > 200000
        |ORDER BY o_orderkey, src""".stripMargin,

    "q_union_evolve" ->
      """SELECT o_orderkey, o_orderstatus, NULL AS o_orderpriority
        |FROM orders WHERE YEAR(o_orderdate) < 1997
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE YEAR(o_orderdate) >= 1997
        |ORDER BY o_orderkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 200000
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "q_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,
  )
}
