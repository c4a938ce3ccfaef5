package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — projection, filter, scalar expression semantics.
  *
  * All expressions are Catalyst built-ins, so they stay inside whole-stage
  * codegen and their predicates remain pushdown-eligible — no UDFs here.
  *
  * Dialect notes (D5): DuckDB `CAST(double AS BIGINT)` rounds while Spark
  * truncates, so integral conversion always goes through `FLOOR`/`ROUND`
  * first, making the double integral (identical semantics on both engines).
  */
object Expressions extends OpModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_compound" -> ((s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderstatus").isin("F", "O") &&
               col("o_totalprice").between(10000, 150000) &&
               !col("o_orderpriority").like("3-%") &&
               col("o_custkey").isNotNull)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    "q_project_case" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") >= 30, "bulk")
            .when(col("l_quantity") >= 10, "mid")
            .otherwise("small").as("qty_tier"),
          Det.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .as("charge_cents"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_cast_types" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("int").as("key_int"),
          col("o_orderkey").cast("double").as("key_dbl"),
          col("o_orderkey").cast("string").as("key_str"),
          floor(col("o_totalprice")).cast("long").as("price_floor"),
          // DATE encoded as ISO string: robust to comparator dtype handling
          col("o_orderdate").cast("date").cast("string").as("order_date"),
          substring(col("o_orderpriority"), 1, 1).cast("int").as("priority_num"))
        .orderBy(col("o_orderkey"))),

    "q_null_handling" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag"),
          nullif(col("l_linestatus"), lit("F")).isNull.as("was_f"),
          nullif(col("l_returnflag"), lit("N"))
            .eqNullSafe(nullif(col("l_linestatus"), lit("F"))).as("nsafe_eq"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // DataFrameNaFunctions surface: fill / drop / replace are the
    // null-repair verbs of every ingest pipeline. Nulls are planted with
    // nullif, then each verb's effect is pinned as a count (fill/replace
    // change values, never cardinality; drop removes exactly the planted
    // rows).
    "q_na_funcs" -> ((s, d) => {
      val withNulls = Tables.customer(s, d)
        .select(col("c_custkey"),
                nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
                when(col("c_acctbal") < 0, lit(null).cast("double"))
                  .otherwise(col("c_acctbal")).as("bal"))
      val filled = withNulls.na.fill(Map("seg" -> "UNKNOWN", "bal" -> 0.0))
      val replaced = filled.na.replace("seg", Map("MACHINERY" -> "MACH"))
      val dropped = withNulls.na.drop(Seq("seg", "bal"))
      replaced
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), Det.moneySum(col("bal")).as("bal_cents"))
        .crossJoin(broadcast(dropped.agg(count(lit(1)).as("n_complete"))))
        .orderBy(col("seg"))
    }),

    // Parameterized SQL (Spark 4 named-parameter binding): the injection-
    // safe API surface every query service wraps — parameters are bound as
    // literals by the parser, never string-spliced. The oracle inlines the
    // same constants.
    "q_sql_params" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_prm_v")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_prm_v
          |WHERE o_orderstatus = :st AND o_totalprice > :minp
          |ORDER BY o_orderkey""".stripMargin,
        Map("st" -> "P", "minp" -> 150000))
    }),

    // EXECUTE IMMEDIATE — dynamic SQL with bound parameters (the Spark 4
    // SQL-scripting surface q_sql_script's DECLARE/WHILE family builds
    // on): the statement TEXT is data, the USING clause binds named
    // parameters, and the whole thing plans exactly like its static twin
    // (parameter binding happens at analysis, so pushdown/pruning are
    // unaffected — same plan, spec-free by construction). The oracle is
    // the inner query with the parameters inlined as literals.
    "q_sql_exec_immediate" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_ei_v")
      s.sql(
        """EXECUTE IMMEDIATE
          |  'SELECT o_orderstatus AS grp, COUNT(*) AS n,
          |     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
          |   FROM orders_ei_v WHERE o_orderkey BETWEEN :lo AND :hi
          |   GROUP BY o_orderstatus ORDER BY grp'
          |  USING 1000 AS lo, 30000 AS hi""".stripMargin)
    }),

    // range() table-valued function: the generator source for synthetic
    // dims and backfill drivers (distributed: range is split across
    // executors like any scan).
    "q_tvf_range" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation_tvf_v")
      s.sql("""SELECT r.id AS bucket, COUNT(*) AS n, MIN(n.n_name) AS first_nation
              |FROM range(0, 5) r JOIN nation_tvf_v n ON n.n_nationkey % 5 = r.id
              |GROUP BY r.id ORDER BY bucket""".stripMargin)
    }),

    // Inline VALUES as a join dim — the literal lookup-table idiom (tier
    // thresholds, code→name maps) that otherwise gets simulated with
    // chained CASE WHEN.
    "q_values_dim" -> ((s, d) => {
      Tables.region(s, d).createOrReplaceTempView("region_val_v")
      s.sql("""SELECT r.r_name, v.hemisphere
              |FROM region_val_v r
              |JOIN (VALUES ('AFRICA', 'both'), ('AMERICA', 'both'),
              |             ('ASIA', 'north'), ('EUROPE', 'north'),
              |             ('MIDDLE EAST', 'north')) AS v(rn, hemisphere)
              |  ON r.r_name = v.rn
              |ORDER BY r.r_name""".stripMargin)
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE o_orderstatus IN ('F','O')
        |  AND o_totalprice BETWEEN 10000 AND 150000
        |  AND o_orderpriority NOT LIKE '3-%'
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q_project_case" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity >= 30 THEN 'bulk'
        |       WHEN l_quantity >= 10 THEN 'mid'
        |       ELSE 'small' END AS qty_tier,
        |  CAST(ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100) AS BIGINT) AS charge_cents
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_cast_types" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS INTEGER) AS key_int,
        |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS priority_num
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_null_handling" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag,
        |  (NULLIF(l_linestatus, 'F') IS NULL) AS was_f,
        |  (NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'F')) AS nsafe_eq
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_na_funcs" ->
      """WITH w AS (
        |  SELECT c_custkey,
        |    NULLIF(c_mktsegment, 'BUILDING') AS seg,
        |    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        |  FROM customer),
        |f AS (
        |  SELECT c_custkey,
        |    CASE COALESCE(seg, 'UNKNOWN') WHEN 'MACHINERY' THEN 'MACH'
        |         ELSE COALESCE(seg, 'UNKNOWN') END AS seg,
        |    COALESCE(bal, 0.0) AS bal
        |  FROM w),
        |dc AS (SELECT COUNT(*) AS n_complete FROM w
        |       WHERE seg IS NOT NULL AND bal IS NOT NULL)
        |SELECT f.seg, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(f.bal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
        |  MAX(dc.n_complete) AS n_complete
        |FROM f, dc GROUP BY f.seg ORDER BY f.seg""".stripMargin,

    "q_sql_params" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'P' AND o_totalprice > 150000
        |ORDER BY o_orderkey""".stripMargin,

    // the dynamic statement with its parameters inlined as literals
    "q_sql_exec_immediate" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 30000
        |GROUP BY o_orderstatus ORDER BY grp""".stripMargin,

    "q_tvf_range" ->
      """SELECT CAST(r.range AS BIGINT) AS bucket, COUNT(*) AS n,
        |  MIN(n.n_name) AS first_nation
        |FROM range(0, 5) r JOIN nation n ON n.n_nationkey % 5 = r.range
        |GROUP BY r.range ORDER BY bucket""".stripMargin,

    "q_values_dim" ->
      """SELECT r.r_name, v.hemisphere
        |FROM region r
        |JOIN (VALUES ('AFRICA', 'both'), ('AMERICA', 'both'),
        |             ('ASIA', 'north'), ('EUROPE', 'north'),
        |             ('MIDDLE EAST', 'north')) AS v(rn, hemisphere)
        |  ON r.r_name = v.rn
        |ORDER BY r.r_name""".stripMargin,
  )
}
