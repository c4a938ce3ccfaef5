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
  )
}
