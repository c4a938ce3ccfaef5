package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 — scans with projection and predicate pushdown.
  *
  * Scale posture: both queries must compile to a parquet scan whose
  * `ReadSchema` lists only the referenced columns and (for pushdown) whose
  * `PushedFilters` carries the shipdate range — at 100 TB that is the
  * difference between reading 4 columns of a few row groups and reading the
  * whole table. Asserted in `PlanAuditSpec`.
  */
object Scans extends OpModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_scan_pushdown" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= to_timestamp(lit("1998-01-01")) &&
               col("l_shipdate") <  to_timestamp(lit("1999-01-01")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
  )

  override def oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
