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

    // Dynamic partition pruning: the fact side is a year-partitioned store
    // and the qualifying years are only known at RUNTIME (derived from a
    // data-dependent filter on another table), so static pruning can't
    // apply — the planner instead injects a dynamicpruning subquery into
    // the fact scan's PartitionFilters (reusing the dim side's broadcast;
    // ✔ plan-audited). At 100 TB this is the mechanism that keeps a
    // "revenue for years that had X" query from scanning every year
    // partition of the store. Store write is memoized per JVM like
    // q_join_bucketed's — the layout is written once, queried many times.
    "q_dpp" -> ((s, d) => {
      val path = s"target/tmp/dpp_store_${java.lang.Integer.toHexString(d.hashCode)}"
      if (!Scans.dppReady.contains(path)) {
        Tables.orders(s, d)
          .withColumn("yr", year(col("o_orderdate")))
          .write.mode("overwrite").partitionBy("yr").parquet(path)
        Scans.dppReady += path
      }
      val fact = s.read.parquet(path)
      val dimYears = Tables.lineitem(s, d)
        .where(col("l_quantity") >= 50)
        .select(year(col("l_shipdate")).as("yr")).distinct()
      fact.join(dimYears, "yr")
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n"), Det.moneySum(col("o_totalprice")).as("rev_cents"))
        .orderBy(col("yr"))
    }),
  )

  private val dppReady = scala.collection.mutable.Set[String]()

  override def oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_dpp" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders
        |WHERE YEAR(o_orderdate) IN (SELECT YEAR(l_shipdate) FROM lineitem
        |                            WHERE l_quantity >= 50)
        |GROUP BY YEAR(o_orderdate)
        |ORDER BY yr""".stripMargin,
  )
}
