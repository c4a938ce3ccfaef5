package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One module per SURVEY.md §2 subsection. Each declared query ID maps to a
  * `(SparkSession, sfDir) => DataFrame` builder and (when oracle-able) a
  * DuckDB-dialect ANSI SQL twin over the same parquet tables
  * (`SparkEntry.scala:9-12`, `Verify.scala:18-39`).
  */
trait OpModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** Keys ⊆ queries.keys; ANSI SQL the driver runs in DuckDB (rules D1–D5,
    * SURVEY.md §5.3). */
  def oracles: Map[String, String]
}

/** Determinism helpers (SURVEY.md §5.3 rules D1–D4).
  *
  * D1 floats: raw `SUM(double)` diverges between Spark's partial-aggregate
  * tree and DuckDB's scan order at the low bits, and `ROUND(sum, k)` can
  * still flip at a rounding boundary. We instead round each ROW to a fixed
  * point (cents / 1e-2 units), cast to long, and sum integers — integer
  * addition is order-independent, so the result is bit-exact on both engines
  * at any scale factor (and at 100 TB: partial aggregation over longs is
  * also faster than over doubles).
  */
object Det {
  /** Exact, order-independent sum of a monetary double column, in cents. */
  def moneySum(c: Column): Column = sum(round(c * 100).cast("long"))

  /** Per-row cents value (exact long). */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
