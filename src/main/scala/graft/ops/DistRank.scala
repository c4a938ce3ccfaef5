package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order rank — the two-pass rank-by-histogram that
  * replaces `Window.orderBy(...)` with no partition key (a single task
  * sorting the whole table; VERDICT r3 "What's wrong" #2).
  *
  * Shape: (1) map each row to a coarse bucket that is a monotone function
  * of the ordering value; (2) aggregate a bucket histogram (map-side
  * partial, one tiny shuffle); (3) cumulative-sum the histogram into
  * per-bucket rank offsets — this IS a single-partition window, but over
  * histogram rows, whose count is bounded by the bucket granularity and
  * independent of data volume; (4) broadcast the offsets back and
  * row_number WITHIN each bucket (`Window.partitionBy(bucket)`), so the
  * full-table sort work is spread across one task per bucket. Global rank
  * = bucket offset + local row_number.
  *
  * The caller guarantees `(value, tie)` is unique per row, so rank ==
  * row_number == dense position in the total order, and the derived
  * percent_rank/cume_dist/ntile formulas below are exactly the tie-free
  * SQL window semantics. At 100 TB the fixed `bucketWidth` becomes
  * sampled range boundaries (the same sample pass `repartitionByRange`
  * already does), which also handles skewed value distributions; the
  * harness-scale formulation keeps a deterministic width so the oracle
  * comparison is reproducible.
  */
object DistRank {

  /** Adds `rankName` (1-based position in the total order by (value, tie))
    * and `nName` (total row count) columns. `value` must cast losslessly
    * to long; ordering is ascending (negate for descending).
    */
  def withGlobalRank(df: DataFrame, value: Column, tie: Column, bucketWidth: Long,
                     rankName: String, nName: String): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Guard the lossless-cast contract at runtime instead of in prose: a
    // fractional ordering column would silently rank by its truncation.
    val valueType = df.select(value.as("gr_probe")).schema.head.dataType
    require(Set("byte", "short", "integer", "long").contains(valueType.typeName),
      s"withGlobalRank orders by an integral column; got ${valueType.typeName} " +
        "(pre-scale fractional values to integer units, e.g. cents)")
    val reserved = Seq("gr_v", "gr_bkt", "gr_off")
    val clobbered = df.columns.toSet.intersect(reserved.toSet)
    require(clobbered.isEmpty,
      s"input frame already has internal column(s) ${clobbered.mkString(", ")}")
    // `div` truncates toward zero (not floor), but bucket ids only need to
    // be monotone non-decreasing in the value, which truncation preserves.
    val b = df.withColumn("gr_v", value.cast("long"))
      .withColumn("gr_bkt", expr(s"gr_v div ${bucketWidth}L"))
    val hist = b.groupBy(col("gr_bkt")).agg(count(lit(1)).as("gr_c"))
    val wCum = Window.orderBy(col("gr_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist.select(
      col("gr_bkt"),
      coalesce(sum(col("gr_c")).over(wCum), lit(0L)).as("gr_off"),
      sum(col("gr_c")).over(Window.partitionBy()).as(nName))
    val wLoc = Window.partitionBy(col("gr_bkt")).orderBy(col("gr_v"), tie)
    b.join(broadcast(offs), Seq("gr_bkt"))
      .withColumn(rankName, col("gr_off") + row_number().over(wLoc))
      .drop("gr_bkt", "gr_off", "gr_v")
  }

  /** SQL NTILE(k) from a tie-free rank: the first (n mod k) tiles get
    * (n div k)+1 rows, the rest (n div k). Pure integer arithmetic —
    * bit-equal across engines.
    */
  def ntileFromRank(rank: String, n: String, k: Int): Column = expr(
    s"""CAST(CASE WHEN $rank <= ($n % $k) * (($n div $k) + 1)
       |  THEN ($rank - 1) div (($n div $k) + 1) + 1
       |  ELSE ($n % $k) + ($rank - 1 - ($n % $k) * (($n div $k) + 1)) div ($n div $k) + 1
       |END AS INT)""".stripMargin)

  /** percent_rank over a tie-free total order: (rank-1)/(n-1), 0 for n=1. */
  def percentRankFromRank(rank: Column, n: Column): Column =
    when(n === 1, lit(0.0)).otherwise((rank - 1).cast("double") / (n - 1))

  /** cume_dist over a tie-free total order: rank/n. */
  def cumeDistFromRank(rank: Column, n: Column): Column =
    rank.cast("double") / n
}
