package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — window functions.
  *
  * Scale posture: every window is partitioned by a high-cardinality key
  * (custkey / user_id), so state per partition stays bounded and the single
  * shuffle is on the partition key. Global-order statistics (`q_win_dist`,
  * account-balance distribution) run through [[DistRank]]'s two-pass
  * rank-by-histogram — no full-table single-partition window anywhere
  * (plan-audited). Running/range frames use the streaming frame evaluator
  * (`WindowExec` keeps only the frame, not the partition, for bounded
  * frames). Determinism: every ORDER BY inside a window carries a unique
  * tie-break key (D3).
  */
object Windows extends OpModule {

  private def centsCol = round(col("o_totalprice") * 100).cast("long")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                row_number().over(w).as("rn"),
                rank().over(w).as("rk"),
                dense_rank().over(w).as("drk"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_win_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
                sum(centsCol).over(w).as("run_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_win_leadlag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
                (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
                lead(col("event_id"), 1).over(w).as("next_id"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Moving 30-day revenue per customer — RANGE frame over unix seconds.
    "q_win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-2592000L, 0L)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
                sum(centsCol).over(w).as("rev30d_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Global distribution stats WITHOUT a global single-partition window:
    // DistRank's two-pass rank-by-histogram (bucket = acctbal cents div
    // 10000 → ~110 buckets over TPC-H's [-999.99, 9999.99] domain), then
    // ntile/percent_rank/cume_dist derived from the tie-free rank by the
    // exact SQL formulas. The only single-partition exchange left in the
    // plan carries histogram rows (bounded by bucket granularity), never
    // customer rows — plan-audited.
    "q_win_dist" -> ((s, d) => {
      val ranked = DistRank.withGlobalRank(
        Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
        Det.cents(col("c_acctbal")), col("c_custkey"), 10000L, "gr_r", "gr_n")
      ranked
        .select(col("c_custkey"),
                DistRank.ntileFromRank("gr_r", "gr_n", 4).as("quartile"),
                round(DistRank.percentRankFromRank(col("gr_r"), col("gr_n")), 4).as("pct_rank"),
                round(DistRank.cumeDistFromRank(col("gr_r"), col("gr_n")), 4).as("cume"))
        .orderBy(col("c_custkey"))
    }),

    // Frame-boundary navigation: first/last/nth over the FULL partition
    // frame (default frame would make last_value = current row).
    "q_win_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
                first(col("o_orderkey")).over(w).as("first_ord"),
                last(col("o_orderkey")).over(w).as("last_ord"),
                nth_value(col("o_orderkey"), 2).over(w).as("second_ord"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // THE top-k-per-group idiom: rank inside partition, filter k.
    "q_topk_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                row_number().over(w).as("rn"))
        .where(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // The same answer as q_topk_group with different physics: a bounded
    // top-k AGGREGATE (graft.functions.TopK, TypedImperativeAggregate).
    // The window idiom must shuffle every row and sort whole partitions
    // before discarding all but k; this plan partial-aggregates map-side
    // (ObjectHashAggregate), so the shuffle carries ≤ k entries per group —
    // O(groups×k) rows moved at any scale. Same oracle family as
    // q_topk_group (row_number ≤ 3), prices as exact cents.
    "q_topk_agg" -> ((s, d) => {
      graft.functions.TopK.register(s)
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(call_function("graft_topk",
          Det.cents(col("o_totalprice")), col("o_orderkey"), lit(3)).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("o_custkey"),
                (col("pos") + 1).cast("int").as("rn"),
                col("t").getField("pl").as("o_orderkey"),
                col("t").getField("sk").as("price_cents"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // IGNORE NULLS analytics — the forward-fill (last-observation-carried-
    // forward) idiom over a sparse column: open orders carry a price, other
    // statuses are gaps that inherit the most recent open value. Same
    // single-shuffle window walk as every other q_win_*.
    "q_win_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
                when(col("o_orderstatus") === "O", Det.cents(col("o_totalprice"))).as("v"))
        .select(col("o_custkey"), col("o_orderkey"), col("v"),
                last(col("v"), ignoreNulls = true).over(wRun).as("fill_v"),
                lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_v"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Rolling EXACT median (robust trailing statistic — the telemetry
    // smoother that outlier-heavy feeds need where a rolling mean is
    // poisoned by spikes): per-customer trailing-5-order median of the
    // order total. Exact `percentile` as a WINDOW aggregate — the frame
    // holds ≤ 5 rows, so the per-row sort the exact median implies is O(5)
    // regardless of history length; the only shuffle is the o_custkey
    // partition every q_win_* shares. Median of an even frame lands on a
    // .5 cents step — reported ×2 (med2_cents) to stay integer-exact on
    // both engines (cents ≤ 5e7, doubles exact to 2^53, D1 discipline).
    "q_win_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(-4, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
                Det.cents(col("o_totalprice")).as("cents"))
        .withColumn("med2_cents",
          (expr("percentile(cents, 0.5)").over(w) * 2).cast("long"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // TIME-interval RANGE frame: each event's trailing-1-hour activity per
    // user (`RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW` over
    // the ts ordering) — the sliding-window-per-ROW companion to the
    // bucketed q_slide_batch. RANGE frames include PEERS (equal ts), so
    // the result is deterministic even with duplicate timestamps — no
    // tie-break column needed, unlike every ROWS frame here (D3's range
    // exception). One user_id shuffle; frame scan is bounded by the hour.
    "q_win_time_range" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
                Det.cents(col("value")).as("c"))
        .withColumn("n_1h", expr(
          """count(1) OVER (PARTITION BY user_id ORDER BY ts
            |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""
            .stripMargin))
        .withColumn("cents_1h", expr(
          """sum(c) OVER (PARTITION BY user_id ORDER BY ts
            |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""
            .stripMargin))
        .select(col("event_id"), col("n_1h"), col("cents_1h"))
        .orderBy(col("event_id"))),

    // DISTINCT count over a moving window — a surface gap in Spark (the
    // analyzer rejects `COUNT(DISTINCT) OVER`), filled by composing
    // codegen'd collection primitives: collect_list over the frame →
    // array_distinct → size. The frame is 8 rows, so the per-row array is
    // bounded (this composition is O(frame), the right trade only for
    // bounded ROWS frames — an unbounded frame would want the DistRank
    // two-pass shape instead). Total (ts, event_id) ordering per D3;
    // DuckDB's native windowed COUNT(DISTINCT) is the oracle.
    "q_win_distinct_count" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-7, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("dcnt",
          size(array_distinct(collect_list(col("event_type")).over(w))))
        .select(col("event_id"), col("dcnt"))
        .orderBy(col("event_id"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
        |  CAST(RANK() OVER w AS INTEGER) AS rk,
        |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS run_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_leadlag" ->
      """SELECT user_id, event_id,
        |  EPOCH_US(ts) - LAG(EPOCH_US(ts), 1) OVER w AS gap_us,
        |  LEAD(event_id, 1) OVER w AS next_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS rev30d_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(EPOCH(o_orderdate) AS BIGINT)
        |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_dist" ->
      """SELECT c_custkey,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
        |  ROUND(CUME_DIST() OVER w, 4) AS cume
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_ord,
        |  LAST_VALUE(o_orderkey) OVER w AS last_ord,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_ord
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_agg" ->
      """SELECT o_custkey, rn, o_orderkey, price_cents FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |         ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
        |                  o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_win_ignore_nulls" ->
      """SELECT o_custkey, o_orderkey, v,
        |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS fill_v,
        |  LAG(v IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_v
        |FROM (SELECT o_custkey, o_orderkey,
        |        CASE WHEN o_orderstatus = 'O'
        |             THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS v
        |      FROM orders) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_rolling_median" ->
      """SELECT o_custkey, o_orderkey, cents,
        |  CAST(MEDIAN(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) * 2 AS BIGINT) AS med2_cents
        |FROM (SELECT o_custkey, o_orderkey,
        |        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_time_range" ->
      """SELECT event_id,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h,
        |  CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_1h
        |FROM (SELECT event_id, user_id, ts,
        |        CAST(ROUND(value * 100) AS BIGINT) AS c FROM events) t
        |ORDER BY event_id""".stripMargin,

    "q_win_distinct_count" ->
      """SELECT event_id,
        |  CAST(COUNT(DISTINCT event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS INTEGER) AS dcnt
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
