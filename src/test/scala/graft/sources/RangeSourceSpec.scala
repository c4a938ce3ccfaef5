package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Observability of the DSv2 contracts: the pushed id bounds must appear in
  * the scan's description (i.e. the SCAN was narrowed, not a post-filter),
  * partition planning must scale with the residual range, and column
  * pruning must reach readSchema. */
class RangeSourceSpec extends SparkSpec {

  private def ranged(start: Long, end: Long) =
    spark.read.format("graft.sources.RangeSource")
      .option("start", start.toString).option("end", end.toString).load()

  test("id bounds push into the scan (plan shows the residual range)") {
    val df = ranged(0, 200000).where(col("id") >= 50000 && col("id") < 150000)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GraftRangeScan[50000, 150000)"),
      s"scan not narrowed by pushdown:\n$p")
    assert(df.count() == 100000)
  }

  test("partition count follows the residual range, not the declared extent") {
    val full = ranged(0, 200000)
    val narrowed = ranged(0, 200000).where(col("id") >= 150000)
    assert(full.rdd.getNumPartitions == 8)
    assert(narrowed.rdd.getNumPartitions == 2,
      "partitions outside the pushed bounds must not be planned")
  }

  test("column pruning reaches readSchema") {
    val df = ranged(0, 50000).select(col("id"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cols=id"), s"projection did not prune the scan:\n$p")
  }

  test("non-pushable predicates stay post-scan and still filter correctly") {
    val df = ranged(0, 1000).where(col("tag") === "a")
    assert(df.count() == 250)
    // every 4th id is 'a'; values must match the closed form
    val r = df.where(col("id") === 8).collect()
    assert(r.length == 1 && r(0).getDouble(1) == RangeSource.valOf(8))
  }

  test("aggregate pushdown: COUNT/MIN/MAX compute closed-form in the source") {
    val df = ranged(0, 200000)
      .where(col("id") >= 50000 && col("id") < 180000)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
           max(col("id")).as("max_id"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("agg=count,min,max"),
      s"aggregation not pushed into the scan:\n$p")
    val r = df.collect().head
    assert(r.getLong(0) == 130000L && r.getLong(1) == 50000L
           && r.getLong(2) == 179999L)
  }

  test("group-by aggregates decline pushdown and stay correct") {
    val df = ranged(0, 1000).groupBy(col("tag")).count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("agg="), "grouped aggregation must fall back to the row scan")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
           == Map("a" -> 250L, "b" -> 250L, "c" -> 250L, "d" -> 250L))
  }

  test("runtime filtering: DPP narrows partition planning to the dim's keys") {
    RangeSource.lastRuntimePrune = None
    val dim = spark.range(0, 200000, 25000)
      .select(col("id").as("dim_id")).where(col("dim_id") % 3 === 0)
    val q = ranged(0, 200000).join(broadcast(dim), col("id") === col("dim_id"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
           max(col("id")).as("max_id"))
    assert(q.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      "no dynamicpruning subquery planned on the v2 scan")
    val r = q.collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L && r.getLong(2) == 150000L)
    // 8 slices in the declared extent; only the 3 holding dim keys planned
    assert(RangeSource.lastRuntimePrune.contains((8, 3)),
      s"expected 8→3 slice narrowing, got ${RangeSource.lastRuntimePrune}")
  }

  test("EqualTo prunes to a single-row scan") {
    val df = ranged(0, 200000).where(col("id") === 123456L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GraftRangeScan[123456, 123457)"), p)
    assert(df.count() == 1)
  }
}
