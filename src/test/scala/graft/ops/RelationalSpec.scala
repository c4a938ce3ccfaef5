package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Unit checks for §2.1–§2.3, §2.6 (the DuckDB oracle at sf0.01 is the
  * authoritative gate; these are fast regression guards at sf0.001 with
  * independently-computed expectations). */
class RelationalSpec extends SparkSpec {

  test("q_join_star5: one row per (region, nation), positive revenue") {
    val rows = Joins.star5(spark, sf).collect()
    assert(rows.length == 25) // 25 nations, all regions
    assert(rows.forall(_.getLong(2) > 0))
    // rows sorted by (r_name, n_name)
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("semi + anti partition customers for the same predicate") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf).where(col("o_orderpriority") === "1-URGENT")
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(semi + anti == c.count())
    assert(semi > 0)
  }

  test("q_join_left keeps every left row at least once") {
    val df = SparkEntryRef("q_join_left")(spark, sf)
    assert(df.select(col("c_custkey")).distinct().count() ==
      Tables.customer(spark, sf).count())
  }

  test("q_join_full covers both sides") {
    val df = SparkEntryRef("q_join_full")(spark, sf)
    val leftOnly = df.where(col("o_custkey").isNull).count()
    val rightOnly = df.where(col("c_custkey").isNull).count()
    val both = df.where(col("c_custkey").isNotNull && col("o_custkey").isNotNull).count()
    assert(both > 0 && leftOnly + rightOnly + both == df.count())
  }

  test("q_scan_pushdown filter reaches the parquet scan") {
    val df = SparkEntryRef("q_scan_pushdown")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("q_topk_global plans as TakeOrderedAndProject (no global sort)") {
    val df = SparkEntryRef("q_topk_global")(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("union_all length = sum of parts; intersect/except partition union_distinct") {
    val uAll = SparkEntryRef("q_union_all")(spark, sf).count()
    val o = Tables.orders(spark, sf)
    val urgent = o.where(col("o_orderpriority") === "1-URGENT").count()
    val big = o.where(col("o_totalprice") > 200000).count()
    assert(uAll == urgent + big)

    val uDist = SparkEntryRef("q_union_distinct")(spark, sf).count()
    val inter = SparkEntryRef("q_intersect")(spark, sf).count()
    val exc = SparkEntryRef("q_except")(spark, sf).count()
    val urgentKeys = o.where(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    // |A ∪ B| = |A| + |B \ A|... here: big∖urgent (= except) + urgent-distinct
    assert(uDist == urgentKeys + exc)
    assert(inter <= urgentKeys)
  }

  test("q_union_evolve: by-name union pads the missing era-1 column with nulls") {
    val df = SortSetOps.queries("q_union_evolve")(spark, sf)
    assert(df.count() == Tables.orders(spark, sf).count())
    val era1Nulls = df.where(col("o_orderpriority").isNull).count()
    val era1 = Tables.orders(spark, sf)
      .where(year(col("o_orderdate")) < 1997).count()
    assert(era1Nulls == era1, "every era-1 row (and only those) lacks the new column")
  }

  test("q_er_join links every corrupted record back to its own entity") {
    val rows = Joins.queries("q_er_join")(spark, sf).collect()
    assert(rows.length == Tables.supplier(spark, sf).count())
    rows.foreach { r =>
      assert(r.getBoolean(3), s"dirty ${r.getLong(0)} linked to ${r.getLong(1)}")
      assert(r.getInt(2) == 1, "single-char corruption must link at distance 1")
    }
  }

  private object SparkEntryRef {
    def apply(name: String) = graft.SparkEntry.queries(name)
  }
}
