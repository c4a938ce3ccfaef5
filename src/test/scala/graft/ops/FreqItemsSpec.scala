package graft.ops

import graft.SparkSpec
import graft.functions.FreqItems
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft_freq_items (Misra–Gries TypedImperativeAggregate). The DuckDB
  * oracle pins the q_freq_items contract flags at the driver tiers; these
  * tests pin the THEOREMS the flags rely on — no overestimate, bounded
  * underestimate, heavy-hitter completeness — under adversarial
  * partitionings (merge-order invariance is exactly what "mergeable
  * summaries" must guarantee), plus exactness below capacity and bounded
  * state.
  */
class FreqItemsSpec extends SparkSpec {

  private def sketch(df: DataFrame, k: Int): Map[Long, Long] = {
    FreqItems.register(spark)
    df.agg(call_function("graft_freq_items", col("item"), lit(k)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def exact(df: DataFrame): Map[Long, Long] =
    df.groupBy(col("item")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // Skewed deterministic stream: item = floor(sqrt(id)) over 100k rows —
  // ~316 distinct items, item m occurring ~2m+1 times (heavy tail at the
  // top, far more distincts than k).
  private def skewed = spark.range(100000)
    .select(floor(sqrt(col("id").cast("double"))).cast("long").as("item"))

  private def assertGuarantees(k: Int, est: Map[Long, Long], ex: Map[Long, Long]): Unit = {
    val n = ex.values.sum
    val bound = n.toDouble / (k + 1)
    est.foreach { case (i, c) =>
      assert(c <= ex(i), s"overestimate for $i: $c > ${ex(i)}")
      assert(c >= ex(i) - bound, s"underestimate beyond N/(k+1) for $i")
    }
    ex.foreach { case (i, f) =>
      if (f > bound) assert(est.contains(i), s"heavy hitter $i (f=$f > $bound) untracked")
    }
    assert(est.size <= k, s"state exceeded k: ${est.size} > $k")
  }

  test("MG guarantees hold and are partitioning-invariant (k=16, 316 distincts)") {
    val ex = exact(skewed)
    Seq(skewed, skewed.repartition(13, col("item")), skewed.coalesce(1),
        skewed.orderBy(col("item").desc)).foreach { df =>
      assertGuarantees(16, sketch(df, 16), ex)
    }
  }

  test("exact when distinct items fit the capacity") {
    val df = spark.range(10000).select((col("id") % 40).as("item"))
    val ex = exact(df)
    Seq(df, df.repartition(7)).foreach { v =>
      assert(sketch(v, 64) == ex) // no decrement can ever fire below capacity
    }
  }

  test("nulls skipped; empty input yields an empty summary") {
    val withNulls = spark.range(1000)
      .select(when(col("id") % 3 === 0, col("id") % 5).as("item"))
    val ex = exact(withNulls.where(col("item").isNotNull))
    assert(sketch(withNulls, 8) == ex)
    assert(sketch(spark.range(0).select(col("id").as("item")), 8).isEmpty)
  }

  test("resolves in SQL through GraftExtensions") {
    spark.range(100).select((col("id") % 3).as("item")).createOrReplaceTempView("fi_t")
    val rows = spark.sql(
      "SELECT graft_freq_items(item, 4) AS sk FROM fi_t").collect()
    assert(rows.length == 1 && rows.head.getSeq[Any](0).size == 3)
  }
}
