package graft.ops

import graft.{SparkSpec, SparkEntry}
import graft.functions.TopK
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** graft_topk (TypedImperativeAggregate) — the bounded top-k aggregate.
  * The DuckDB oracle pins the sf0.01 answer; these tests pin the properties
  * that keep it correct on a cluster: agreement with the window idiom,
  * invariance to physical partitioning (merge order), and bounded state.
  */
class TopKSpec extends SparkSpec {

  private def windowTop3(df: org.apache.spark.sql.DataFrame): Array[Row] = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    df.select(col("g"), col("id"), col("v"), row_number().over(w).as("rn"))
      .where(col("rn") <= 3)
      .select(col("g"), col("rn"), col("id"), col("v"))
      .orderBy(col("g"), col("rn"))
      .collect()
  }

  private def aggTop3(df: org.apache.spark.sql.DataFrame): Array[Row] = {
    TopK.register(spark)
    df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("v"), col("id"), lit(3)).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rn"),
              col("t.pl").as("id"), col("t.sk").as("v"))
      .orderBy(col("g"), col("rn"))
      .collect()
  }

  // 10k rows, 100 groups, deterministic synthetic values with ties in v
  // (id breaks them) — exercises the compaction path (group size 100 > 4k+64
  // is false here, so also run one fat group below).
  private def synth = {
    import spark.implicits._
    spark.range(10000)
      .select((col("id") % 100).as("g"), col("id"),
              ((col("id") * 37) % 1000).as("v"))
  }

  test("agrees with the window row_number idiom on synthetic groups") {
    assert(aggTop3(synth).sameElements(windowTop3(synth)))
  }

  test("result invariant to input partitioning (merge order / retries)") {
    val base = aggTop3(synth)
    val shuffled = aggTop3(synth.repartition(13, col("id")))
    val one = aggTop3(synth.coalesce(1))
    assert(shuffled.sameElements(base) && one.sameElements(base))
  }

  test("one fat group exercises buffer compaction and stays exact") {
    import spark.implicits._
    // 50k rows in a single group — far past the 4k+64 compaction threshold.
    val fat = spark.range(50000)
      .select(lit(0L).as("g"), col("id"), ((col("id") * 7919) % 50000).as("v"))
    val got = aggTop3(fat)
    val want = windowTop3(fat)
    assert(got.sameElements(want))
  }

  test("null sort keys are skipped; all-null group yields empty array") {
    import spark.implicits._
    val df = Seq((0L, 1L, Some(5L)), (0L, 2L, None), (1L, 3L, None))
      .toDF("g", "id", "v")
    TopK.register(spark)
    val rows = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("v"), col("id"), lit(3)).as("top"))
      .select(col("g"), size(col("top")).as("n"))
      .orderBy(col("g"))
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((0L, 1), (1L, 0)))
  }
}
