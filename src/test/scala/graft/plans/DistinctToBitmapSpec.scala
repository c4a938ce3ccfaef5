package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DistinctToBitmap injected optimizer rule. The DuckDB oracle pins
  * q_agg_distinct_auto's rows; these tests pin the rule's contract:
  * default-off, plan shape under the flag, row identity on hostile inputs
  * (negatives, nulls, all-null groups), and the scope guards (mixed
  * aggregates / non-integral columns must NOT rewrite).
  */
class DistinctToBitmapSpec extends SparkSpec {

  private val Flag = "spark.graft.rewrite.distinctBitmap"

  private def withFlag[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(Flag)
    spark.conf.set(Flag, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Flag, v)
      case None => spark.conf.unset(Flag)
    }
  }

  private def rewritten(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("graft_bm_bits")

  private def hostile: DataFrame = {
    import spark.implicits._
    // negatives, word-boundary values, a group with ONLY nulls, dup values
    Seq[(String, java.lang.Long)](
      ("a", -63L), ("a", -62L), ("a", -1L), ("a", 0L), ("a", 61L), ("a", 62L),
      ("a", 0L), ("a", null), ("b", 123L), ("b", 123L), ("c", null))
      .toDF("g", "v")
  }

  test("default off: plain countDistinct keeps Spark's expand plan") {
    assert(!rewritten(hostile.groupBy("g").agg(countDistinct(col("v")).as("n"))))
  }

  test("flag on: rewrite fires and matches exact counts on hostile input") {
    val q = () => hostile.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .orderBy("g")
    val exact = q().collect().map(r => (r.getString(0), r.getLong(1)))
    withFlag(true) {
      val df = q()
      assert(rewritten(df), "rule did not fire")
      assert(df.collect().map(r => (r.getString(0), r.getLong(1)))
        .sameElements(exact))
      // the all-null group must report 0, not null
      assert(exact.find(_._1 == "c").get._2 == 0L)
    }
  }

  test("row identity on real data at sf0.001") {
    val q = () => graft.Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .orderBy(col("event_type"))
    val exact = q().collect().toSeq
    withFlag(true) {
      val df = q()
      assert(rewritten(df))
      assert(df.collect().toSeq == exact)
    }
  }

  test("scope guards: mixed aggregates and non-integral columns do not rewrite") {
    import spark.implicits._
    withFlag(true) {
      val mixed = hostile.groupBy("g")
        .agg(countDistinct(col("v")).as("n"), count(lit(1)).as("total"))
      assert(!rewritten(mixed), "mixed-aggregate node must be left alone")
      val strings = Seq(("a", "x"), ("a", "y")).toDF("g", "s")
        .groupBy("g").agg(countDistinct(col("s")).as("n"))
      assert(!rewritten(strings), "non-integral column must be left alone")
      // and both still return correct results through Spark's own path
      assert(mixed.orderBy("g").collect().map(_.getLong(1)).sameElements(Array(6L, 1L, 0L)))
      assert(strings.collect().head.getLong(1) == 2L)
    }
  }

  test("global (no grouping) distinct count rewrites and matches") {
    withFlag(true) {
      val df = hostile.agg(countDistinct(col("v")).as("n"))
      assert(rewritten(df))
      assert(df.collect().head.getLong(0) == 7L) // -63,-62,-1,0,61,62,123
    }
  }
}
