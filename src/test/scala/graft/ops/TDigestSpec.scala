package graft.ops

import graft.SparkSpec
import graft.functions.TDigest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft_tdigest (TypedImperativeAggregate) — the mergeable quantile sketch.
  * The oracle pins exact quantiles + the in-bound flag at sf0.01; these
  * tests pin the error CONTRACT the flag relies on: rank error within the
  * declared 2.5% bound on uniform, skewed, and heavy-tie distributions, and
  * under any physical partitioning (merge order).
  */
class TDigestSpec extends SparkSpec {

  /** Rank error of the digest's [p50, p95] estimates against the data, as a
    * fraction of n; uses the strict/inclusive rank bracket the query uses so
    * value atoms can't inflate the error of a correct estimate. */
  private def rankErrors(df: DataFrame): Seq[Double] = {
    TDigest.register(spark)
    val est = df.agg(expr("graft_tdigest(v)").as("e"))
      .select(col("e").getItem(0).as("e50"), col("e").getItem(1).as("e95")).head()
    val n = df.count().toDouble
    Seq(0.5 -> est.getDouble(0), 0.95 -> est.getDouble(1)).map { case (q, e) =>
      val lo = df.where(col("v") < e).count() / n
      val hi = df.where(col("v") <= e).count() / n
      if (q < lo) q - lo else if (q > hi) q - hi else 0.0
    }
  }

  private def uniform = {
    import spark.implicits._
    spark.range(20000).select(((col("id") * 7919) % 20011).cast("double").as("v"))
  }

  test("rank error within 2.5% on a uniform distribution") {
    rankErrors(uniform).foreach(e => assert(math.abs(e) <= 0.025, s"err $e"))
  }

  test("rank error within 2.5% on a Zipf-like skewed distribution") {
    // exp of a uniform → heavy right tail (log-uniform)
    val skewed = uniform.select(exp(col("v") / lit(2000.0)).as("v"))
    rankErrors(skewed).foreach(e => assert(math.abs(e) <= 0.025, s"err $e"))
  }

  test("rank bracket: a 30% value atom at the median does not fail the contract") {
    val atom = uniform.select(
      when(col("v") < 6000, lit(10000.0)).otherwise(col("v")).as("v"))
    rankErrors(atom).foreach(e => assert(math.abs(e) <= 0.025, s"err $e"))
  }

  test("error bound holds under any partitioning (merge order)") {
    Seq(1, 7, 32).foreach { p =>
      rankErrors(uniform.repartition(p))
        .foreach(e => assert(math.abs(e) <= 0.025, s"parts=$p err $e"))
    }
  }

  test("nulls skipped; empty group yields null") {
    TDigest.register(spark)
    val r = spark.sql(
      """SELECT g, graft_tdigest(v) AS e FROM VALUES
        |  (1, CAST(NULL AS DOUBLE)), (1, 5.0), (1, 7.0), (2, CAST(NULL AS DOUBLE))
        |  AS t(g, v) GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(!r(0).isNullAt(1))
    assert(r(1).isNullAt(1))
  }

  test("state stays bounded: digest of 200k rows has O(delta) centroids") {
    // serialize ships ≤ ~2·delta centroids; verify indirectly via the eval
    // path staying exact-free: estimates exist and are within bound.
    import spark.implicits._
    val big = spark.range(200000).select((col("id") % 99991).cast("double").as("v"))
    rankErrors(big).foreach(e => assert(math.abs(e) <= 0.025, s"err $e"))
  }
}
