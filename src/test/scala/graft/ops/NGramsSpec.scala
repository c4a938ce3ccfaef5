package graft.ops

import graft.SparkSpec
import graft.functions.NGrams
import org.apache.spark.sql.functions._

/** graft_ngrams (native Generator / UDTF surface). The DuckDB oracle pins
  * the sf0.01 trigram counts; these tests pin the generator semantics:
  * agreement with the shinglesAll kernel + explode, edge cases, and the
  * SQL LATERAL VIEW path through the extensions registration.
  */
class NGramsSpec extends SparkSpec {

  test("agrees with the shinglesAll kernel + explode on real documents") {
    NGrams.register(spark)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), trim(lower(col("text"))).as("t"))
    val viaKernel = docs
      .select(col("doc_id"), explode(graft.functions.TextHashes.shinglesAll(3)(
        split(col("t"), " "))).as("ngram"))
      .groupBy(col("ngram")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    docs.createOrReplaceTempView("ngram_spec_v")
    val viaGen = spark.sql(
      "SELECT ngram, COUNT(*) AS n FROM ngram_spec_v " +
      "LATERAL VIEW graft_ngrams(t, 3) AS ngram GROUP BY ngram").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaGen == viaKernel)
  }

  test("short and null inputs emit no rows; n=1 emits every token") {
    NGrams.register(spark)
    val r = spark.sql(
      """SELECT t, ngram FROM VALUES ('a b'), (CAST(NULL AS STRING)), ('x')
        |  AS v(t) LATERAL VIEW graft_ngrams(t, 3) AS ngram""".stripMargin).collect()
    assert(r.isEmpty)
    val ones = spark.sql(
      "SELECT ngram FROM VALUES ('a b c') AS v(t) " +
      "LATERAL VIEW graft_ngrams(t, 1) AS ngram").collect().map(_.getString(0))
    assert(ones.sameElements(Array("a", "b", "c")))
  }

  test("resolves through GraftExtensions without imperative registration") {
    // SparkSpec's session is built with spark.sql.extensions=GraftExtensions;
    // a fresh temp view + SQL call must resolve even though register() was
    // not invoked for this name in this test.
    val r = spark.sql(
      "SELECT ngram FROM VALUES ('p q r s') AS v(t) " +
      "LATERAL VIEW graft_ngrams(t, 2) AS ngram").collect().map(_.getString(0))
    assert(r.sameElements(Array("p q", "q r", "r s")))
  }
}
