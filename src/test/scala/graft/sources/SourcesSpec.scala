package graft.sources

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Layout contracts for the sink operators (file counts, sortedness). */
class SourcesSpec extends SparkSpec {

  private def files(path: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.toString).filter(_.endsWith(".parquet")).toSeq
  }

  test("sink_compact: 64 small files collapse to the size-targeted count") {
    SparkEntry.queries("sink_compact")(spark, sf).collect() // runs both writes
    val nSmall = files(Sources.tmp(sf, "small")).size
    val nCompact = files(Sources.tmp(sf, "compact")).size
    assert(nSmall == 64, s"fixture should write 64 small files, got $nSmall")
    assert(nCompact < nSmall && nCompact >= 1,
      s"compaction must reduce the file count: $nSmall -> $nCompact")
  }

  test("sink_sorted: per-file o_orderdate ranges are disjoint (skippable layout)") {
    SparkEntry.queries("sink_sorted")(spark, sf).collect() // runs the write
    val ranges = spark.read.parquet(Sources.tmp(sf, "sorted"))
      .select(input_file_name().as("f"), col("o_orderdate"))
      .groupBy("f")
      .agg(min("o_orderdate").cast("string").as("lo"),
           max("o_orderdate").cast("string").as("hi"))
      .collect()
      .map(r => (r.getString(1), r.getString(2))) // ISO strings sort correctly
      .sortBy(_._1)
    assert(ranges.size >= 2, "range repartition should produce multiple files")
    for (((_, hiA), (loB, _)) <- ranges.zip(ranges.tail)) {
      assert(hiA <= loB, s"file key ranges overlap: hi=$hiA > nextLo=$loB")
    }
  }

  test("src_text: line-oriented round-trip preserves every document") {
    val total = Sources.queries("src_text")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(total == graft.Tables.documents(spark, sf).count())
  }

  test("src_jdbc pushdown: filters reach the Derby-side WHERE clause") {
    SparkEntry.queries("src_jdbc")(spark, sf).collect() // creates ORDERS_SLICE
    val dbDir = new java.io.File(Sources.tmp(sf, "derby")).getAbsolutePath
    // the scan node's metadata (where PushedFilters print) is elided at
    // 100 chars by default — widen it so the assertion sees the full list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val df = spark.read.format("jdbc")
      .option("url", s"jdbc:derby:$dbDir")
      .option("dbtable", "ORDERS_SLICE")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
      .where(col("o_orderstatus") === "O" && col("o_totalprice") > 50000.0)
      .select(col("o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), s"no PushedFilters in JDBC scan:\n$plan")
    assert(plan.toLowerCase.contains("equalto(o_orderstatus,o)"),
      s"status equality not pushed to the DB:\n$plan")
    assert(plan.toLowerCase.contains("greaterthan(o_totalprice,50000.0)"),
      s"price range not pushed to the DB:\n$plan")
    assert(df.count() > 0, "pushed-down extract returned no rows")
  }

  test("src_binary: binaryFile length equals the payload byte count per doc") {
    val rows = Sources.queries("src_binary")(spark, sf).collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}: length metadata vs content bytes")
    }
  }
}
