package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** graft-store DSv2 writer (StoreSink.scala): the transactional properties
  * the sink_dsv2 oracle's happy path can't show — abort leaves the previous
  * committed generation intact, overwrite swaps and GCs atomically via the
  * manifest, and readers plan ONLY from the manifest (stray files are
  * invisible).
  */
class StoreSinkSpec extends SparkSpec {

  private val fmt = "graft.sources.StoreSink"
  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def df(ks: Range, grp: String): DataFrame = {
    import spark.implicits._
    ks.map(k => (k.toLong, grp, k.toLong * 100)).toDF("k", "grp", "amt_cents")
  }

  private def readBack(dir: String): Set[(Long, String, Long)] =
    spark.read.format(fmt).option("path", dir).load()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def freshDir(name: String): String = {
    val dir = s"target/tmp/storesink_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  test("overwrite round-trips; append unions; second overwrite replaces + GCs") {
    val dir = freshDir("modes")
    df(1 to 50, "a").write.format(fmt).mode("overwrite").option("path", dir).save()
    assert(readBack(dir) == (1 to 50).map(k => (k.toLong, "a", k * 100L)).toSet)

    df(51 to 80, "b").write.format(fmt).mode("append").option("path", dir).save()
    assert(readBack(dir).size == 80)

    val genOne = StoreSink.readManifest(new Path(dir), fs)
    df(1 to 5, "c").write.format(fmt).mode("overwrite").option("path", dir).save()
    assert(readBack(dir) == (1 to 5).map(k => (k.toLong, "c", k * 100L)).toSet)
    // replaced generation physically GC'd after the manifest swap
    genOne.foreach(f => assert(!fs.exists(new Path(dir, f)), s"stale file $f survived"))
  }

  test("failed job aborts cleanly: previous generation intact, staging gone") {
    val dir = freshDir("abort")
    df(1 to 30, "keep").write.format(fmt).mode("overwrite").option("path", dir).save()
    val before = readBack(dir)

    val boom = udf((k: Long) => if (k == 7L) throw new RuntimeException("boom") else k)
    val bad = df(1 to 30, "bad").withColumn("k", boom(col("k")))
    intercept[Exception] {
      bad.write.format(fmt).mode("overwrite").option("path", dir).save()
    }
    assert(readBack(dir) == before, "aborted write mutated the committed state")
    assert(!fs.exists(new Path(dir, StoreSink.Staging)), "staging dir leaked")
  }

  test("readers plan from the manifest only — stray files are invisible") {
    val dir = freshDir("stray")
    df(1 to 10, "a").write.format(fmt).mode("overwrite").option("path", dir).save()
    val stray = new Path(dir, "part-stray-file")
    val out = fs.create(stray, true)
    out.write("999,zzz,999\n".getBytes("UTF-8")); out.close()
    assert(readBack(dir) == (1 to 10).map(k => (k.toLong, "a", k * 100L)).toSet)
  }

  test("null columns and URL-unsafe strings round-trip") {
    import spark.implicits._
    val dir = freshDir("nulls")
    val rows = Seq(
      (Some(1L), Some("a,b\nc%d"), Some(5L)),
      (None, Some("\\N"), None),
      (Some(3L), None, Some(-7L)))
    rows.toDF("k", "grp", "amt_cents")
      .write.format(fmt).mode("overwrite").option("path", dir).save()
    val got = spark.read.format(fmt).option("path", dir).load()
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == rows.map { case (k, g, a) => (k, g, a) }.toSet)
  }
}
