package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class StructuredFuncsSpec extends SparkSpec {

  test("q_hash_funcs: digests well-formed, codecs round-trip") {
    val rows = StructuredFuncs.queries("q_hash_funcs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1).matches("[0-9a-f]{32}"), "md5 must be 32 lowercase hex chars")
      assert(r.getString(2).matches("[0-9a-f]{64}"), "sha256 must be 64 lowercase hex chars")
      assert(r.getString(3).matches("[0-9A-F]+"), "Spark hex renders uppercase")
      assert(r.getBoolean(4) && r.getBoolean(6), "hex/base64 round-trips must hold")
    }
  }

  test("Spark-only digests (no DuckDB twin): xxhash64/crc32 stable and partition-invariant") {
    val a = Tables.part(spark, sf)
      .select(col("p_partkey"), xxhash64(col("p_name")).as("x"), crc32(col("p_name")).as("c"))
      .orderBy(col("p_partkey")).collect()
    val b = Tables.part(spark, sf).repartition(7)
      .select(col("p_partkey"), xxhash64(col("p_name")).as("x"), crc32(col("p_name")).as("c"))
      .orderBy(col("p_partkey")).collect()
    assert(a.sameElements(b), "digests must not depend on physical layout")
  }

  test("q_struct_funcs: to_json renders the struct it was built from") {
    val rows = StructuredFuncs.queries("q_struct_funcs")(spark, sf).limit(50).collect()
    rows.foreach { r =>
      assert(r.getString(3) == s"""{"k":${r.getLong(1)},"p":"${r.getString(2)}"}""")
    }
  }

  test("q_csv_funcs: from_csv(to_csv(x)) == x on every field") {
    val bad = StructuredFuncs.queries("q_csv_funcs")(spark, sf)
      .where(!col("rt_ok")).count()
    assert(bad == 0)
  }

  test("q_xml_funcs: xpath extraction equals the values the XML was built from") {
    val got = StructuredFuncs.queries("q_xml_funcs")(spark, sf).collect()
    val src = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    got.foreach { r =>
      val (nm, nk) = src(r.getLong(0))
      assert(r.getString(1) == nm && r.getInt(2) == nk)
      assert(r.getInt(4) == 2, "node-list must see both <v> elements")
      assert(r.getString(5) == s"$nk,${r.getLong(0)}")
    }
  }

  test("q_seq_funcs: generators produce the declared lengths") {
    StructuredFuncs.queries("q_seq_funcs")(spark, sf).collect().foreach { r =>
      val k = r.getInt(0)
      assert(r.getString(1).split(",").length == k % 5 + 2)
      assert(r.getInt(2) == 5)
      assert(r.getString(3).split(",").length == 3)
      assert(r.getString(5).split(",").length == 3)
    }
  }
}
