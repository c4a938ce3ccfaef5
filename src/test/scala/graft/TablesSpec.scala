package graft

import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, LongType}

/** Pins the `events.ts` normalization contract (Tables.events scaladoc): the
  * driver has regenerated testdata with different physical ts encodings
  * across rounds — TIMESTAMP(NANOS) (rounds 1-6, reads as long under
  * nanosAsLong) then TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 7,
  * reads as TIMESTAMP_NTZ). Every downstream op (`unix_micros`, watermarks,
  * window()) requires TIMESTAMP (TZ); BENCH_r05 lost five queries to an
  * unnormalized NTZ column. This spec fails on any future encoding drift
  * before the driver's gate does.
  */
class TablesSpec extends SparkSpec {

  test("events.ts normalizes to TIMESTAMP (TZ) on every tier") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt == TimestampType, s"$dir events.ts normalized to $dt, want TimestampType")
    }
  }

  test("normalization covers both historical physical encodings") {
    import org.apache.spark.sql.functions._
    val base = Tables.events(spark, sf).limit(10)
    // NTZ round-trip: writing ts as NTZ and re-normalizing must restore TZ
    // with identical wall-clock micros (sessions run UTC).
    val ntz = base.withColumn("ts", col("ts").cast(TimestampNTZType))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val renorm = ntz.withColumn("ts", col("ts").cast(TimestampType))
    val a = base.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    val b = renorm.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "NTZ→TZ cast changed wall-clock micros")
    // long-nanos path: micros = nanos div 1000 truncation, same as DuckDB's
    // ns→µs read (rule D2).
    val nanos = base.select((unix_micros(col("ts")) * 1000L).as("ts_ns"))
    val viaLong = nanos.select(timestamp_micros(expr("ts_ns div 1000")).as("ts"))
    assert(viaLong.schema("ts").dataType == TimestampType)
  }
}
