package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics under explicit micro-batch control (SURVEY §5.2):
  * in-order → late-within-watermark → late-beyond-watermark, plus
  * cross-batch state continuity for the arbitrary-state operator. */
class StreamOpsSpec extends SparkSpec {
  import StreamOps.Ev

  private def ev(id: Long, minute: Int, user: Long = 1L, typ: String = "click"): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"),
       user, typ, 10.0, "{}")

  private def startTumble(mem: MemoryStream[Ev], name: String) =
    StreamOps.tumbleTransform(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"target/tmp/chk_spec_$name")
      .start()

  test("watermark: late-but-within counts; late-beyond-watermark dropped") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val name = "spec_tumble_" + System.nanoTime
    val mem = MemoryStream[Ev]
    val q = startTumble(mem, name)
    try {
      // batch 1: events in hour 0 and hour 2 → watermark → 02:30-10min
      mem.addData(ev(1, 10), ev(2, 20), ev(3, 150))
      q.processAllAvailable()
      // batch 2: late event at 00:30 — hour-0 window already finalized
      // (watermark 02:20 > 01:00) → must be DROPPED
      mem.addData(ev(4, 30))
      q.processAllAvailable()
      // batch 3: advance watermark far so remaining windows flush
      mem.addData(ev(5, 600))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("hstart").cast("string"), col("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("2024-01-01 00:00:00") == 2L, s"late event must not count: $rows")
      assert(rows("2024-01-01 02:00:00") == 1L)
    } finally q.stop()
  }

  test("streaming tumble over fully-delivered stream equals batch twin") {
    // s_tumble_wm on the real events table vs q_tumble_batch truncated at the
    // final watermark — equivalence of streaming and batch semantics.
    val streamed = StreamOps.queries("s_tumble_wm")(spark, sf).collect()
    val maxTs = graft.Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val cutoff = maxTs - 10L * 60 * 1000000
    val batch = graft.ops.TimeSeries.queries("q_tumble_batch")(spark, sf)
      .where(unix_micros(col("hstart").cast("timestamp")) + 3600000000L <= cutoff)
      .collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.nonEmpty)
  }

  test("stateful sequence numbers continue across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val name = "spec_seq_" + System.nanoTime
    val mem = MemoryStream[Ev]
    val q = StreamOps.seqTransform(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"target/tmp/chk_spec_$name")
      .start()
    try {
      mem.addData(ev(1, 1, user = 7), ev(2, 2, user = 7))
      q.processAllAvailable()
      mem.addData(ev(3, 3, user = 7), ev(4, 1, user = 8))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(rows == Map((7L, 1L) -> 1L, (7L, 2L) -> 2L, (7L, 3L) -> 3L, (8L, 4L) -> 1L))
    } finally q.stop()
  }

  test("stream-stream interval self-join equals the batch interval join") {
    val streamed = StreamOps.queries("s_join_stream")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.ops.TimeSeries.queries("q_join_range")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("s_session_win sessions are consistent with batch gaps-and-islands") {
    val streamed = StreamOps.queries("s_session_win")(spark, sf)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    val batchTotal = graft.Tables.events(spark, sf).count()
    // streaming emits only watermark-finalized sessions → subset of events
    assert(streamed > 0 && streamed <= batchTotal)
  }

  test("s_join_outer: matched pairs equal the batch join; null rows only below watermark") {
    val rows = StreamOps.queries("s_join_outer")(spark, sf).collect()
    val matched = rows.filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3).getTime))
    val purchases = ev.filter(_._3 == "purchase")
    val clicks = ev.filter(_._3 == "click")
    val batchPairs = (for {
      p <- purchases
      c <- clicks
      if c._2 == p._2 && c._4 >= p._4 - 600000L && c._4 < p._4
    } yield (p._1, c._1)).toSet
    assert(matched == batchPairs, "inner matches must not wait on the watermark")
    val wm = math.min(purchases.map(_._4).max, clicks.map(_._4).max) - 600000L
    val nullIds = rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    val expectNull = purchases.filter(p => p._4 < wm && !batchPairs.exists(_._1 == p._1)).map(_._1).toSet
    assert(nullIds == expectNull, "outer rows are exactly the watermark-evicted unmatched purchases")
  }

  // The s_tws_timers ORACLE hard-codes two observed timer semantics; both
  // must fail HERE (with values) if a Spark upgrade changes them.
  test("s_tws_timers: timer fires when expiry EQUALS the watermark (<=)") {
    val out = StreamOps.probeChunks(spark, Seq(
      Seq(ev(1, 0, user = 1L)),          // user 1: timer at 00:30
      Seq(ev(2, 40, user = 2L))))        // watermark becomes 00:30 exactly
    val rows = out.collect().map(r => (r.getLong(0), r.getString(4))).toSeq.sorted
    // user 1's timer (00:30) == watermark (00:30) → fires; user 2's open
    // session (timer 01:10 > watermark) must stay unemitted
    assert(rows == Seq((1L, "timer")), s"boundary semantics drifted: $rows")
  }

  test("s_tws_timers: gap evidence beats a timer that only expires with the same chunk's data") {
    val out = StreamOps.probeChunks(spark, Seq(
      // chunk 1 (max 00:20 → W1 = 00:10): no timer can fire
      Seq(ev(1, 0, user = 1L), ev(2, 5, user = 1L),
          ev(3, 0, user = 2L), ev(4, 20, user = 9L)),
      // chunk 2 (max 02:00 → W2 = 01:50): u1's new event gap-closes session
      // A during INPUT, before u1's old timer (00:35 ≤ W2) could ever fire
      // — the watermark that would fire it only exists after this batch;
      // u2 (00:30) and u9 (00:50) fire by timer; u1's session B (timer
      // 02:30 > W2) stays open
      Seq(ev(5, 120, user = 1L))))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4))).toSeq.sorted
    assert(rows == Seq((1L, 2L, "gap"), (2L, 1L, "timer"), (9L, 1L, "timer")),
      s"gap/timer attribution drifted: $rows")
  }

  // The s_join_outer ORACLE hard-codes Spark's observed watermark
  // propagation: global watermark = LEAST of the per-side max ts − 10 min
  // (each side's watermark tracks its OWN event_type-filtered feed). If a
  // Spark upgrade changes propagation, this must fail HERE with the actual
  // watermark value — not downstream as an opaque oracle hash mismatch.
  test("s_join_outer: final query watermark equals LEAST(side maxes) - 10 min") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    // purchase side max = 03:00, click side max = 04:00 → watermark must
    // follow the SLOWER (purchase) side: 03:00 - 10 min = 02:50.
    mem.addData(ev(1, 60, typ = "purchase"), ev(2, 180, typ = "purchase"),
                ev(3, 55), ev(4, 240))
    val name = "spec_wm_probe_" + System.nanoTime
    val q = StreamOps.outerJoinTransform(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"target/tmp/chk_$name")
      .start()
    try {
      q.processAllAvailable()
      val wm = java.time.Instant.parse(q.lastProgress.eventTime.get("watermark"))
      val expected = java.time.Instant.parse("2024-01-01T02:50:00Z")
      assert(wm == expected,
        s"watermark propagation drifted: got $wm, oracle assumes $expected")
    } finally q.stop()
  }
}
