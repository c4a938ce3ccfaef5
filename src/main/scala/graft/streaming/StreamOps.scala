package graft.streaming

import java.util.UUID

import graft.Tables
import graft.ops.OpModule
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, Trigger}

/** SURVEY.md §2.8 — Structured Streaming operators (`s_*`).
  *
  * Each query simulates unbounded ingest of the `events` table through a
  * `MemoryStream` (or the file source for the sink test), runs the streaming
  * query to completion (`processAllAvailable`), and returns the sink contents
  * as a batch DataFrame — so the driver's Verify/Bench harness can execute
  * streaming semantics through its batch contract. Determinism: with the
  * full dataset in one batch, the watermark advances once (to max(ts) − wm)
  * and a final empty micro-batch flushes exactly the windows whose end ≤
  * watermark — a pure function of the data, hence oracle-able in SQL.
  *
  * Scale posture: state is keyed by (window[, key]) or user_id — bounded by
  * key cardinality, evicted by watermark; RocksDB state store is the knob at
  * production scale (`spark.sql.streaming.stateStore.providerClass`), the
  * logic is identical. The MemoryStream feed is test scaffolding only; a
  * production deployment swaps `readStream.format("kafka"|"parquet")` for
  * the same transform functions.
  */
object StreamOps extends OpModule {

  /** events row for the typed MemoryStream feed. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double, props: String)

  /** Collected feed rows per sfDir — memoized: the collect is test-harness
    * scaffolding (a production source is Kafka/files), and re-reading 100k
    * rows for every one of the 8 s_* builders × bench passes just times the
    * fixture, not the streaming operator. ~10 MB per sfDir. */
  private val eventsCache = scala.collection.mutable.Map[String, Seq[Ev]]()

  private def loadEvents(s: SparkSession, d: String): Seq[Ev] =
    eventsCache.getOrElseUpdate(d, {
      import s.implicits._
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
                col("value"), col("props"))
        .as[Ev].collect().toSeq
    })

  /** Stateful streaming parallelism: the number of state-store instances per
    * stateful operator is frozen to `spark.sql.shuffle.partitions` at query
    * START (it is baked into the checkpoint), so it must be sized to the
    * stream's key cardinality and per-batch volume — NOT inherited from the
    * session's batch default. These feeds are one ~100k-row micro-batch;
    * 32 stores would each hold ~3k keys and pay 32× the per-batch
    * commit/snapshot fixed cost. A production deployment of the same
    * transforms picks this per-query number the same way (keys × state row
    * size / target store size), just with a larger answer.
    *
    * Default is 4 (was 8): a stream-stream join commits 4 state stores per
    * partition per micro-batch, so the flush-batch fixed cost scales with
    * partitions — measured on s_join_outer at sf0.1: 8 parts 3.4 s, 4 parts
    * 2.5 s, 2 parts 2.5 s (s_tumble_wm 1.8 → 1.4 s). RocksDB
    * (SPARK_GRAFT_STREAM_ROCKSDB=1) was measured SLOWER here (3.6 s): its
    * native-store fixed cost only pays off when state outgrows the heap —
    * that is the production knob at real volume, not at harness scale. */
  private def withStreamParallelism[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    // getOption on a registered SQL conf always yields its default, so a
    // plain get + set round-trip is the whole restore story
    val prev = s.conf.get(key)
    val prevProv = s.conf.get(provKey)
    s.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
    if (sys.env.get("SPARK_GRAFT_STREAM_ROCKSDB").contains("1"))
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally {
      s.conf.set(key, prev)
      // restore, don't leak: sibling queries must keep the session default
      s.conf.set(provKey, prevProv)
    }
  }

  /** Stream the events parquet through `transform` via the FILE source —
    * the production-shaped feed for single-batch ops: executors read the
    * parquet directly, so there is no driver-side collect and no feed data
    * embedded in task binaries (the MemoryStream path ships the whole batch
    * as a ~9 MB task broadcast at sf0.1 — Spark warns on every stage).
    * All files arrive in the first micro-batch (no maxFilesPerTrigger), so
    * watermark semantics are identical to the one-batch MemoryStream feed. */
  /** The one copy of the file-source stream-run protocol: schema probe,
    * glob-filtered streaming read, memory sink under a fresh name,
    * checkpoint, run-to-completion inside the parallelism scope. Every
    * file-fed s_* op goes through here so a protocol fix lands once. */
  private def runStreamRaw(s: SparkSession, dir: String, glob: String,
                           mode: OutputMode)
                          (transform: DataFrame => DataFrame): DataFrame = {
    val schema = s.read.option("pathGlobFilter", glob).parquet(dir).schema
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
    val name = "s_" + UUID.randomUUID.toString.replace("-", "")
    withStreamParallelism(s) {
      val q = transform(raw)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", s"target/tmp/chk_$name")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(name)
  }

  private def runStreamFile(s: SparkSession, d: String, mode: OutputMode)
                           (transform: Dataset[Ev] => DataFrame): DataFrame = {
    import s.implicits._
    // Raw file schema under nanosAsLong (ts arrives as long nanos), then the
    // same ns→µs conversion Tables.events applies for batch reads.
    // A path ending in '/' is a prepared feed dir (all parquet files in it);
    // otherwise d is an sf dir and only its events.parquet streams.
    val (dir, glob) =
      if (d.endsWith("/")) (d.dropRight(1), "*.parquet")
      else (d, "events.parquet")
    runStreamRaw(s, dir, glob, mode) { raw =>
      transform(normTs(raw).as[Ev])
    }
  }

  /** Same ts normalization as Tables.events: long nanos (nanosAsLong era)
    * or TIMESTAMP_NTZ (round-7 µs regen) → TIMESTAMP; sessions run UTC so
    * the NTZ cast preserves wall-clock values. */
  private def normTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }

  /** Two INDEPENDENT file-source streams over the same events parquet — the
    * multi-source topology (`readStream ∪ readStream`) that one raw stream
    * cannot express. Each source gets its own offset log entry in the shared
    * checkpoint; the union is planned as one streaming query. */
  private def runStreamFilePair(s: SparkSession, d: String, mode: OutputMode)
      (transform: (Dataset[Ev], Dataset[Ev]) => DataFrame): DataFrame = {
    import s.implicits._
    val (dir, glob) =
      if (d.endsWith("/")) (d.dropRight(1), "*.parquet")
      else (d, "events.parquet")
    val schema = s.read.option("pathGlobFilter", glob).parquet(dir).schema
    def feed(): Dataset[Ev] =
      normTs(s.readStream.schema(schema).option("pathGlobFilter", glob)
        .parquet(dir)).as[Ev]
    val name = "s_" + UUID.randomUUID.toString.replace("-", "")
    withStreamParallelism(s) {
      val q = transform(feed(), feed())
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", s"target/tmp/chk_$name")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(name)
  }

  /** Feed `chunks` as SEPARATE micro-batches (processAllAvailable between
    * adds — each add is its own batch, so the watermark ADVANCES between
    * chunks; the single-batch runners can never observe a mid-stream
    * watermark). The runner for late-arrival semantics. */
  private def runStreamChunks(s: SparkSession, chunks: Seq[Seq[Ev]],
                              mode: OutputMode)
                             (transform: Dataset[Ev] => DataFrame): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ev]
    val name = "s_" + UUID.randomUUID.toString.replace("-", "")
    withStreamParallelism(s) {
      val q = transform(mem.toDS())
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", s"target/tmp/chk_$name")
        .start()
      try chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      finally q.stop()
    }
    s.table(name)
  }

  /** Feed `rows` through `transform` as one micro-batch, run to completion
    * (plus the watermark-flush batch), return the memory sink as a DataFrame.
    * Kept for ops whose feed the file source cannot express (duplicated rows
    * for s_dedup_wm, chunked multi-batch arrival for s_foreach_batch). */
  private def runStream(s: SparkSession, rows: Seq[Ev], mode: OutputMode)
                       (transform: Dataset[Ev] => DataFrame): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows)
    val name = "s_" + UUID.randomUUID.toString.replace("-", "")
    withStreamParallelism(s) {
      val q = transform(mem.toDS())
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", s"target/tmp/chk_$name")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(name)
  }

  /** Streaming tumbling agg with a 10-min watermark (append mode). */
  def tumbleTransform(ds: Dataset[Ev]): DataFrame =
    ds.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.ops.Det.moneySum(col("value")).as("val_cents"))
      .select(col("w.start").cast("timestamp_ntz").as("hstart"),
              col("event_type"), col("n"), col("val_cents"))

  /** Streaming sliding windows (1 h every 15 min) with a 10-min watermark. */
  def slideTransform(ds: Dataset[Ev]): DataFrame =
    ds.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), graft.ops.Det.moneySum(col("value")).as("val_cents"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
              col("n"), col("val_cents"))

  /** Stream–stream interval self-join: pairs of one user's events within
    * 10 min (streaming twin of q_join_range). Both sides carry watermarks +
    * the time-range condition, which is what lets Spark evict join state —
    * the unbounded-state trap this op exists to demonstrate avoiding. Inner
    * joins emit matches as soon as both rows arrived (no watermark wait), so
    * with the full feed the output equals the batch interval join. */
  def streamJoinTransform(ds: Dataset[Ev]): DataFrame = {
    val a = ds.select(col("user_id"), col("ts").as("ts_a"), col("event_id").as("id_a"))
      .withWatermark("ts_a", "10 minutes")
    val b = ds.select(col("user_id").as("uid_b"), col("ts").as("ts_b"), col("event_id").as("id_b"))
      .withWatermark("ts_b", "10 minutes")
    a.join(b, col("user_id") === col("uid_b") &&
              col("ts_b") > col("ts_a") &&
              col("ts_b") <= col("ts_a") + expr("INTERVAL 10 MINUTES"))
      .select(col("id_a"), col("id_b"))
  }

  /** Stream–stream LEFT SEMI join: purchases preceded by a same-user click
    * within 10 minutes — existence, not enrichment: each purchase emits AT
    * MOST ONCE regardless of how many clicks matched (the dedup the inner
    * join's match product doesn't give), and the click side's state is
    * probe-only (no click columns ever ship). State eviction follows the
    * same per-side watermark rules as the inner join. */
  def semiJoinTransform(ds: Dataset[Ev]): DataFrame = {
    val p = ds.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("ts_p"), col("event_id").as("id_p"))
      .withWatermark("ts_p", "10 minutes")
    val c = ds.where(col("event_type") === "click")
      .select(col("user_id").as("uid_c"), col("ts").as("ts_c"))
      .withWatermark("ts_c", "10 minutes")
    p.join(c, col("user_id") === col("uid_c") &&
              col("ts_p") > col("ts_c") &&
              col("ts_p") <= col("ts_c") + expr("INTERVAL 10 MINUTES"), "left_semi")
      .select(col("id_p"), col("user_id"))
  }

  /** Stream–stream LEFT OUTER join: each purchase picks up clicks by the
    * same user in the preceding 10 minutes; purchases with NO such click
    * must still emit — but only once the watermark proves no matching click
    * can still arrive (right watermark past the purchase ts). That wait is
    * the semantic difference from the inner join above: outer rows are a
    * WATERMARK PRODUCT, not a match product, so the final watermark
    * (max ts − 10 min) decides which unmatched purchases surface and which
    * stay in state — pinned exactly by the oracle's wm predicate. */
  def outerJoinTransform(ds: Dataset[Ev]): DataFrame = {
    val p = ds.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("ts_p"), col("event_id").as("id_p"))
      .withWatermark("ts_p", "10 minutes")
    val c = ds.where(col("event_type") === "click")
      .select(col("user_id").as("uid_c"), col("ts").as("ts_c"), col("event_id").as("id_c"))
      .withWatermark("ts_c", "10 minutes")
    p.join(c, col("user_id") === col("uid_c") &&
              col("ts_c") >= col("ts_p") - expr("INTERVAL 10 MINUTES") &&
              col("ts_c") < col("ts_p"), "left_outer")
      .select(col("id_p"), col("id_c"))
  }

  /** Native streaming session windows (30-min gap) per user. */
  def sessionTransform(ds: Dataset[Ev]): DataFrame =
    ds.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").cast("timestamp_ntz").as("sess_start"),
              col("n_events"))

  /** Streaming dedup by event_id within the watermark. */
  def dedupTransform(ds: Dataset[Ev]): DataFrame =
    ds.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Custom per-user state: monotonically increasing event sequence numbers
    * maintained in GroupState across micro-batches (mapGroupsWithState
    * family — the arbitrary-state surface). Rows within a batch are ordered
    * by (ts, event_id) inside the function so output is deterministic. */
  def seqTransform(ds: Dataset[Ev]): DataFrame = {
    val s = ds.sparkSession
    import s.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[Long]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val start = state.getOption.getOrElse(0L)
          state.update(start + sorted.size)
          // seq stays Long end-to-end: the state legitimately exceeds Int
          // range for a hot key at production scale
          sorted.iterator.zipWithIndex.map { case (e, i) =>
            (user, e.event_id, start + i + 1)
          }
      }
      .toDF("user_id", "event_id", "seq")
  }

  /** Arbitrary state v2 (`transformWithState`, Spark 4): per-user count of
    * purchases since the user's last error, kept in a `ValueState[Int]` that
    * survives micro-batches (RocksDB-backed — the production state store).
    * In-batch rows are sorted by (ts, event_id) so output is deterministic
    * and oracle-able as segment-local ROW_NUMBERs in SQL. */
  class PurchasesSinceErrorProcessor
      extends StatefulProcessor[Long, Ev, (Long, Long, Int)] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Int] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Int]("cnt",
        org.apache.spark.sql.Encoders.scalaInt, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[(Long, Long, Int)] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var c = if (count.exists()) count.get() else 0
      val out = Seq.newBuilder[(Long, Long, Int)]
      sorted.foreach { e =>
        e.event_type match {
          case "error"    => c = 0
          case "purchase" => c += 1; out += ((key, e.event_id, c))
          case _          => ()
        }
      }
      count.update(c)
      out.result().iterator
    }
  }

  def purchasesSinceErrorTransform(ds: Dataset[Ev]): DataFrame = {
    val s = ds.sparkSession
    import s.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new PurchasesSinceErrorProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "event_id", "n_since_error")
  }

  /** Timer-driven sessionization (`transformWithState` + EVENT-TIME TIMERS —
    * the timer surface no other s_* op exercises): per user, a running
    * session (start, end, count) lives in a ValueState; sessions closed by
    * EVIDENCE (a later event ≥ 30 min after the current end) emit
    * immediately from handleInputRows, and each batch re-arms one event-time
    * timer at end+30 min so the user's OPEN tail session emits from
    * handleExpiredTimer once the watermark proves no event can extend it
    * (late rows below the watermark never reach the processor, and any
    * surviving event is past end+30 min by then — the eviction argument).
    * Timer bookkeeping: the previous timer is deleted before the new one is
    * registered, so a session extended in batch N can never be closed by
    * batch N−1's stale timer. */
  class SessionTimerProcessor
      extends StatefulProcessor[Long, Ev, (Long, Long, Long, Long, String)] {
    private val GapUs = 1800000000L // 30 min
    @transient private var sess:
      org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _

    private def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000 + t.getNanos / 1000
    private def timerMsOf(endUs: Long): Long = endUs / 1000 + 1800000

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("sess",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[(Long, Long, Long, Long, String)] = {
      val evs = rows.map(e => micros(e.ts)).toArray
      java.util.Arrays.sort(evs)
      if (evs.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[(Long, Long, Long, Long, String)]
      var (st, en, cnt) =
        if (sess.exists()) { val v = sess.get(); getHandle.deleteTimer(timerMsOf(v._2)); v }
        else (-1L, -1L, 0L)
      evs.foreach { m =>
        if (st < 0) { st = m; en = m; cnt = 1 }
        else if (m - en >= GapUs) {
          out += ((key, st, en, cnt, "gap")) // closed by evidence — final now
          st = m; en = m; cnt = 1
        } else { en = math.max(en, m); cnt += 1 }
      }
      sess.update((st, en, cnt))
      getHandle.registerTimer(timerMsOf(en))
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long, String)] =
      if (sess.exists()) {
        val (st, en, cnt) = sess.get()
        sess.clear()
        Iterator.single((key, st, en, cnt, "timer"))
      } else Iterator.empty
  }

  def sessionTimerTransform(ds: Dataset[Ev]): DataFrame = {
    val s = ds.sparkSession
    import s.implicits._
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "sess_start_us", "sess_end_us", "n_events", "closed_by")
      .select(col("user_id"),
        timestamp_micros(col("sess_start_us")).cast("timestamp_ntz").as("sess_start"),
        timestamp_micros(col("sess_end_us")).cast("timestamp_ntz").as("sess_end"),
        col("n_events"), col("closed_by"))
  }

  /** Day-truncated min event time (ms) — the anchor every chunk/restart
    * boundary derives from, so a driver regen that shifts the corpus's time
    * span moves the boundaries with it (ADVICE r6: hard-coded 2024-01
    * instants would degenerate the chunking on a shifted span). Mirrored in
    * the s_tws_timers oracle as DATE_TRUNC('day', MIN(ts)). */
  private def minDayMs(evs: Seq[Ev]): Long =
    evs.iterator.map(_.ts.getTime).min / 86400000L * 86400000L

  /** The events feed split into three micro-batches at derived boundaries
    * (days 10 and 20 past the day-truncated min ts — the corpus spans ~30
    * days) — every chunk's rows are ≥ 10 min past the previous chunk's max
    * ts, so the watermark advances between batches and no row is ever late.
    * Shared by the ops that need cross-batch state/watermark motion
    * (s_tws_timers, s_freq_items). */
  private def chunkEvents(s: SparkSession, d: String): Seq[Seq[Ev]] = {
    val evs = loadEvents(s, d)
    val day0 = minDayMs(evs)
    val t1 = day0 + 10L * 86400000L
    val t2 = day0 + 20L * 86400000L
    Seq(evs.filter(_.ts.getTime < t1),
        evs.filter(e => e.ts.getTime >= t1 && e.ts.getTime < t2),
        evs.filter(_.ts.getTime >= t2))
  }

  /** Chunked feed for dropDuplicatesWithinWatermark: the s_tws_timers chunk
    * boundaries, with every (user, event_type, chunk) group collapsed to
    * ONE row at the group's min ts. Within a batch, "first arrival wins" is
    * partition-order nondeterministic when duplicate payloads differ; the
    * normalization makes in-batch duplicates identical, so the oracle's
    * replay is exact while the CROSS-batch semantics (state liveness,
    * eviction, re-emission) stay fully exercised. */
  private def dedupWmChunks(s: SparkSession, d: String): Seq[Seq[Ev]] = {
    val evs = loadEvents(s, d)
    val day0 = minDayMs(evs)
    def c(e: Ev): Int = {
      val t = e.ts.getTime
      if (t < day0 + 10L * 86400000L) 0
      else if (t < day0 + 20L * 86400000L) 1 else 2
    }
    val grouped = evs.groupBy(e => (e.user_id, e.event_type, c(e))).toSeq
      .map { case ((u, t, ck), rs) =>
        val mn = rs.minBy(_.ts.getTime).ts
        (ck, Ev(0L, mn, u, t, 0.0, ""))
      }
    (0 to 2).map(ck => grouped.filter(_._1 == ck).map(_._2))
  }

  /** `dropDuplicatesWithinWatermark` — TTL'd streaming dedup: state for a
    * key lives only `delay` past its FIRST row's event time, so the state
    * footprint is bounded by keys-per-delay-window (contrast
    * dropDuplicates' forever-state in s_doc_dedup). EXACT semantics, pinned
    * by probe and encoded in the oracle's replay:
    *   - a key is LIVE while first_ts_µs + delay_µs > wm_µs, STRICTLY —
    *     at equality the state is already evicted for the same batch;
    *   - wm_µs = (floor(max-prior-event-µs / 1000) − delay_ms) · 1000: the
    *     watermark is millisecond-floored, the expiry keeps microseconds;
    *   - a DROPPED duplicate never refreshes the expiry (first-arrival
    *     semantics); a re-arrival after eviction emits again and opens a
    *     fresh window at its own event time;
    *   - a batch's rows only move the watermark used AFTER that batch. */
  def dedupWithinWmTransform(ds: Dataset[Ev]): DataFrame =
    ds.withWatermark("ts", "3 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

  /** Test/probe access to the chunked runner with the timer transform —
    * StreamOpsSpec pins the exact timer-vs-watermark boundary semantics the
    * s_tws_timers oracle encodes. */
  private[graft] def probeChunks(s: SparkSession, chunks: Seq[Seq[Ev]]): DataFrame = {
    // transformWithState needs the multi-column-family (RocksDB) provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try runStreamChunks(s, chunks, OutputMode.Append())(sessionTimerTransform)
    finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None    => s.conf.unset(key)
    }
  }

  /** Stream–static join: each micro-batch of the event stream joins the
    * (bounded, broadcast) customer dimension — the canonical enrichment
    * shape at scale: the dim is re-broadcast per batch, the stream side
    * never shuffles, and the join is stateless (no watermark, no state
    * store). */
  def staticJoinTransform(dim: DataFrame)(ds: Dataset[Ev]): DataFrame =
    ds.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))

  /** Reduce a (user_id, ts, event_id, value) frame to the latest row per
    * user — the upsert step of the foreachBatch merge sink. */
  private def lastPerUser(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(max_by(struct(col("ts"), col("event_id"), col("value")),
                  struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.ts").as("ts"),
              col("m.event_id").as("event_id"), col("m.value").as("value"))

  /** foreachBatch merge sink: the feed arrives in three micro-batches; each
    * batch is reduced to its latest row per user and MERGEd into a
    * batchId-versioned parquet state (read previous version, union, reduce,
    * write next version). This is the exactly-once upsert escape hatch
    * Structured Streaming offers when the sink has no transactional MERGE —
    * in production the body becomes one Delta/Iceberg `MERGE INTO`, with
    * batchId-versioned writes keeping retries idempotent. Final state must
    * equal the batch "latest event per user", which is the oracle. */
  private def foreachBatchMerge(s: SparkSession, d: String): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val evs = loadEvents(s, d).sortBy(e => (e.ts.getTime, e.event_id))
    val chunks = evs.grouped(math.max(1, (evs.size + 2) / 3)).toSeq
    val base = s"target/tmp/fb_${java.lang.Integer.toHexString(d.hashCode)}"
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    @volatile var stateVersion = -1L
    def statePath(v: Long) = s"$base/state_$v"
    val mem = MemoryStream[Ev]
    withStreamParallelism(s) {
      val q = mem.toDS().writeStream
        .foreachBatch { (batch: Dataset[Ev], batchId: Long) =>
          val bs = lastPerUser(batch.select(col("user_id"), col("ts"), col("event_id"), col("value")))
          val merged =
            if (stateVersion < 0) bs
            else lastPerUser(s.read.parquet(statePath(stateVersion)).unionByName(bs))
          merged.write.mode("overwrite").parquet(statePath(batchId))
          stateVersion = batchId
        }
        .option("checkpointLocation", s"$base/chk")
        .start()
      try chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      finally q.stop()
    }
    s.read.parquet(statePath(stateVersion))
      .select(col("user_id"), col("event_id").as("last_event"),
              graft.ops.Det.cents(col("value")).as("val_cents"))
      .orderBy(col("user_id"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // THE §2.1 `src_stream` CONTRACT ROW, registered literally (verdict r9
    // #6): unbounded ingest of events-shaped records arriving over MULTIPLE
    // micro-batches (three event-id thirds — the MemoryStream scaffolding
    // stands in for Kafka/files, the round-2 posture), schema-normalized on
    // the way in, appended exactly once. The result audits the ingested
    // stream per type — counts, distinct ids, exact value cents — equal to
    // the batch table by the repeated-run/exactly-once contract the other
    // 38 s_* rows exercise per-operator.
    "src_stream" -> ((s, d) => {
      val rows = loadEvents(s, d).sortBy(_.event_id)
      val chunks = rows.grouped(math.max(1, (rows.size + 2) / 3)).toSeq
      runStreamChunks(s, chunks, OutputMode.Append())(ev =>
        ev.toDF().select(col("event_id"), col("user_id"), col("event_type"),
          expr("cast(round(value * 100) as bigint)").as("value_cents")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             countDistinct(col("event_id")).as("n_ids"),
             sum(col("value_cents")).as("cents"))
        .orderBy(col("event_type"))
    }),

    // Stateless enrichment: inner join emits per batch, so the full-feed
    // output equals the batch join — oracle-able directly.
    "s_static_join" -> ((s, d) => {
      val dim = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      runStreamFile(s, d, OutputMode.Append())(staticJoinTransform(dim))
        .orderBy(col("event_id"))
    }),

    "s_foreach_batch" -> ((s, d) => foreachBatchMerge(s, d)),

    // transformWithState requires the RocksDB state store provider; scope
    // the conf so sibling streaming queries keep the session default.
    "s_tws_running" -> ((s, d) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try
        runStreamFile(s, d, OutputMode.Append())(purchasesSinceErrorTransform)
          .orderBy(col("user_id"), col("event_id"))
      finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None    => s.conf.unset(key)
      }
    }),

    // Event-time TIMERS through transformWithState: three ts-partitioned
    // micro-batches advance the watermark between chunks, so tail sessions
    // of early-idle users fire mid-stream from handleExpiredTimer while
    // gap-closed sessions emit from handleInputRows — both paths land in
    // one output with their provenance pinned in closed_by. Chunk
    // boundaries derive from the corpus min ts (chunkEvents) and are ≥ 10
    // min past each chunk's max ts, so no feed row is ever late (the
    // late-DROP path is s_late_drop's).
    "s_tws_timers" -> ((s, d) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        runStreamChunks(s, chunkEvents(s, d), OutputMode.Append())(sessionTimerTransform)
          .orderBy(col("user_id"), col("sess_start"))
      } finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None    => s.conf.unset(key)
      }
    }),

    "s_tumble_wm" -> ((s, d) =>
      runStreamFile(s, d, OutputMode.Append())(tumbleTransform)
        .orderBy(col("hstart"), col("event_type"))),

    // Trigger.AvailableNow — the batch-over-streaming execution mode
    // production backfills use (process everything available in bounded
    // batches, advance the watermark, emit, STOP — no long-running query).
    // The query self-terminates (awaitTermination, not
    // processAllAvailable), and the no-data commit after the last batch
    // flushes windows the final watermark closed — so the output contract
    // is EXACTLY s_tumble_wm's, which is the oracle: any drift between
    // continuous and available-now execution of the same transform breaks
    // the hash.
    // Semi-join emission is match-driven (single-batch feed ⇒ output = the
    // batch EXISTS set), ordered by the purchase id.
    "s_join_semi" -> ((s, d) =>
      runStreamFile(s, d, OutputMode.Append())(semiJoinTransform)
        .orderBy(col("id_p"))),

    // Windowed-AGGREGATION state across a RESTART: run 1 drains the
    // pre-boundary half of the feed through the checkpoint (watermark holds
    // the boundary-spanning hour window as PARTIAL state), new files land,
    // run 2 recovers the same checkpoint and completes it — the final file
    // sink must equal continuous execution (s_tumble_wm's oracle verbatim).
    // The boundary is deliberately NOT hour-aligned (00:30), so one
    // window's count can only be right if run 2 merged into run 1's
    // recovered partial — the agg-state sibling of s_incr_dedup's
    // dedup-state recovery and s_incr_ingest's source-log recovery.
    "s_agg_restart" -> ((s, d) => {
      import s.implicits._
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/aggrst_$id"
      val feed = s"$base/feed"; val out = s"$base/out"; val chk = s"$base/chk"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = Tables.events(s, d)
      // mid-span restart boundary, derived (day 15 + 00:30 past the
      // day-truncated min ts — off-hour by construction)
      val mid = new java.sql.Timestamp(
        minDayMs(loadEvents(s, d)) + 15L * 86400000L + 1800000L)
      def land(cond: org.apache.spark.sql.Column): Unit =
        ev.where(cond).write.mode("append").parquet(feed)
      def runOnce(): Unit = withStreamParallelism(s) {
        val schema = s.read.parquet(feed).schema
        val src = s.readStream.schema(schema).parquet(feed)
        val q = tumbleTransform(normTs(src).as[Ev])
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", chk)
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      land(col("ts") < lit(mid)); runOnce()
      land(col("ts") >= lit(mid)); runOnce()
      s.read.parquet(out).orderBy(col("hstart"), col("event_type"))
    }),

    "s_trigger_avail" -> ((s, d) => {
      import s.implicits._
      val (dir, glob) =
        if (d.endsWith("/")) (d.dropRight(1), "*.parquet")
        else (d, "events.parquet")
      val schema = s.read.option("pathGlobFilter", glob).parquet(dir).schema
      val raw = s.readStream.schema(schema).option("pathGlobFilter", glob)
        .parquet(dir)
      val name = "s_" + UUID.randomUUID.toString.replace("-", "")
      withStreamParallelism(s) {
        val q = tumbleTransform(normTs(raw).as[Ev])
          .writeStream
          .format("memory")
          .queryName(name)
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", s"target/tmp/chk_$name")
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      s.table(name).orderBy(col("hstart"), col("event_type"))
    }),

    // Union of two INDEPENDENT streaming sources into one watermarked
    // windowed aggregate — the fan-in topology (N ingest feeds → one
    // query) every production deployment has. Each branch filters and
    // projects before the union; the watermark is declared ON THE UNION,
    // so the slowest branch gates window flush (min of source watermarks —
    // here both branches share a feed, making the flush rule identical to
    // s_tumble_wm's and the oracle exact). State is keyed by (window,
    // branch): bounded, watermark-evicted.
    "s_union_streams" -> ((s, d) =>
      runStreamFilePair(s, d, OutputMode.Append()) { (a, b) =>
        val clicks = a.where(col("event_type") === "click")
          .select(col("ts"), lit("click").as("branch"), col("value"))
        val purchases = b.where(col("event_type") === "purchase")
          .select(col("ts"), lit("purchase").as("branch"), col("value"))
        clicks.unionByName(purchases)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("branch"))
          .agg(count(lit(1)).as("n"),
               graft.ops.Det.moneySum(col("value")).as("val_cents"))
          .select(col("w.start").cast("timestamp_ntz").as("hstart"),
                  col("branch"), col("n"), col("val_cents"))
      }.orderBy(col("hstart"), col("branch"))),

    // Late-data DROP semantics, observed end to end: batch 1 carries every
    // on-time row (including the global max ts, so the watermark lands at
    // max − 10 min), batch 2 replays rows ≥ 2 h stale — each lands in a
    // window whose end is already ≤ the watermark, so the state was
    // evicted and Spark MUST drop the row (the numRowsDroppedByWatermark
    // path). The oracle aggregates ONLY the on-time partition: any dropped
    // row leaking into a count, or an on-time row mis-dropped, breaks the
    // hash. Needs the chunked runner — a single-batch feed can never
    // observe a mid-stream watermark.
    "s_late_drop" -> ((s, d) => {
      val evs = loadEvents(s, d)
      val maxTs = evs.iterator.map(_.ts.getTime).max
      val (late, onTime) = evs.partition(e =>
        e.ts.getTime < maxTs - 2 * 3600 * 1000L && e.event_id % 97 == 0)
      runStreamChunks(s, Seq(onTime, late), OutputMode.Append())(tumbleTransform)
        .orderBy(col("hstart"), col("event_type"))
    }),

    "s_session_win" -> ((s, d) =>
      runStreamFile(s, d, OutputMode.Append())(sessionTransform)
        .orderBy(col("user_id"), col("sess_start"))),

    "s_slide_wm" -> ((s, d) =>
      runStreamFile(s, d, OutputMode.Append())(slideTransform)
        .orderBy(col("wstart"))),

    // Update mode: every window version is emitted as state changes. With
    // the full feed in ONE batch each window is updated exactly once, so
    // the (deterministic) memory-sink contents equal the plain batch agg —
    // including windows the watermark hasn't finalized (the append/update
    // contrast with s_tumble_wm is the point of this op).
    "s_tumble_update" -> ((s, d) =>
      runStreamFile(s, d, OutputMode.Update())(tumbleTransform)
        .orderBy(col("hstart"), col("event_type"))),

    "s_join_stream" -> ((s, d) =>
      runStreamFile(s, d, OutputMode.Append())(streamJoinTransform)
        .orderBy(col("id_a"), col("id_b"))),

    "s_join_outer" -> ((s, d) =>
      runStreamFile(s, d, OutputMode.Append())(outerJoinTransform)
        .orderBy(col("id_p"), col("id_c").asc_nulls_first)),

    // Feed every event TWICE — as two binary copies of the events file in a
    // prepared feed dir (both arrive in the first micro-batch), so the
    // duplicated feed rides the file source like every other single-batch
    // op instead of a ~9 MB MemoryStream task broadcast. The op must emit
    // each event exactly once.
    "s_dedup_wm" -> ((s, d) => {
      val conf = s.sparkContext.hadoopConfiguration
      val fs = org.apache.hadoop.fs.FileSystem.get(conf)
      val src = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
      // Memoize keyed on a CONTENT fingerprint, not the path hash alone:
      // regenerating events.parquet in place must produce a fresh copy,
      // never silently reuse a stale one. len ^ mtime was not enough —
      // second-granularity mtimes can collide on same-length rewrites — so
      // the key also CRCs the file's last 64 KB (the parquet footer, which
      // carries row-group stats and changes with any content change).
      // toHexString also avoids the abs(Int.MinValue)-stays-negative edge.
      val st = fs.getFileStatus(src)
      val tailLen = math.min(65536L, st.getLen).toInt
      val tail = new Array[Byte](tailLen)
      val in = fs.open(src)
      try in.readFully(st.getLen - tailLen, tail) finally in.close()
      val crc = new java.util.zip.CRC32
      crc.update(tail)
      val dir = s"target/tmp/dupfeed_${d.hashCode.toHexString}_" +
        java.lang.Long.toHexString(st.getLen ^ (st.getModificationTime << 13) ^ crc.getValue)
      val base = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(new org.apache.hadoop.fs.Path(base, "events_b.parquet"))) {
        fs.mkdirs(base)
        for (n <- Seq("events_a.parquet", "events_b.parquet"))
          org.apache.hadoop.fs.FileUtil.copy(
            fs, src, fs, new org.apache.hadoop.fs.Path(base, n), false, true, conf)
      }
      runStreamFile(s, dir + "/", OutputMode.Append())(dedupTransform)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // TTL'd streaming dedup (dropDuplicatesWithinWatermark): per-key state
    // expires `delay` past the first arrival's event time instead of
    // living forever — the API that makes streaming dedup state BOUNDED
    // (keys per delay window, not keys ever seen). The three-chunk feed
    // walks keys through the full lifecycle: emit, drop-while-live,
    // evict-at-boundary, re-emit after expiry; the oracle replays the
    // probed exact semantics (see dedupWithinWmTransform).
    "s_dedup_within_wm" -> ((s, d) =>
      runStreamChunks(s, dedupWmChunks(s, d), OutputMode.Append())(dedupWithinWmTransform)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    "s_stateful" -> ((s, d) =>
      runStreamFile(s, d, OutputMode.Append())(seqTransform)
        .orderBy(col("user_id"), col("event_id"))),

    // Streaming document curation: the ingest-side quality+dedup gate as a
    // stream. Documents arrive through the file source, pass a pure-column
    // quality filter, exact-dedup by (lang, content hash) via streaming
    // dropDuplicates (keep-first, key-only state — the streaming analog of
    // q_dedup_exact), and the same query maintains per-lang kept counts in
    // Complete mode. Deduping on (lang, hash) — not hash alone — keeps the
    // per-lang counts deterministic when identical text exists under two
    // langs (whichever copy wins would otherwise be arrival-order). At
    // production volume the dedup state is one row per distinct key:
    // RocksDB-provider territory, same logic.
    "s_doc_dedup" -> ((s, d) =>
      runStreamRaw(s, d, "documents.parquet", OutputMode.Complete()) { raw =>
        raw.where(col("n_chars") >= 100)
          .withColumn("h", md5(col("text")))
          .dropDuplicates("lang", "h")
          .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      }.orderBy(col("lang"))),

    // Streaming CHUNK-STORE ingest (q_chunk_cdc's gear rule on the stream):
    // each arriving document fans out to its content-defined chunks inside
    // the micro-batch (the kernel is stateless, so chunking parallelizes
    // per-batch with no state), keep-first dedup state on the chunk HASH
    // spans batches — a chunk first seen three batches ago never re-enters
    // the store — and the chunk-length histogram of the KEPT set is the
    // audit. dropDuplicates → aggregation is the chained-stateful shape
    // s_doc_dedup pins at doc granularity; state here is one hash per
    // DISTINCT chunk (the chunk store's key set — at 100 TB this state IS
    // the store index, kept in the state backend or swapped for a
    // store-side anti-join like q_dedup_chunk_incr). Oracle: distinct
    // chunks are batch-order-independent, so the batch closed form (the
    // q_chunk_cdc CTE, distinct on hash) pins the streaming result.
    "s_chunk_cdc" -> ((s, d) =>
      runStreamRaw(s, d, "documents.parquet", OutputMode.Complete()) { raw =>
        raw.select(col("doc_id"),
            explode(graft.functions.TextHashes.cdcChunks(3, 8)(
              split(trim(col("text")), " "))).as("chunk"))
          .select(md5(col("chunk")).as("h"),
                  size(split(col("chunk"), " ", -1)).cast("long").as("tok_len"))
          .dropDuplicates("h")
          .groupBy(col("tok_len")).agg(count(lit(1)).as("n"))
      }.orderBy(col("tok_len"))),

    // STREAMING CHUNK INGEST WITHOUT UNBOUNDED STATE — the escape hatch
    // SCALE.md names for s_chunk_cdc: dropDuplicates keeps one state row
    // per distinct chunk FOREVER (state grows with the corpus), so at true
    // scale the dedup moves out of the state backend entirely. Here each
    // micro-batch (maxFilesPerTrigger=1 over a two-file feed) fans out to
    // its gear-rule chunks, ANTI-JOINS against the PERSISTED chunk index,
    // and appends only the novel hashes — foreachBatch, zero streaming
    // state; the index (bucketed on the hash at 100 TB, the
    // q_dedup_chunk_incr posture) replaces the state store and survives
    // restarts for free. The feed split is deterministic (doc_id parity),
    // so per-batch novelty is exact: batch 2's chunks that batch 1 already
    // indexed are rejected by the join, not by state. The final index
    // histogram must equal s_chunk_cdc's state-built result — two
    // implementations, one logical contract, and the crossover between
    // them (state size vs join cost) is a measured BASELINE entry.
    "s_chunk_cdc_idx" -> ((s, d) => {
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/chunkidx_$id"
      val feed = s"$base/feed"; val idx = s"$base/idx"; val chk = s"$base/chk"
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // two lands, one file each -> two micro-batches in arrival order
      docs.where(pmod(col("doc_id"), lit(2)) === 0)
        .coalesce(1).write.mode("append").parquet(feed)
      docs.where(pmod(col("doc_id"), lit(2)) === 1)
        .coalesce(1).write.mode("append").parquet(feed)
      def chunksOf(df: DataFrame): DataFrame = df
        .select(explode(graft.functions.TextHashes.cdcChunks(3, 8)(
            split(trim(col("text")), " "))).as("chunk"))
        .select(md5(col("chunk")).as("h"),
                size(split(col("chunk"), " ", -1)).cast("long").as("tok_len"))
        .dropDuplicates("h")
      val novelPerBatch = scala.collection.mutable.ArrayBuffer[Long]()
      val idxPath = new org.apache.hadoop.fs.Path(idx)
      val schema = s.read.parquet(feed).schema
      withStreamParallelism(s) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(feed)
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val ch = chunksOf(batch)
            val novel =
              if (fsys.exists(idxPath))
                ch.join(s.read.parquet(idx), Seq("h"), "left_anti")
              else ch
            // one anti-join pass total: the novel set is BOUNDED (distinct
            // new hashes), so an eager localCheckpoint lets the append and
            // the audit count share it instead of re-running the join
            val nv = novel.localCheckpoint()
            nv.coalesce(1).write.mode("append").parquet(idx)
            novelPerBatch += nv.count()
            ()
          }
          .option("checkpointLocation", chk)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      val hist = s.read.parquet(idx)
        .groupBy(col("tok_len").as("v")).agg(count(lit(1)).as("n"))
        .select(lit("len").as("kind"), col("v"), col("n")).collect()
      val rows = novelPerBatch.zipWithIndex.map { case (n, i) =>
        org.apache.spark.sql.Row("batch", i + 1L, n)
      } ++ hist
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, outSchema).orderBy(col("kind"), col("v"))
    }),

    // STORE→STORE INCREMENTAL PIPELINE — the log-structured loop closed in
    // ONE streaming query: the graft store is simultaneously the SOURCE
    // (manifest-tail MicroBatchStream: each drain plans exactly the new
    // manifest entries) and the SINK (epoch-ledger StreamingWrite: each
    // micro-batch commits atomically, replays absorbed). Batch appends
    // land in the upstream store BETWEEN drains; the downstream store ends
    // bit-for-bit equal to the transform over the whole upstream — but
    // built incrementally (the epoch ledger must show >1 committed epoch,
    // pinned by a flag). At 100 TB this is the medallion/CDC relay shape:
    // bronze→silver costs CHANGED bytes per cycle, never a table rescan,
    // and both ends keep snapshot isolation + time travel. */
    "s_store_pipe" -> ((s, d) => {
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/storepipe_$id"
      val src = s"$base/src"; val dst = s"$base/dst"; val chk = s"$base/chk"
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      def land(cond: org.apache.spark.sql.Column): Unit =
        orders.where(cond).repartition(2)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", src).save()
      land(pmod(col("k"), lit(2)) === 0)
      withStreamParallelism(s) {
        val q = s.readStream.format("graft.sources.StoreSink")
          .option("path", src).load()
          // stateless curation: drop one segment, derive a fee column
          // (integer div — both engines truncate alike on non-negatives)
          .where(col("grp") =!= lit("F"))
          .select(col("k"), col("grp"),
                  expr("amt_cents + amt_cents div 100").as("amt_cents"))
          .writeStream.format("graft.sources.StoreSink")
          .option("path", dst)
          .option("checkpointLocation", chk)
          .outputMode(OutputMode.Append())
          .start()
        try {
          q.processAllAvailable()
          land(pmod(col("k"), lit(2)) === 1) // arrives mid-stream
          q.processAllAvailable()
        } finally q.stop()
      }
      // the downstream ledger proves incrementality: >= 2 committed epochs
      val epochs = graft.sources.StoreSink.epochCount(dst)
      val agg = s.read.format("graft.sources.StoreSink").option("path", dst).load()
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        .collect()
      val rows = agg.toSeq :+ org.apache.spark.sql.Row(
        "z_incremental", if (epochs >= 2) 1L else 0L, 0L)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("grp",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_cents",
          org.apache.spark.sql.types.LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
    }),

    // STREAMING INDEX MAINTENANCE — the persisted IVF index keeping up with
    // a LIVE corpus: vectors stream into the corpus store (epoch-ledger
    // commits), the index builds after the first drain, and after more
    // vectors arrive a refresh folds the corpus's OWN change feed under the
    // FROZEN codebook — the s_store_pipe relay shape with the index as the
    // downstream. At 100 TB this is how search stays minutes behind ingest:
    // refresh cost tracks the epoch's changed rows + touched posting lists,
    // never the corpus. The oracle replays train-on-first-epoch /
    // assign-everything, so the whole maintenance fold is hash-pinned.
    "s_store_index_refresh" -> ((s, d) => {
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/sidx_$id"
      val feed = s"$base/feed"; val src = s"$base/src"
      val idx = s"$base/idx"; val chk = s"$base/chk"
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      graft.sources.Sources.withGraftCatalog(s) {
        graft.sources.Sources.withStorePath(s, src) {
          s.sql("ALTER TABLE graft.store ADD COLUMN emb STRING")
        }
      }
      val vecs = Tables.embeddings(s, d).select(col("vec_id").as("k"),
          lit("e").as("grp"), lit(0L).as("amt_cents"),
          expr("array_join(transform(embedding, x -> cast(x as string)), ',')").as("emb"))
      def land(cond: org.apache.spark.sql.Column): Unit =
        vecs.where(cond).coalesce(1).write.mode("append").parquet(feed)
      land(pmod(col("k"), lit(3)) =!= 0) // epoch 1: the initial corpus
      withStreamParallelism(s) {
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).parquet(feed)
          .writeStream.format("graft.sources.StoreSink")
          .option("path", src)
          .option("checkpointLocation", chk)
          .outputMode(OutputMode.Append())
          .start()
        try {
          q.processAllAvailable()
          graft.sources.AnnIndex.buildFromStore(s, src, idx) // index @ epoch 1
          land(pmod(col("k"), lit(3)) === 0) // epoch 2 arrives mid-stream
          q.processAllAvailable()
        } finally q.stop()
      }
      val cbBefore = s.read.format("graft.sources.StoreSink")
        .option("path", graft.sources.AnnIndex.codebookPath(idx)).load().collect().map(_.toSeq).toSet
      val (changed, parts) = graft.sources.AnnIndex.refresh(s, idx)
      val frozen = s.read.format("graft.sources.StoreSink")
        .option("path", graft.sources.AnnIndex.codebookPath(idx)).load()
        .collect().map(_.toSeq).toSet == cbBefore
      val epochs = graft.sources.StoreSink.epochCount(src)
      val queries = graft.ops.TrainingOps.nzEmbeddings(s, d)
        .where(col("vec_id") < 10)
      val top = graft.sources.AnnIndex.probe(s, queries, idx)
        .select(lit("t").as("tag"), col("q_id"), col("n_id"),
                col("score_e4"), col("rn")).collect().toSeq
      def flag(tagName: String, v: Boolean) = org.apache.spark.sql.Row(
        tagName, -1L, -1L, if (v) 1 else 0, 0)
      val rows = top ++ Seq(
        flag("z_epochs", epochs >= 2),
        flag("z_codebook_frozen", frozen),
        flag("z_refreshed", changed > 0 && parts >= 1))
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("q_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score_e4",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("rn",
          org.apache.spark.sql.types.IntegerType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, outSchema)
        .orderBy(col("tag"), col("q_id"), col("rn"))
    }),

    // STREAMING INDEX PROBE (round-11 verdict #8 — the serving side of the
    // index lifecycle; s_store_index_refresh is the maintenance side): a
    // QUERY STREAM probes the persisted IVF index through foreachBatch —
    // each micro-batch runs the bounded index probe (nprobe partitions per
    // query, zero training stages) and appends its hits; NO streaming
    // state anywhere (z_stateless pins it — the s_chunk_cdc_idx
    // bounded-state escape hatch, applied to serving). Because a probe is
    // per-query independent, the union of per-batch probes equals the
    // one-shot batch probe — the closed form the oracle states (the
    // training replay, shared with q_sim_ivf_indexed). At 100 TB this is
    // the online-serving shape: queries arrive continuously, each batch
    // costs its own nprobe posting lists, and index refresh/rebuild swaps
    // generations under the pointer without the serving query noticing.
    "s_ann_probe" -> ((s, d) => {
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/sannp_$id"
      val feed = s"$base/feed"; val idx = s"$base/idx"
      val out = s"$base/out"; val chk = s"$base/chk"
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      graft.sources.AnnIndex.build(s, Tables.embeddings(s, d), idx)
      val queries = graft.ops.TrainingOps.nzEmbeddings(s, d)
        .where(col("vec_id") < 10)
        .select(col("vec_id"),
          expr("array_join(transform(embedding, x -> cast(x as string)), ',')").as("emb"))
      def land(m: Int): Unit =
        queries.where(pmod(col("vec_id"), lit(3)) === m)
          .coalesce(1).write.mode("append").parquet(feed)
      land(0)
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var stateless = false
      withStreamParallelism(s) {
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).parquet(feed)
          .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
            val bs = batch.sparkSession
            graft.functions.FloatDot.register(bs)
            val bq = batch.select(col("vec_id"),
                expr("transform(split(emb, ','), x -> cast(x as float))").as("embedding"))
              .withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
              .localCheckpoint() // batch-sized
            if (bq.count() > 0) {
              nBatches.incrementAndGet()
              graft.sources.AnnIndex.probe(bs, bq, idx)
                .write.mode("append").parquet(out)
            }
            ()
          }
          .option("checkpointLocation", chk)
          .start()
        try {
          q.processAllAvailable()
          land(1); q.processAllAvailable()
          land(2); q.processAllAvailable()
          stateless = q.lastProgress == null ||
            q.lastProgress.stateOperators.isEmpty
        } finally q.stop()
      }
      val res = s.read.parquet(out)
        .select(lit("t").as("tag"), col("q_id"), col("n_id"),
                col("score_e4"), col("rn")).collect().toSeq
      def flag(tagName: String, v: Boolean) = org.apache.spark.sql.Row(
        tagName, -1L, -1L, if (v) 1 else 0, 0)
      val rows = res ++ Seq(
        flag("z_batches", nBatches.get() >= 2),
        flag("z_stateless", stateless))
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("q_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score_e4",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("rn",
          org.apache.spark.sql.types.IntegerType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, outSchema)
        .orderBy(col("tag"), col("q_id"), col("rn"))
    }),

    // STREAMING LATE-INTERACTION SERVING — s_ann_probe's multi-vector
    // twin: each micro-batch carries a COMPLETE query's TOKEN SET (a
    // ColBERT query arrives whole) and serves the PLAID two-stage probe
    // against the persisted MaxSim index — candidate cells, exact
    // kernel over candidate docs, NO streaming state (z_stateless).
    // Probes are per-query independent (per-token windows partition by
    // qt, candidates/kernel by q_id), so the union of per-batch probes
    // equals the one-shot probe — the shared training replay is the
    // oracle. At 100 TB: each arriving query pays nprobe·|tokens|
    // posting lists + its candidates' buckets, while refresh/rebuild
    // swap generations under the pointer without the serving loop
    // noticing.
    "s_maxsim_probe" -> ((s, d) => {
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/smaxsimp_$id"
      val feed = s"$base/feed"; val idx = s"$base/idx"
      val out = s"$base/out"; val chk = s"$base/chk"
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      val nz = graft.ops.TrainingOps.nzEmbeddings(s, d)
      val tokens = nz.where(col("vec_id") >= 20)
        .select(col("vec_id").as("n_id"), expr("vec_id div 10").as("d_id"),
                col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
      graft.sources.MaxSimIndex.build(s, nz, tokens, idx)
      val queries = nz.where(col("vec_id") < 20)
        .select(col("vec_id"),
          expr("array_join(transform(embedding, x -> cast(x as string)), ',')").as("emb"))
      def land(m: Int): Unit = // one whole query's tokens per batch
        queries.where(expr("vec_id div 10") === m)
          .coalesce(1).write.mode("append").parquet(feed)
      land(0)
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var stateless = false
      withStreamParallelism(s) {
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).parquet(feed)
          .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
            val bs = batch.sparkSession
            graft.functions.FloatDot.register(bs)
            val bq = batch.select(col("vec_id"),
                expr("transform(split(emb, ','), x -> cast(x as float))").as("embedding"))
              .withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
              .select(expr("vec_id div 10").as("q_id"), col("vec_id").as("qt"),
                      col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
              .localCheckpoint() // batch-sized
            if (bq.count() > 0) {
              nBatches.incrementAndGet()
              graft.sources.MaxSimIndex.probe(bs, bq, idx)
                .write.mode("append").parquet(out)
            }
            ()
          }
          .option("checkpointLocation", chk)
          .start()
        try {
          q.processAllAvailable()
          land(1); q.processAllAvailable()
          stateless = q.lastProgress == null ||
            q.lastProgress.stateOperators.isEmpty
        } finally q.stop()
      }
      val res = s.read.parquet(out)
        .select(lit("t").as("tag"), col("q_id"), col("d_id"),
                col("maxsim_e6"), col("rn")).collect().toSeq
      def flag(tagName: String, v: Boolean) = org.apache.spark.sql.Row(
        tagName, -1L, -1L, if (v) 1L else 0L, 0)
      val rows = res ++ Seq(
        flag("z_batches", nBatches.get() >= 2),
        flag("z_stateless", stateless))
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("q_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("d_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("maxsim_e6",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rn",
          org.apache.spark.sql.types.IntegerType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, outSchema)
        .orderBy(col("tag"), col("q_id"), col("rn"))
    }),

    // STREAMING WAND SERVING — s_bm25_probe's multi-term twin: each
    // micro-batch carries a SET of query terms (a user query) and serves
    // the disjunctive top-10 through TextIndex.probeOr — WAND pruning,
    // per-batch shard planning, NO streaming state. Term sets are
    // chunked deterministically by df-rank (rn % 3: two terms per
    // query), so the union of per-batch rankings is a partition of the
    // query workload and the oracle replays each chunk's OR closed form.
    // At 100 TB this is the serving loop: every arriving query pays its
    // terms' top impact bands plus whatever survives the bound.
    "s_bm25_or_probe" -> ((s, d) => {
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/sbm25or_$id"
      val feed = s"$base/feed"; val idx = s"$base/idx"
      val out = s"$base/out"; val chk = s"$base/chk"
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      val ti = graft.sources.TextIndex
      ti.build(s, Tables.documents(s, d).select(col("doc_id"), col("text")), idx)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("df").desc, col("t"))
      val qterms = ti.terms(s, idx).where(length(col("t")) >= 4)
        .orderBy(col("df").desc, col("t")).limit(6)
        .withColumn("m", pmod(row_number().over(w), lit(3)).cast("long"))
        .select(col("t"), col("m"))
        .localCheckpoint() // 6 rows
      def land(m: Int): Unit =
        qterms.where(col("m") === m).coalesce(1)
          .write.mode("append").parquet(feed)
      land(0)
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var stateless = false
      withStreamParallelism(s) {
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).parquet(feed)
          .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
            val bs = batch.sparkSession
            val bt = batch.localCheckpoint() // batch-sized term set
            if (bt.count() > 0) {
              nBatches.incrementAndGet()
              val m = bt.select(col("m")).first().getLong(0)
              val terms = bt.select(col("t")).collect()
                .map(_.getString(0)).toSeq
              ti.probeOr(bs, idx, terms, topk = 10)
                .select(lit(m).as("m"), col("doc_id"), col("bm25_e4"))
                .write.mode("append").parquet(out)
            }
            ()
          }
          .option("checkpointLocation", chk)
          .start()
        try {
          q.processAllAvailable()
          land(1); q.processAllAvailable()
          land(2); q.processAllAvailable()
          stateless = q.lastProgress == null ||
            q.lastProgress.stateOperators.isEmpty
        } finally q.stop()
      }
      val res = s.read.parquet(out)
        .select(col("m"), col("doc_id"), col("bm25_e4"))
        .collect().toSeq
      val rows = res ++ Seq(
        org.apache.spark.sql.Row(-1L, -1L,
          if (nBatches.get() >= 3) 1L else 0L), // z_batches
        org.apache.spark.sql.Row(-2L, -1L,
          if (stateless) 1L else 0L)) // z_stateless
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("m",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bm25_e4",
          org.apache.spark.sql.types.LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, outSchema)
        .orderBy(col("m"), col("bm25_e4").desc, col("doc_id"))
    }),

    // STREAMING SPARSE PROBE (round-12 verdict #7 — s_ann_probe's BM25
    // twin): a stream of QUERY TERMS probes the persisted text index
    // through foreachBatch — each micro-batch scores its terms over
    // their posting shards (partition pruning per batch, the corpus
    // never re-tokenizes) and appends its per-batch top-10; NO streaming
    // state (z_stateless). Terms are chunked deterministically by their
    // df-rank (rn % 3), so the union of per-batch scorings is a
    // PARTITION of the term set and the oracle replays each chunk's
    // closed form. At 100 TB this is interactive search serving: query
    // traffic arrives continuously, each batch pays its own shards.
    "s_bm25_probe" -> ((s, d) => {
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/sbm25p_$id"
      val feed = s"$base/feed"; val idx = s"$base/idx"
      val out = s"$base/out"; val chk = s"$base/chk"
      fsys.delete(new org.apache.hadoop.fs.Path(base), true)
      val ti = graft.sources.TextIndex
      ti.build(s, Tables.documents(s, d).select(col("doc_id"), col("text")), idx)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("df").desc, col("t"))
      val qterms = ti.terms(s, idx).where(length(col("t")) >= 4)
        .orderBy(col("df").desc, col("t")).limit(5)
        .withColumn("m", pmod(row_number().over(w), lit(3)).cast("long"))
        .select(col("t"), col("df"), col("m"))
        .localCheckpoint() // 5 rows
      def land(m: Int): Unit =
        qterms.where(col("m") === m).coalesce(1)
          .write.mode("append").parquet(feed)
      land(0)
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var stateless = false
      withStreamParallelism(s) {
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).parquet(feed)
          .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
            val bs = batch.sparkSession
            val bt = batch.localCheckpoint() // batch-sized term chunk
            if (bt.count() > 0) {
              nBatches.incrementAndGet()
              val m = bt.select(col("m")).first().getLong(0)
              ti.score(bs, idx, bt.select(col("t"), col("df")))
                .orderBy(col("bm25_e4").desc, col("doc_id")).limit(10)
                .select(lit(m).as("m"), col("doc_id"), col("n_terms"),
                        col("bm25_e4"))
                .write.mode("append").parquet(out)
            }
            ()
          }
          .option("checkpointLocation", chk)
          .start()
        try {
          q.processAllAvailable()
          land(1); q.processAllAvailable()
          land(2); q.processAllAvailable()
          stateless = q.lastProgress == null ||
            q.lastProgress.stateOperators.isEmpty
        } finally q.stop()
      }
      val res = s.read.parquet(out)
        .select(col("m"), col("doc_id"), col("n_terms"), col("bm25_e4"))
        .collect().toSeq
      val rows = res ++ Seq(
        org.apache.spark.sql.Row(-1L, -1L,
          if (nBatches.get() >= 3) 1L else 0L, 0L), // z_batches
        org.apache.spark.sql.Row(-2L, -1L,
          if (stateless) 1L else 0L, 0L)) // z_stateless
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("m",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_terms",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bm25_e4",
          org.apache.spark.sql.types.LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, outSchema)
        .orderBy(col("m"), col("bm25_e4").desc, col("doc_id"))
    }),

    // Exactly-once file sink: run the same checkpointed query twice (second
    // run sees no new data); the sink must contain each row exactly once.
    "s_sink_idempotent" -> ((s, d) => {
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/sink_$id"
      val out = s"$base/out"; val chk = s"$base/chk"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
      // file streaming source wants a directory: stream the sf dir filtered
      // to the events file; raw schema (ts = long nanos under nanosAsLong).
      val schema = s.read.parquet(s"$d/events.parquet").schema
      def runOnce(): Unit = {
        val q = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runOnce(); runOnce() // restart with same checkpoint: no duplicates
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_distinct"))
        .orderBy(col("event_type"))
    }),

    // Incremental AvailableNow ingest — the production backfill/catch-up
    // contract: run 1 drains the files present (first half of the feed),
    // new files LAND, run 2 with the same checkpoint picks up ONLY the new
    // ones. The sink must hold the union exactly once: the checkpoint's
    // file log is what makes re-listing the old files safe. (Contrast
    // s_sink_idempotent, which re-runs with NO new data.)
    "s_incr_ingest" -> ((s, d) => {
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/incr_$id"
      val feed = s"$base/feed"; val out = s"$base/out"; val chk = s"$base/chk"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = Tables.events(s, d)
      val median = ev.agg(expr("percentile(event_id, 0.5D)")).collect()(0).getDouble(0)
      def land(cond: org.apache.spark.sql.Column): Unit =
        ev.where(cond).write.mode("append").parquet(feed)
      def runOnce(): Unit = {
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).parquet(feed)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      land(col("event_id") <= median); runOnce()
      land(col("event_id") > median); runOnce()
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_distinct"))
        .orderBy(col("event_type"))
    }),

    // Dedup state survives a RESTART: run 1 drains the first half through
    // dropDuplicates state; the upstream then re-lands part of that half
    // alongside the genuinely-new second half (the at-least-once feed
    // reality); run 2, recovering the SAME checkpoint, must drop exactly
    // the re-landed ids from its state and pass the new ones. This pins
    // state-store recovery — s_sink_idempotent pins only the sink's file
    // log (no new data), s_incr_ingest only the source's file log (no
    // duplicate data). Unwatermarked state is deliberate here (recovery is
    // the contract under test); s_dedup_wm owns the eviction contract.
    "s_incr_dedup" -> ((s, d) => {
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/incrdd_$id"
      val feed = s"$base/feed"; val out = s"$base/out"; val chk = s"$base/chk"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
      val ev = Tables.events(s, d)
      val median = ev.agg(expr("percentile(event_id, 0.5D)")).collect()(0).getDouble(0)
      def land(cond: org.apache.spark.sql.Column): Unit =
        ev.where(cond).write.mode("append").parquet(feed)
      def runOnce(): Unit = withStreamParallelism(s) {
        val schema = s.read.parquet(feed).schema
        val q = s.readStream.schema(schema).parquet(feed)
          .dropDuplicates("event_id")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      land(col("event_id") <= median); runOnce()
      // the duplicates: every fourth first-half id re-lands with run 2
      land(col("event_id") > median ||
           (col("event_id") <= median && pmod(col("event_id"), lit(4)) === 0))
      runOnce()
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_distinct"))
        .orderBy(col("event_type"))
    }),

    // The custom TypedImperativeAggregate running as STREAMING state:
    // graft_tdigest (functions/TDigest.scala) aggregates per event type in
    // Complete mode, so the state store persists the serialized digest
    // buffer across micro-batches — per-key state is O(δ) centroids no
    // matter how much data streams through, which is the entire point of a
    // mergeable sketch in a stream. The audit is q_tdigest's batch
    // contract verbatim (exact value-at-rank quantiles + 2.5% rank-bound
    // flag on the stream's estimates), so the oracle pins the streaming
    // path to the same error contract as the batch path.
    "s_tdigest" -> ((s, d) => {
      graft.functions.TDigest.register(s)
      val est = runStreamFile(s, d, OutputMode.Complete()) { ds =>
        ds.toDF().groupBy(col("event_type"))
          .agg(expr("graft_tdigest(cast(round(value * 100) as double))").as("est"))
          .select(col("event_type"), col("est").getItem(0).as("e50"),
                  col("est").getItem(1).as("e95"))
      }
      val ev = Tables.events(s, d)
        .select(col("event_type"),
                expr("cast(round(value * 100) as bigint)").as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("c"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val exact = ev.withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
             max(when(col("r") === expr("(n + 1) div 2"), col("c"))).as("p50_cents"),
             max(when(col("r") === expr("(19 * n + 19) div 20"), col("c"))).as("p95_cents"))
      val ranks = ev.join(broadcast(est), "event_type")
        .groupBy(col("event_type"))
        .agg(sum(when(col("c") < col("e50"), 1L).otherwise(0L)).as("lo50"),
             sum(when(col("c") <= col("e50"), 1L).otherwise(0L)).as("hi50"),
             sum(when(col("c") < col("e95"), 1L).otherwise(0L)).as("lo95"),
             sum(when(col("c") <= col("e95"), 1L).otherwise(0L)).as("hi95"))
      exact.join(ranks, "event_type")
        .select(col("event_type"), col("n"), col("p50_cents"), col("p95_cents"),
          ((col("hi50") * 40 >= col("n") * 19) && (col("lo50") * 40 <= col("n") * 21) &&
           (col("hi95") * 40 >= col("n") * 37) && (col("lo95") * 40 <= col("n") * 39))
            .as("td_ok"))
        .orderBy(col("event_type"))
    }),

    // Watermarked tumbling windows × the custom top-k aggregate: per
    // closed hour window, the top-3 event values — three streaming
    // features composed (event-time windows, watermark append emission,
    // TypedImperativeAggregate state). State per (window) key is the
    // 3-entry buffer; the watermark EVICTS it when the window closes —
    // the live-leaderboard-per-window shape. Emission = windows whose end
    // ≤ final watermark (s_tumble_wm's contract); the total-order
    // comparator keeps the result bit-deterministic, so the oracle is the
    // exact batch twin with the watermark HAVING.
    "s_window_topk" -> ((s, d) => {
      graft.functions.TopK.register(s)
      val st = runStreamFile(s, d, OutputMode.Append()) { ds =>
        ds.withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour").as("w"))
          .agg(expr("graft_topk(cast(round(value * 100) as bigint), event_id, 3)")
            .as("top"))
          .select(col("w.start").cast("timestamp_ntz").as("hstart"), col("top"))
      }
      st.select(col("hstart"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("hstart"), (col("pos") + 1).cast("int").as("rn"),
                col("t.sk").as("v_cents"), col("t.pl").as("event_id"))
        .orderBy(col("hstart"), col("rn"))
    }),

    // graft_topk as STREAMING state — the bounded top-k aggregate's whole
    // point, live: per-key state is the k-entry buffer no matter how much
    // streams through, and unlike s_tdigest the comparator is a TOTAL
    // order, so the streamed result is bit-deterministic and the oracle is
    // EXACT (the window row_number twin), no error-contract flag needed.
    // The Misra–Gries sketch as STREAMING STATE: graft_freq_items runs as a
    // Complete-mode aggregate over a three-chunk feed, so each micro-batch's
    // partial sketches MERGE into the state store's serialized summary (the
    // s_tdigest pattern — mergeability is what makes a sketch streamable).
    // Like batch q_freq_items, the tracked set is order-dependent at the
    // margin, so the output derives only from the MG theorems per group:
    // heavy items (f·5 > N within the day-of-week group, k=4 over 5 event
    // types → constant churn) with tracked/no-overestimate/bound flags the
    // oracle pins TRUE against exact per-group counts.
    "s_freq_items" -> ((s, d) => {
      graft.functions.FreqItems.register(s)
      val st = runStreamChunks(s, chunkEvents(s, d), OutputMode.Complete()) { ds =>
        ds.toDF()
          .withColumn("dow", expr("(unix_micros(ts) div 86400000000) % 7"))
          .groupBy(col("dow"))
          .agg(expr("graft_freq_items(xxhash64(event_type), 4)").as("sk"),
               count(lit(1)).as("n_total"))
      }
      val mg = st.select(col("dow"), explode(col("sk")).as("e"))
        .select(col("dow"), col("e.item").as("h"), col("e.est").as("est"))
      Tables.events(s, d)
        .withColumn("dow", expr("(unix_micros(ts) div 86400000000) % 7"))
        .groupBy(col("dow"), col("event_type")).agg(count(lit(1)).as("n_exact"))
        .withColumn("h", xxhash64(col("event_type")))
        .join(broadcast(st.select(col("dow"), col("n_total"))), "dow")
        .where(col("n_exact") * 5 > col("n_total"))
        .join(broadcast(mg), Seq("dow", "h"), "left")
        .select(col("dow"), col("event_type"), col("n_exact"),
                col("est").isNotNull.as("tracked"),
                (col("est").isNotNull && col("est") <= col("n_exact")).as("no_overest"),
                (coalesce(col("est"), lit(0L)) * 5 >=
                  col("n_exact") * 5 - col("n_total")).as("within_bound"))
        .orderBy(col("dow"), col("event_type"))
    }),

    // DSv2 STREAMING READ (RangeSource's MicroBatchStream half): the same
    // connector table consumed as an offset-tracked incremental feed —
    // rows "arrive" 50k per reveal, so the query executes as 4 micro-
    // batches whose offset ranges tile [0, 200k) exactly once; the
    // Complete-mode aggregate merges state across them. The oracle is the
    // BATCH scan's closed forms over the full extent: a skipped or
    // re-read offset range breaks the hash — the incremental-read
    // contract, pinned end to end (RangeSourceSpec pins the committed-
    // offset RESTART resume the single-run path can't show).
    "s_src_dsv2" -> ((s, d) => {
      val feedId = s"s_src_dsv2_${java.lang.Integer.toHexString(d.hashCode)}"
      graft.sources.RangeSource.resetFeed(feedId) // deterministic arrival replay
      val name = "s_" + UUID.randomUUID.toString.replace("-", "")
      withStreamParallelism(s) {
        val q = s.readStream.format("graft.sources.RangeSource")
          .option("start", "0").option("end", "200000")
          .option("feedId", feedId).option("chunkRows", "50000")
          .load()
          .groupBy(col("tag"))
          .agg(count(lit(1)).as("n"), graft.ops.Det.moneySum(col("val")).as("val_cents"))
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Complete())
          .option("checkpointLocation", s"target/tmp/chk_$name")
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(name).orderBy(col("tag"))
    }),

    // ADMISSION CONTROL + AvailableNow through the custom connector
    // (SupportsAdmissionControl / SupportsTriggerAvailableNow on
    // RangeSource's MicroBatchStream): the whole extent is drained as a
    // BACKFILL — AvailableNow snapshots the goal, maxRowsPerTrigger caps
    // every batch at 60k admitted rows (so the 200k backlog can never
    // arrive as one giant batch — the restart-after-downtime contract),
    // and the query self-terminates. Output ≡ the batch closed forms:
    // admission changes batch BOUNDARIES, never totals — that invariance
    // is what the oracle pins (the s_trigger_avail pattern, on a
    // connector we own).
    "s_src_dsv2_avail" -> ((s, d) => {
      val feedId = s"s_src_dsv2_avail_${java.lang.Integer.toHexString(d.hashCode)}"
      graft.sources.RangeSource.resetFeed(feedId)
      val name = "s_" + UUID.randomUUID.toString.replace("-", "")
      withStreamParallelism(s) {
        val q = s.readStream.format("graft.sources.RangeSource")
          .option("start", "0").option("end", "200000")
          .option("feedId", feedId)
          .option("maxRowsPerTrigger", "60000")
          .load()
          .groupBy(col("tag"))
          .agg(count(lit(1)).as("n"), graft.ops.Det.moneySum(col("val")).as("val_cents"))
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Complete())
          .option("checkpointLocation", s"target/tmp/chk_$name")
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      s.table(name).orderBy(col("tag"))
    }),

    // DSv2 STREAMING WRITE (StoreSink's StreamingWrite half): the events
    // feed lands in the keyed store through THREE epoch-keyed staging/
    // manifest commits (maxFilesPerTrigger=1 over a 3-file feed), then the
    // LAST EPOCH IS RE-DELIVERED — the checkpoint's commit marker for the
    // final batch is removed, so the restarted run re-executes that epoch
    // against the sink, which is exactly Structured Streaming's documented
    // recovery contract ("the same epoch may be committed more than once").
    // The manifest's epoch ledger must absorb the replay: any double-count
    // (or lost epoch) breaks the oracle hash. This is the exactly-once
    // sink protocol end to end, driven through a REAL failure replay.
    "s_sink_dsv2" -> ((s, d) => {
      val id = java.lang.Integer.toHexString(d.hashCode)
      val base = s"target/tmp/dsv2sink_$id"
      val feed = s"$base/feed"; val store = s"$base/store"; val chk = s"$base/chk"
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      Tables.events(s, d)
        .select(col("event_id").as("k"), col("event_type").as("grp"),
                graft.ops.Det.cents(col("value")).as("amt_cents"))
        .repartition(3)
        .write.mode("overwrite").parquet(feed)
      val schema = s.read.parquet(feed).schema
      def runOnce(): Unit = withStreamParallelism(s) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(feed)
          .writeStream.format("graft.sources.StoreSink")
          .option("path", store).option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runOnce()
      // re-deliver the final epoch: drop its commit marker, keep offsets
      val commits = fs.listStatus(new org.apache.hadoop.fs.Path(s"$chk/commits"))
        .map(_.getPath).filter(p => p.getName.forall(_.isDigit))
      val last = commits.maxBy(_.getName.toLong)
      fs.delete(last, false)
      runOnce() // replays the epoch; the manifest ledger must dedupe it
      s.read.format("graft.sources.StoreSink").option("path", store).load()
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        .orderBy(col("grp"))
    }),

    // STREAMING READ FROM THE STORE (StoreSink's MicroBatchStream half —
    // tailing the manifest as an offset log): half the orders slice lands
    // first and is drained as batch 1; the second half APPENDS while the
    // query is live and arrives as batch 2 (only the NEW manifest entries
    // are planned — the file-count offset). The Complete-mode aggregate
    // over both batches must equal the batch read of the final store,
    // which the oracle recomputes from orders. This closes the store's
    // log-structured loop: streaming sink (epoch ledger) AND streaming
    // source (manifest tail) over one commit protocol.
    "s_store_tail" -> ((s, d) => {
      val path = graft.sources.Sources.tmp(d, "storetail")
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
        graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      def land(cond: org.apache.spark.sql.Column, mode: String): Unit =
        base.where(cond).write.format("graft.sources.StoreSink")
          .mode(mode).option("path", path).save()
      land(col("k") % 2 === 0, "overwrite")
      val name = "s_" + UUID.randomUUID.toString.replace("-", "")
      withStreamParallelism(s) {
        val q = s.readStream.format("graft.sources.StoreSink")
          .option("path", path).load()
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Complete())
          .option("checkpointLocation", s"target/tmp/chk_$name")
          .start()
        try {
          q.processAllAvailable()        // batch 1: the seeded half
          land(col("k") % 2 === 1, "append") // live append
          q.processAllAvailable()        // batch 2: only the new entries
        } finally q.stop()
      }
      s.table(name).orderBy(col("grp"))
    }),

    // STREAMING CHANGE DATA FEED (`option("changeFeed", "true")`): offsets
    // are COMMIT VERSIONS and each micro-batch emits (op, cv, row) changes
    // — the Delta CDF streaming read over the store's version manifests.
    // The scenario drives all three change shapes through a LIVE query:
    // v2 = an EQUALITY delete (metadata-only keyed retraction → the feed
    // emits exactly the newly-masked rows as deletes), v3 = an append
    // (inserts), v4 = a MERGE-ON-READ ordinal delete (deletion vectors →
    // again only the newly-dead rows). Zero data files are rewritten by
    // any of the three commits, and the feed's cost per commit is the
    // CHANGED rows — the delta protocol and the change feed are two
    // halves of the same CDC economics. The Complete-mode aggregate over
    // (op, cv, grp) equals the batch closed form the oracle computes.
    "s_store_cdf" -> ((s, d) => {
      val path = graft.sources.Sources.tmp(d, "storecdfstream")
      val fsh = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsh.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
        graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      base.repartitionByRange(4, col("k"))
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save() // v1
      val maxK = base.agg(max(col("k"))).collect()(0).getLong(0)
      val name = "s_" + UUID.randomUUID.toString.replace("-", "")
      graft.sources.Sources.withGraftCatalog(s) {
        graft.sources.Sources.withStorePath(s, path) {
          withStreamParallelism(s) {
            val q = s.readStream.format("graft.sources.StoreSink")
              .option("path", path).option("changeFeed", "true")
              .option("startingVersion", "1").load()
              .groupBy(col("op"), col("cv"), col("grp"))
              .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
              .writeStream.format("memory").queryName(name)
              .outputMode(OutputMode.Complete())
              .option("checkpointLocation", s"target/tmp/chk_$name")
              .start()
            try {
              q.processAllAvailable() // head = v1: nothing to emit yet
              // v2: keyed retraction through the DELTA protocol — equality
              // sidecars on existing entries, zero rewrites
              base.where(pmod(col("k"), lit(89)) === 0).select(col("k"))
                .createOrReplaceTempView(s"cdf_dels_$name")
              s.conf.set("spark.graft.store.rowlevel.mode", "delta")
              try s.sql(s"MERGE INTO graft.store t USING cdf_dels_$name s " +
                        "ON t.k = s.k WHEN MATCHED THEN DELETE")
              finally s.conf.unset("spark.graft.store.rowlevel.mode")
              q.processAllAvailable() // eq-delta deletes only
              base.where(pmod(col("k"), lit(101)) === 0)
                .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                        (col("k") * 10 + 5000000).as("amt_cents"))
                .write.format("graft.sources.StoreSink").mode("append")
                .option("path", path).save() // v3
              q.processAllAvailable() // inserts
              // v4: a ~4%-selective TRANSLATABLE range delete → deletion
              // vectors (merge-on-read), zero rewrites
              s.sql("DELETE FROM graft.store WHERE amt_cents < 2000000") // v4
              q.processAllAvailable() // dv-delta deletes only
            } finally q.stop()
          }
        }
      }
      s.table(name).orderBy(col("cv"), col("op"), col("grp"))
    }),

    // AVAILABLE-NOW BACKFILL over the store tail (the source's
    // SupportsTriggerAvailableNow): run 1 drains the seeded half and
    // TERMINATES (bounded catch-up, no long-running query); the second
    // half appends while nothing listens; run 2 RESUMES from the committed
    // offset and drains only the new manifest entries. Exactly-once across
    // restarts is the flag: run 2's row count equals the appended half —
    // a wrapper-style re-read of history would double it. Union of both
    // runs ≡ the whole slice (the s_store_tail truth).
    "s_store_tail_avail" -> ((s, d) => {
      val path = graft.sources.Sources.tmp(d, "storetailavail")
      val relay = graft.sources.Sources.tmp(d, "storetailavail_out")
      val fsh = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsh.delete(new org.apache.hadoop.fs.Path(path), true)
      fsh.delete(new org.apache.hadoop.fs.Path(relay), true)
      val base = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
        graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      def land(cond: org.apache.spark.sql.Column, mode: String): Unit =
        base.where(cond).write.format("graft.sources.StoreSink")
          .mode(mode).option("path", path).save()
      land(col("k") % 2 === 0, "overwrite")
      val tag = UUID.randomUUID.toString.replace("-", "")
      val chk = s"target/tmp/chk_avail_$tag"
      // store→store relay (the memory sink cannot resume a checkpoint;
      // the graft sink's epoch ledger can — exactly the production shape)
      def drain(): Unit = withStreamParallelism(s) {
        val q = s.readStream.format("graft.sources.StoreSink")
          .option("path", path).load()
          .writeStream.format("graft.sources.StoreSink")
          .option("path", relay)
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", chk)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def relayCount(): Long =
        s.read.format("graft.sources.StoreSink").option("path", relay)
          .load().count()
      drain()
      val c1 = relayCount()
      land(col("k") % 2 === 1, "append")
      drain()
      val c2 = relayCount()
      val incremental = c1 == base.where(col("k") % 2 === 0).count() &&
        c2 - c1 == base.where(col("k") % 2 === 1).count()
      val agg = s.read.format("graft.sources.StoreSink").option("path", relay)
        .load()
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        .collect()
      val rows = agg.toSeq :+ org.apache.spark.sql.Row(
        "z_incremental_resume", if (incremental) 1L else 0L, 0L)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("grp",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_cents",
          org.apache.spark.sql.types.LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
    }),

    // PACED BACKFILL (admission control on the store tail — the
    // maxFilesPerTrigger read option, SupportsAdmissionControl): an
    // arbitrarily-backlogged manifest drains in BOUNDED batches (≤ 3
    // files each here, 8 seeded), composing with AvailableNow's pinned
    // target — batch cost is capped no matter how far behind the reader
    // is. The flag pins the exact window tiling [(0,3),(3,6),(6,8)];
    // content equals the batch truth.
    "s_store_tail_paced" -> ((s, d) => {
      val path = graft.sources.Sources.tmp(d, "storetailpaced")
      val relay = graft.sources.Sources.tmp(d, "storetailpaced_out")
      val fsh = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsh.delete(new org.apache.hadoop.fs.Path(path), true)
      fsh.delete(new org.apache.hadoop.fs.Path(relay), true)
      Tables.orders(s, d).select(
          col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
          graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
        .repartitionByRange(8, col("k"))
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      val mark = graft.sources.StoreSink.tailPlans.size()
      val tag = UUID.randomUUID.toString.replace("-", "")
      withStreamParallelism(s) {
        val q = s.readStream.format("graft.sources.StoreSink")
          .option("path", path).option("maxFilesPerTrigger", "3").load()
          .writeStream.format("graft.sources.StoreSink")
          .option("path", relay)
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", s"target/tmp/chk_paced_$tag")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      import scala.jdk.CollectionConverters._
      // Spark re-invokes planInputPartitions several times per batch
      // (planning, execution, progress) — the WINDOW SEQUENCE is the
      // contract, so compare distinct windows in order
      val wins = graft.sources.StoreSink.tailPlans.asScala.toSeq
        .drop(mark).filter(w => w._1 != w._2).distinct
      val paced = wins == Seq((0, 3), (3, 6), (6, 8))
      val agg = s.read.format("graft.sources.StoreSink").option("path", relay)
        .load()
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        .collect()
      val rows = agg.toSeq :+ org.apache.spark.sql.Row(
        "z_paced_windows", if (paced) 1L else 0L, 0L)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("grp",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_cents",
          org.apache.spark.sql.types.LongType)))
      s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
    }),

    "s_topk" -> ((s, d) => {
      graft.functions.TopK.register(s)
      val st = runStreamFile(s, d, OutputMode.Complete()) { ds =>
        ds.toDF().groupBy(col("event_type"))
          .agg(expr("graft_topk(cast(round(value * 100) as bigint), event_id, 3)")
            .as("top"))
      }
      st.select(col("event_type"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rn"),
                col("t.sk").as("v_cents"), col("t.pl").as("event_id"))
        .orderBy(col("event_type"), col("rn"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    // streamed-in corpus: train on epoch 1, assign EVERYTHING — the frozen-
    // codebook maintenance fold, replayed
    // per-batch probes union to the ONE-SHOT batch probe (probes are
    // per-query independent) — the q_sim_ivf training replay, plus flags
    "s_ann_probe" -> {
      s"""WITH base AS (SELECT * FROM (${graft.ops.TrainingOps.simIvfKmeansOracle}) t)
         |SELECT 't' AS tag, q_id, n_id, score_e4, rn FROM base
         |UNION ALL SELECT 'z_batches', -1, -1, 1, 0
         |UNION ALL SELECT 'z_stateless', -1, -1, 1, 0
         |ORDER BY tag, q_id, rn""".stripMargin
    },

    // per-batch PLAID probes union to the one-shot probe (per-query
    // independence) — the shared late-interaction replay, plus flags
    "s_maxsim_probe" -> {
      s"""WITH base AS (SELECT * FROM (${graft.ops.TrainingOps.oracles("q_sim_maxsim_ivf")}) t)
         |SELECT 't' AS tag, q_id, d_id, maxsim_e6, rn FROM base
         |UNION ALL SELECT 'z_batches', -1, -1, 1, 0
         |UNION ALL SELECT 'z_stateless', -1, -1, 1, 0
         |ORDER BY tag, q_id, rn""".stripMargin
    },

    "s_store_index_refresh" -> {
      import graft.ops.TrainingOps.duckCos
      val cosES = duckCos("e.embedding", "sd.c_emb")
      val cosFC1 = duckCos("f.embedding", "c1.c_emb")
      val cosQC1 = duckCos("q.q_emb", "c1.c_emb")
      val cosQN = duckCos("pr.q_emb", "asg.n_emb")
      s"""WITH e_all AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE LIST_SUM(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) > 0),
         |e AS (SELECT vec_id, embedding FROM e_all WHERE vec_id % 3 <> 0),
         |sd AS (SELECT vec_id AS c_id, embedding AS c_emb FROM e
         |       WHERE vec_id % ${graft.ops.TrainingOps.strideSql("e")} = 0),
         |a1 AS (SELECT n_id, n_emb, bucket FROM (
         |    SELECT e.vec_id AS n_id, e.embedding AS n_emb, sd.c_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY $cosES DESC, sd.c_id) AS arn
         |    FROM e CROSS JOIN sd) t WHERE arn = 1),
         |dims AS (SELECT bucket, generate_subscripts(n_emb, 1) AS idx,
         |                UNNEST(n_emb) AS v FROM a1),
         |upd AS (SELECT bucket, idx,
         |          CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS sv,
         |          COUNT(*) AS n
         |        FROM dims GROUP BY bucket, idx),
         |c1 AS (SELECT bucket AS c_id,
         |          LIST(CAST((sv / 1048576.0) / n AS REAL) ORDER BY idx) AS c_emb
         |       FROM upd GROUP BY bucket),
         |asg AS (SELECT n_id, n_emb, bucket FROM (
         |    SELECT f.vec_id AS n_id, f.embedding AS n_emb, c1.c_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY f.vec_id
         |        ORDER BY $cosFC1 DESC, c1.c_id) AS arn
         |    FROM e_all f CROSS JOIN c1) t WHERE arn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e_all WHERE vec_id < 10),
         |pr AS (SELECT q_id, q_emb, bucket FROM (
         |    SELECT q.q_id, q.q_emb, c1.c_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY $cosQC1 DESC, c1.c_id) AS prn
         |    FROM q CROSS JOIN c1) t WHERE prn <= 2)
         |SELECT tag, q_id, n_id, score_e4, rn FROM (
         |  SELECT 't' AS tag, q_id, n_id,
         |    CAST(ROUND(score * 10000) AS INTEGER) AS score_e4, rn FROM (
         |    SELECT pr.q_id, asg.n_id, $cosQN AS score,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY pr.q_id
         |        ORDER BY $cosQN DESC, asg.n_id) AS INTEGER) AS rn
         |    FROM asg JOIN pr ON asg.bucket = pr.bucket) t WHERE rn <= 5
         |  UNION ALL SELECT 'z_epochs', -1, -1, 1, 0
         |  UNION ALL SELECT 'z_codebook_frozen', -1, -1, 1, 0
         |  UNION ALL SELECT 'z_refreshed', -1, -1, 1, 0) u
         |ORDER BY tag, q_id, rn""".stripMargin
    },

    // per-chunk closed forms: the df-rank % 3 split IS the batch
    // assignment, each chunk's scoring is q_bm25's kernel on its terms
    // each chunk's OR closed form (no per-doc term gate), flags constant
    "s_bm25_or_probe" ->
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
        |dlen AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
        |stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS tl FROM dlen),
        |dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
        |qt AS (SELECT t, df, ROW_NUMBER() OVER (ORDER BY df DESC, t) AS rn
        |       FROM (SELECT t, df FROM dfreq WHERE LEN(t) >= 4
        |             ORDER BY df DESC, t LIMIT 6) s),
        |q2 AS (SELECT t, df, rn % 3 AS m FROM qt),
        |sc AS (
        |  SELECT q2.m, tf.doc_id,
        |    CAST(SUM(CAST(ROUND(1e4 * LN(1.0 + (nd - df + 0.5) / (df + 0.5))
        |      * (tf * (1.2 + 1.0))
        |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * nd / CAST(tl AS DOUBLE))))
        |    AS BIGINT)) AS BIGINT) AS bm25_e4
        |  FROM tf JOIN q2 USING (t) JOIN dlen USING (doc_id), stats
        |  GROUP BY q2.m, tf.doc_id),
        |top AS (SELECT m, doc_id, bm25_e4 FROM (
        |  SELECT m, doc_id, bm25_e4,
        |    ROW_NUMBER() OVER (PARTITION BY m
        |      ORDER BY bm25_e4 DESC, doc_id) AS r
        |  FROM sc) t WHERE r <= 10)
        |SELECT m, doc_id, bm25_e4 FROM top
        |UNION ALL SELECT -1, -1, 1
        |UNION ALL SELECT -2, -1, 1
        |ORDER BY m, bm25_e4 DESC, doc_id""".stripMargin,

    "s_bm25_probe" ->
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(LOWER(text)), ' ')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
        |dlen AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
        |stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS tl FROM dlen),
        |dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
        |qt AS (SELECT t, df, ROW_NUMBER() OVER (ORDER BY df DESC, t) AS rn
        |       FROM (SELECT t, df FROM dfreq WHERE LEN(t) >= 4
        |             ORDER BY df DESC, t LIMIT 5) s),
        |q2 AS (SELECT t, df, rn % 3 AS m FROM qt),
        |sc AS (
        |  SELECT q2.m, tf.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_terms,
        |    CAST(SUM(CAST(ROUND(1e4 * LN(1.0 + (nd - df + 0.5) / (df + 0.5))
        |      * (tf * (1.2 + 1.0))
        |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * nd / CAST(tl AS DOUBLE))))
        |    AS BIGINT)) AS BIGINT) AS bm25_e4
        |  FROM tf JOIN q2 USING (t) JOIN dlen USING (doc_id), stats
        |  GROUP BY q2.m, tf.doc_id),
        |top AS (SELECT m, doc_id, n_terms, bm25_e4 FROM (
        |  SELECT m, doc_id, n_terms, bm25_e4,
        |    ROW_NUMBER() OVER (PARTITION BY m
        |      ORDER BY bm25_e4 DESC, doc_id) AS r
        |  FROM sc) t WHERE r <= 10)
        |SELECT m, doc_id, n_terms, bm25_e4 FROM top
        |UNION ALL SELECT -1, -1, 1, 0
        |UNION ALL SELECT -2, -1, 1, 0
        |ORDER BY m, bm25_e4 DESC, doc_id""".stripMargin,

    // the drained multi-batch ingest equals the batch table exactly
    "src_stream" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // incremental offset ranges must tile the extent exactly once —
    // the batch scan's closed forms ARE the streamed total
    "s_src_dsv2" ->
      """WITH g AS (
        |  SELECT r.range AS id,
        |    (r.range * 7919 % 100000) / 100.0 AS val,
        |    SUBSTR('abcd', CAST(r.range % 4 AS INT) + 1, 1) AS tag
        |  FROM RANGE(0, 200000) r)
        |SELECT tag, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM g GROUP BY tag ORDER BY tag""".stripMargin,

    // admission bounds batches, never totals — full-extent closed forms
    "s_src_dsv2_avail" ->
      """WITH g AS (
        |  SELECT r.range AS id,
        |    (r.range * 7919 % 100000) / 100.0 AS val,
        |    SUBSTR('abcd', CAST(r.range % 4 AS INT) + 1, 1) AS tag
        |  FROM RANGE(0, 200000) r)
        |SELECT tag, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM g GROUP BY tag ORDER BY tag""".stripMargin,

    // the three commits' change sets in batch closed form: eq-deletes at
    // v2, appended inserts at v3, MoR deletes at v4 over survivors ∪ adds
    "s_store_cdf" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |ins AS (SELECT k + mx.maxk + 1 AS k, 'NEW' AS grp,
        |          k * 10 + 5000000 AS amt
        |        FROM base, mx WHERE k % 101 = 0),
        |surv1 AS (SELECT k, grp, amt FROM base WHERE k % 89 <> 0),
        |d2 AS (SELECT 'delete' AS op, CAST(2 AS BIGINT) AS cv, grp,
        |         COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |       FROM base WHERE k % 89 = 0 GROUP BY grp),
        |i3 AS (SELECT 'insert', 3, grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |       FROM ins GROUP BY grp),
        |d4src AS (SELECT grp, amt FROM surv1
        |          UNION ALL SELECT grp, amt FROM ins),
        |d4 AS (SELECT 'delete', 4, grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |       FROM d4src WHERE amt < 2000000 GROUP BY grp)
        |SELECT * FROM d2 UNION ALL SELECT * FROM i3
        |UNION ALL SELECT * FROM d4
        |ORDER BY cv, op, grp""".stripMargin,

    // both tailed batches together ≡ the whole slice, exactly once
    "s_store_tail" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus ORDER BY grp""".stripMargin,

    // paced drain ≡ the whole slice; the flag pins the ≤3-file window
    // tiling over the 8-file seed
    "s_store_tail_paced" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_paced_windows', 1, 0
        |ORDER BY grp""".stripMargin,

    // two bounded drains ≡ the whole slice; the flag pins that run 2
    // resumed from the committed offset instead of re-reading history
    "s_store_tail_avail" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_incremental_resume', 1, 0
        |ORDER BY grp""".stripMargin,

    // replayed epoch absorbed: the store holds the feed exactly once
    "s_sink_dsv2" ->
      """SELECT event_type AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY event_type ORDER BY grp""".stripMargin,

    // MG guarantees are theorems regardless of batch/merge order — exact
    // heavy-hitter set per day-of-week group, flags pinned TRUE
    "s_freq_items" ->
      """WITH e AS (
        |  SELECT ((EPOCH_US(ts) // 86400000000) % 7) AS dow, event_type FROM events),
        |ex AS (SELECT dow, event_type, COUNT(*) AS n_exact FROM e GROUP BY 1, 2),
        |tot AS (SELECT dow, COUNT(*) AS n_total FROM e GROUP BY dow)
        |SELECT ex.dow, ex.event_type, ex.n_exact, TRUE AS tracked,
        |  TRUE AS no_overest, TRUE AS within_bound
        |FROM ex JOIN tot ON ex.dow = tot.dow
        |WHERE ex.n_exact * 5 > tot.n_total
        |ORDER BY ex.dow, ex.event_type""".stripMargin,

    "s_static_join" ->
      """SELECT e.event_id, c.c_mktsegment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    // Final merged state ≡ latest event per user over the whole feed.
    "s_foreach_batch" ->
      """SELECT user_id, event_id AS last_event,
        |  CAST(ROUND(value * 100) AS BIGINT) AS val_cents
        |FROM (SELECT user_id, event_id, value,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |                           ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // state reset on 'error' ≡ segment-local purchase row numbers
    "s_tws_running" ->
      """WITH seg AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS s
        |  FROM events)
        |SELECT user_id, event_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id, s ORDER BY ts, event_id)
        |       AS INTEGER) AS n_since_error
        |FROM seg WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,

    // Append-mode emission = hourly windows whose END has been passed by the
    // final watermark (max(ts) − 10 min).
    "s_tumble_wm" ->
      """WITH mx AS (SELECT MAX(ts) AS mt FROM events)
        |SELECT DATE_TRUNC('hour', ts) AS hstart, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM events, mx
        |GROUP BY DATE_TRUNC('hour', ts), event_type, mx.mt
        |HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mx.mt - INTERVAL 10 MINUTE
        |ORDER BY hstart, event_type""".stripMargin,

    // match-driven semi emission = the batch EXISTS set
    "s_join_semi" ->
      """SELECT e.event_id AS id_p, e.user_id
        |FROM events e
        |WHERE e.event_type = 'purchase' AND EXISTS (
        |  SELECT 1 FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = e.user_id
        |    AND EPOCH_US(e.ts) > EPOCH_US(c.ts)
        |    AND EPOCH_US(e.ts) <= EPOCH_US(c.ts) + 600000000)
        |ORDER BY id_p""".stripMargin,

    // restart recovery must reproduce continuous execution bit for bit
    "s_agg_restart" ->
      """WITH mx AS (SELECT MAX(ts) AS mt FROM events)
        |SELECT DATE_TRUNC('hour', ts) AS hstart, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM events, mx
        |GROUP BY DATE_TRUNC('hour', ts), event_type, mx.mt
        |HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mx.mt - INTERVAL 10 MINUTE
        |ORDER BY hstart, event_type""".stripMargin,

    // AvailableNow must reproduce continuous execution bit for bit.
    "s_trigger_avail" ->
      """WITH mx AS (SELECT MAX(ts) AS mt FROM events)
        |SELECT DATE_TRUNC('hour', ts) AS hstart, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM events, mx
        |GROUP BY DATE_TRUNC('hour', ts), event_type, mx.mt
        |HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mx.mt - INTERVAL 10 MINUTE
        |ORDER BY hstart, event_type""".stripMargin,

    // Both branches share the feed, so the union's watermark (min over
    // sources) equals s_tumble_wm's and the flush predicate is identical.
    "s_union_streams" ->
      """WITH mx AS (SELECT MAX(ts) AS mt FROM events)
        |SELECT DATE_TRUNC('hour', ts) AS hstart, event_type AS branch,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM events, mx
        |WHERE event_type IN ('click', 'purchase')
        |GROUP BY DATE_TRUNC('hour', ts), event_type, mx.mt
        |HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mx.mt - INTERVAL 10 MINUTE
        |ORDER BY hstart, branch""".stripMargin,

    // On-time partition only: the late replay set (≥2 h stale, id % 97) is
    // EXCLUDED — that exclusion IS the watermark-drop assertion.
    "s_late_drop" ->
      """WITH mx AS (SELECT MAX(ts) AS mt FROM events),
        |ot AS (
        |  SELECT e.* FROM events e, mx
        |  WHERE NOT (e.ts < mx.mt - INTERVAL 2 HOUR AND e.event_id % 97 = 0))
        |SELECT DATE_TRUNC('hour', ts) AS hstart, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM ot, mx
        |GROUP BY DATE_TRUNC('hour', ts), event_type, mx.mt
        |HAVING DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mx.mt - INTERVAL 10 MINUTE
        |ORDER BY hstart, event_type""".stripMargin,

    // Oracle-promoted in round 2 (same shape as s_tumble_wm): append-mode
    // session windows = gaps-and-islands sessions whose END (last ts + 30 min
    // gap) has been passed by the final watermark (max ts − 10 min). A new
    // event at exactly last+gap starts a NEW session in Spark (session
    // interval is [start, last+gap)), hence the >= break condition. Verified
    // row-for-row against the actual streaming output at sf0.01 (9540 rows).
    // Replays the three-chunk watermark trajectory: W1/W2/W3 are the
    // per-chunk watermarks (chunk max ts, ms floor, − 10 min). A session is
    // closed by 'gap' when its user's next event arrives in the same chunk
    // as its end, or before its timer met the highest watermark PRECEDING
    // that chunk (batch-k input runs before any timer fed by batch-k data —
    // StreamOpsSpec pins this and the <= boundary); by 'timer' otherwise;
    // the final open session emits only if its timer ≤ W3.
    "s_tws_timers" ->
      """WITH e AS (SELECT user_id, DATE_TRUNC('microseconds', ts) AS ts FROM events),
        |bnd AS (SELECT DATE_TRUNC('day', MIN(ts)) + INTERVAL 10 DAY AS t1,
        |               DATE_TRUNC('day', MIN(ts)) + INTERVAL 20 DAY AS t2 FROM e),
        |wm AS (SELECT
        |    MAX(CASE WHEN ts < bnd.t1 THEN EPOCH_US(ts) END) // 1000 - 600000 AS w1,
        |    MAX(CASE WHEN ts < bnd.t2 THEN EPOCH_US(ts) END) // 1000 - 600000 AS w2,
        |    MAX(EPOCH_US(ts)) // 1000 - 600000 AS w3
        |  FROM e, bnd GROUP BY bnd.t1, bnd.t2),
        |g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(EPOCH_US(ts)) OVER w IS NULL
        |           OR EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM g),
        |agg AS (
        |  SELECT user_id, sess, MIN(ts) AS sess_start, MAX(ts) AS sess_end,
        |    COUNT(*) AS n_events
        |  FROM s GROUP BY user_id, sess),
        |nx AS (
        |  SELECT *, LEAD(sess_start) OVER (PARTITION BY user_id ORDER BY sess) AS next_start
        |  FROM agg),
        |cl AS (
        |  SELECT user_id, sess_start, sess_end, n_events,
        |    EPOCH_US(sess_end) // 1000 + 1800000 AS timer_ms,
        |    CASE WHEN sess_end < bnd.t1 THEN 1
        |         WHEN sess_end < bnd.t2 THEN 2 ELSE 3 END AS c_end,
        |    CASE WHEN next_start IS NULL THEN NULL
        |         WHEN next_start < bnd.t1 THEN 1
        |         WHEN next_start < bnd.t2 THEN 2 ELSE 3 END AS c_next
        |  FROM nx, bnd)
        |SELECT user_id, sess_start, sess_end, n_events,
        |  CASE WHEN c_next IS NOT NULL AND (c_next = c_end
        |            OR NOT (timer_ms <= CASE WHEN c_next - 1 = 1 THEN wm.w1 ELSE wm.w2 END))
        |       THEN 'gap' ELSE 'timer' END AS closed_by
        |FROM cl, wm
        |WHERE c_next IS NOT NULL OR timer_ms <= wm.w3
        |ORDER BY user_id, sess_start""".stripMargin,

    "s_session_win" ->
      """WITH e AS (SELECT user_id, DATE_TRUNC('microseconds', ts) AS ts FROM events),
        |g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(EPOCH_US(ts)) OVER w IS NULL
        |           OR EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM g
        |), mx AS (SELECT MAX(ts) AS mt FROM e)
        |SELECT user_id, MIN(ts) AS sess_start, COUNT(*) AS n_events
        |FROM s, mx
        |GROUP BY user_id, sess, mx.mt
        |HAVING EPOCH_US(MAX(ts)) + 1800000000 <= EPOCH_US(mx.mt) - 600000000
        |ORDER BY user_id, sess_start""".stripMargin,

    // Update-mode single-batch emission = the full batch aggregation, no
    // watermark HAVING (contrast with s_tumble_wm's append-mode oracle).
    "s_tumble_update" ->
      """SELECT DATE_TRUNC('hour', ts) AS hstart, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM events
        |GROUP BY DATE_TRUNC('hour', ts), event_type
        |ORDER BY hstart, event_type""".stripMargin,

    // Sliding twin of s_tumble_wm: each event lands in 4 overlapping 1-h/15-m
    // windows (TIME_BUCKET minus k·15 min); append emits windows whose end
    // has been passed by the final watermark.
    "s_slide_wm" ->
      """WITH mx AS (SELECT MAX(ts) AS mt FROM events)
        |SELECT wstart, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM (SELECT TIME_BUCKET(INTERVAL 15 MINUTE, ts)
        |             - (k * INTERVAL 15 MINUTE) AS wstart, value
        |      FROM events
        |      CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS k) ks) t, mx
        |GROUP BY wstart, mx.mt
        |HAVING wstart + INTERVAL 1 HOUR <= mx.mt - INTERVAL 10 MINUTE
        |ORDER BY wstart""".stripMargin,

    // Inner stream–stream joins emit on match (no watermark wait), so the
    // full-feed output is exactly the batch interval join.
    "s_join_stream" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |ORDER BY id_a, id_b""".stripMargin,

    // Matched pairs ≡ the batch join; null-padded purchases are exactly the
    // unmatched ones STRICTLY below the final watermark. Empirical finding
    // (settled like the s_session_win HAVING): each side's watermark tracks
    // only its OWN filtered feed (the event_type filter runs before
    // withWatermark), so the global watermark is the MIN of the two sides'
    // max ts − 10 min — verified row-for-row at sf0.01, where the last
    // purchase itself stays in state because the purchase-side watermark
    // ends below it.
    "s_join_outer" ->
      """WITH p AS (SELECT user_id, ts AS tp, event_id AS id_p
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS uc, ts AS tc, event_id AS id_c
        |      FROM events WHERE event_type = 'click'),
        |m AS (SELECT p.id_p, c.id_c FROM p JOIN c ON p.user_id = c.uc
        |      AND c.tc >= p.tp - INTERVAL 10 MINUTE AND c.tc < p.tp),
        |wm AS (SELECT LEAST((SELECT MAX(tp) FROM p), (SELECT MAX(tc) FROM c))
        |              - INTERVAL 10 MINUTE AS w)
        |SELECT id_p, id_c FROM m
        |UNION ALL
        |SELECT p.id_p, NULL AS id_c FROM p, wm
        |WHERE p.tp < wm.w
        |  AND NOT EXISTS (SELECT 1 FROM m WHERE m.id_p = p.id_p)
        |ORDER BY id_p, id_c NULLS FIRST""".stripMargin,

    "s_dedup_wm" ->
      """SELECT event_type, COUNT(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // three-batch replay of the probed dropDuplicatesWithinWatermark
    // semantics: per-batch watermark w_i = ms-floored max prior event time
    // minus the 3-day delay (scaled back to µs); a key is live while its
    // FIRST emitted row's µs time + delay STRICTLY exceeds w_i; dropped
    // duplicates never refresh; evicted keys re-emit and re-open at their
    // own time (see dedupWithinWmTransform's scaladoc for the probes)
    "s_dedup_within_wm" ->
      """WITH e AS (SELECT user_id AS u, event_type AS t,
        |  DATE_TRUNC('microseconds', ts) AS ts FROM events),
        |bnd AS (SELECT DATE_TRUNC('day', MIN(ts)) + INTERVAL 10 DAY AS t1,
        |               DATE_TRUNC('day', MIN(ts)) + INTERVAL 20 DAY AS t2 FROM e),
        |g AS (SELECT u, t,
        |        CASE WHEN ts < bnd.t1 THEN 0 WHEN ts < bnd.t2 THEN 1 ELSE 2 END AS c,
        |        MIN(EPOCH_US(ts)) AS us
        |      FROM e, bnd GROUP BY 1, 2, 3),
        |wm AS (SELECT (MAX(CASE WHEN c = 0 THEN us END) // 1000 - 259200000) * 1000 AS w1,
        |              (MAX(CASE WHEN c <= 1 THEN us END) // 1000 - 259200000) * 1000 AS w2 FROM g),
        |e0 AS (SELECT u, t, us FROM g WHERE c = 0),
        |c1 AS (SELECT u, t, us FROM g WHERE c = 1),
        |e1 AS (SELECT c1.u, c1.t, c1.us FROM c1, wm
        |       WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.u = c1.u AND e0.t = c1.t
        |                         AND e0.us + 259200000000 > wm.w1)),
        |st1 AS (SELECT u, t, us FROM e0
        |        WHERE NOT EXISTS (SELECT 1 FROM e1 WHERE e1.u = e0.u AND e1.t = e0.t)
        |        UNION ALL SELECT u, t, us FROM e1),
        |c2 AS (SELECT u, t FROM g WHERE c = 2),
        |e2 AS (SELECT c2.u, c2.t FROM c2, wm
        |       WHERE NOT EXISTS (SELECT 1 FROM st1 WHERE st1.u = c2.u AND st1.t = c2.t
        |                         AND st1.us + 259200000000 > wm.w2)),
        |em AS (SELECT t FROM e0 UNION ALL SELECT t FROM e1 UNION ALL SELECT t FROM e2)
        |SELECT t AS event_type, COUNT(*) AS n FROM em GROUP BY t ORDER BY t""".stripMargin,

    // keep-first dedup by (lang, content hash) ≡ per-lang distinct count
    "s_doc_dedup" ->
      """SELECT lang, COUNT(DISTINCT md5(text)) AS n_kept
        |FROM documents WHERE n_chars >= 100
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // distinct chunks are batch-order-independent: the batch gear-rule CTE
    // (q_chunk_cdc's), distinct on hash, length histogram
    "s_chunk_cdc" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |cuts AS (SELECT doc_id, toks,
        |    LIST_FILTER(RANGE(3, LEN(toks)), i ->
        |      CAST(('0x' || SUBSTR(md5(ARRAY_TO_STRING(
        |        toks[CAST(i - 2 AS INTEGER):CAST(i AS INTEGER)], ' ')), 1, 7)) AS BIGINT) % 8 = 0) AS cuts
        |  FROM base),
        |bs AS (SELECT doc_id, toks,
        |    LIST_PREPEND(CAST(0 AS BIGINT), LIST_APPEND(cuts, CAST(LEN(toks) AS BIGINT))) AS bs
        |  FROM cuts),
        |chunks AS (SELECT ARRAY_TO_STRING(toks[CAST(bs[CAST(j AS INTEGER)] + 1 AS INTEGER)
        |                       :CAST(bs[CAST(j AS INTEGER) + 1] AS INTEGER)], ' ') AS chunk
        |  FROM bs, UNNEST(RANGE(1, LEN(bs))) AS t(j)),
        |d AS (SELECT DISTINCT md5(chunk) AS h,
        |    CAST(LEN(STRING_SPLIT(chunk, ' ')) AS BIGINT) AS tok_len FROM chunks)
        |SELECT tok_len, COUNT(*) AS n FROM d GROUP BY tok_len ORDER BY tok_len""".stripMargin,

    // the relay's end state is the transform over the whole upstream —
    // arrival order never matters for a stateless append relay; the
    // z flag pins that it was nonetheless built in >= 2 epochs
    "s_store_pipe" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT grp, COUNT(*) AS n,
        |  CAST(SUM(amt + amt // 100) AS BIGINT) AS sum_cents
        |FROM base WHERE grp <> 'F' GROUP BY grp
        |UNION ALL SELECT 'z_incremental', 1, 0
        |ORDER BY grp""".stripMargin,

    // the index build is batch-order-DEPENDENT only in WHICH batch a chunk
    // is credited to — and the deterministic split (doc_id parity, batch 1
    // = even) makes that exact: a chunk's batch is the MIN batch of the
    // docs containing it; the final index is the distinct-chunk set either
    // way (same histogram as s_chunk_cdc — state and index agree)
    "s_chunk_cdc_idx" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |cuts AS (SELECT doc_id, toks,
        |    LIST_FILTER(RANGE(3, LEN(toks)), i ->
        |      CAST(('0x' || SUBSTR(md5(ARRAY_TO_STRING(
        |        toks[CAST(i - 2 AS INTEGER):CAST(i AS INTEGER)], ' ')), 1, 7)) AS BIGINT) % 8 = 0) AS cuts
        |  FROM base),
        |bs AS (SELECT doc_id, toks,
        |    LIST_PREPEND(CAST(0 AS BIGINT), LIST_APPEND(cuts, CAST(LEN(toks) AS BIGINT))) AS bs
        |  FROM cuts),
        |chunks AS (SELECT doc_id,
        |    ARRAY_TO_STRING(toks[CAST(bs[CAST(j AS INTEGER)] + 1 AS INTEGER)
        |                       :CAST(bs[CAST(j AS INTEGER) + 1] AS INTEGER)], ' ') AS chunk
        |  FROM bs, UNNEST(RANGE(1, LEN(bs))) AS t(j)),
        |firstb AS (SELECT md5(chunk) AS h,
        |    MIN(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END) AS b,
        |    MIN(CAST(LEN(STRING_SPLIT(chunk, ' ')) AS BIGINT)) AS tok_len
        |  FROM chunks GROUP BY h)
        |SELECT 'batch' AS kind, CAST(b AS BIGINT) AS v, COUNT(*) AS n
        |FROM firstb GROUP BY b
        |UNION ALL
        |SELECT 'len', tok_len, COUNT(*) FROM firstb GROUP BY tok_len
        |ORDER BY kind, v""".stripMargin,

    "s_stateful" ->
      """SELECT user_id, event_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "s_sink_idempotent" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // recovered dedup state drops the re-landed ids: whole feed, once each
    "s_incr_dedup" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // union of both incremental runs = the whole feed, exactly once
    "s_incr_ingest" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q_tdigest's oracle verbatim: exact value-at-rank quantiles + TRUE —
    // the flag asserts the STREAMING digest's rank error stays in contract
    "s_tdigest" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        |r AS (
        |  SELECT event_type, c,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS r,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM e)
        |SELECT event_type, MAX(n) AS n,
        |  MAX(CASE WHEN r = (n + 1) // 2 THEN c END) AS p50_cents,
        |  MAX(CASE WHEN r = (19 * n + 19) // 20 THEN c END) AS p95_cents,
        |  TRUE AS td_ok
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // closed windows only (s_tumble_wm's HAVING) × the exact top-3 twin
    "s_window_topk" ->
      """WITH mx AS (SELECT MAX(ts) AS mt FROM events),
        |v AS (
        |  SELECT DATE_TRUNC('hour', ts) AS hstart,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v, event_id
        |  FROM events, mx
        |  WHERE DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mt - INTERVAL 10 MINUTE),
        |r AS (
        |  SELECT hstart, v, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY hstart ORDER BY v DESC, event_id) AS rn
        |  FROM v)
        |SELECT hstart, CAST(rn AS INT) AS rn, v AS v_cents, event_id
        |FROM r WHERE rn <= 3 ORDER BY hstart, rn""".stripMargin,

    // total order (v DESC, event_id ASC) → streamed top-k ≡ batch window
    "s_topk" ->
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v, event_id
        |  FROM events),
        |r AS (
        |  SELECT event_type, v, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY v DESC, event_id) AS rn
        |  FROM v)
        |SELECT event_type, CAST(rn AS INT) AS rn, v AS v_cents, event_id
        |FROM r WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,
  )
}
