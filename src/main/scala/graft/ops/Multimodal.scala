package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2.9 / BASELINE.json:6
  * "multimodal columns").
  *
  * Media rides as an opaque `binary` column with typed metadata beside it —
  * the columnar-at-rest layout that lets Parquet column pruning skip payload
  * bytes when a query only touches metadata. Feature extraction runs as
  * `mapPartitions` over batches: the executor-side iterator keeps one batch
  * of payloads in memory at a time (bounded memory at any payload size) and
  * amortizes per-batch setup (a real decoder would init its codec once per
  * batch). This is the Scala analogue of `mapInPandas`-style batched UDFs.
  *
  * STUB: `decode` below is a deterministic fake (byte-histogram features).
  * A production build would decode JPEG/PCM/video frames here (codec libs
  * are not present in this container); ONLY the body of `decode` changes —
  * the schema, batching, partitioning, and query plumbing are real and
  * tested (`MultimodalSpec`).
  */
object Multimodal extends OpModule {

  case class MediaFeature(doc_id: Long, n_bytes: Int, feat: Array[Float])

  case class Frame(doc_id: Long, frame_idx: Int, checksum: Long)

  /** STUB frame decode: real implementation = demux(payload) → sample every
    * SECOND frame of the first 8 (temporal subsampling — the standard
    * video-pipeline trick to bound per-record work) → per-frame features.
    * Deterministic fake: 32-byte fixed-stride "frames", byte-sum checksum. */
  private def sampleFrames(docId: Long, payload: Array[Byte]): Iterator[Frame] = {
    val nFrames = math.min(payload.length / 32, 8)
    Iterator.range(0, nFrames, 2).map { fi =>
      var sum = 0L
      var j = fi * 32
      val end = j + 32
      while (j < end) { sum += (payload(j) & 0xff); j += 1 }
      Frame(docId, fi, sum)
    }
  }

  /** STUB decode: real implementation = codec(payload) → pixels/samples →
    * model features. Deterministic fake: 8-bin byte histogram, L1-normalized. */
  private def decode(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](8)
    var i = 0
    while (i < payload.length) { bins(((payload(i) & 0xff) >> 5)) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    bins.map(_ / n)
  }

  /** Batched feature extraction over a (doc_id, payload) frame. */
  def featurize(df: DataFrame, batchSize: Int = 256): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would live here (decoder init, model session)
          batch.iterator.map { case (id, payload) =>
            MediaFeature(id, payload.length, decode(payload))
          }
        }
      }
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Text bytes stand in for media payloads: documents → binary column →
    // batched featurize → per-doc feature summary. Oracle-promoted in round
    // 2: the output recovers the exact per-bin BYTE COUNTS from the float
    // features (count = round(feat × n_bytes) is exact while
    // n_bytes ≤ 2²⁴/ε — float error ≪ 0.5 here), so the comparison is
    // integer-exact; the DuckDB twin counts the same byte classes with hex
    // regex ranges (the corpus is pure ASCII at every sf tier, verified, so
    // chars = bytes). Bin 1 = 0x20–0x3F, bin 3 = 0x60–0x7F.
    "q_multimodal_feat" -> ((s, d) => {
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                col("text").cast("binary").as("payload"))
      featurize(media).toDF()
        .select(col("doc_id"), col("n_bytes"),
                round(element_at(col("feat"), 2) * col("n_bytes")).cast("int").as("b1_cnt"),
                round(element_at(col("feat"), 4) * col("n_bytes")).cast("int").as("b3_cnt"))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling over a "video" payload: per-record fan-out (flatMap —
    // the Dataset UDTF surface) emitting every second 32-byte frame of the
    // first 8, with a deterministic stub checksum per frame. The plumbing
    // under a real decoder: binary column in, bounded frames-per-record
    // out, executor-local imperative kernel, no shuffle before the audit
    // sort. Oracle: the corpus is pure ASCII (verified r2), so DuckDB
    // recomputes each frame checksum as a sum of ASCII codes over the same
    // char windows — a wrong stride/offset/sample-rate breaks the match.
    "q_multimodal_frames" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, payload) => sampleFrames(id, payload) }
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_multimodal_feat" ->
      """SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS n_bytes,
        |  CAST(LENGTH(REGEXP_REPLACE(text, '[^\x20-\x3F]', '', 'g')) AS INTEGER) AS b1_cnt,
        |  CAST(LENGTH(REGEXP_REPLACE(text, '[^\x60-\x7F]', '', 'g')) AS INTEGER) AS b3_cnt
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    UNNEST(GENERATE_SERIES(0, LEAST(LENGTH(text) // 32, 8) - 1, 2)) AS frame_idx
        |  FROM documents
        |  WHERE LENGTH(text) >= 32)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 32),
        |    j -> ASCII(SUBSTR(text, frame_idx * 32 + j, 1)))) AS BIGINT) AS checksum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
