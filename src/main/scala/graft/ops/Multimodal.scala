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
    // batched featurize → per-doc feature summary. Non-oracle (mapPartitions
    // is outside SQL); deterministic, so the rows-only check is stable.
    "q_multimodal_feat" -> ((s, d) => {
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                col("text").cast("binary").as("payload"))
      featurize(media).toDF()
        .select(col("doc_id"), col("n_bytes"),
                round(element_at(col("feat"), 2).cast("double"), 4).as("f1"),
                round(element_at(col("feat"), 4).cast("double"), 4).as("f3"))
        .orderBy(col("doc_id"))
    }),
  )

  override def oracles: Map[String, String] = Map.empty
}
