package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("featurize: batching preserves every row, features deterministic and normalized") {
    import spark.implicits._
    val rows = (1L to 10L).map(i => (i, s"payload-$i-${"x" * i.toInt}".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload")
    val out = Multimodal.featurize(df, batchSize = 3).collect().sortBy(_.doc_id)
    assert(out.length == 10)
    assert(out.map(_.doc_id).toSeq == (1L to 10L))
    out.zip(rows).foreach { case (f, (_, p)) =>
      assert(f.n_bytes == p.length)
      assert(math.abs(f.feat.sum - 1.0f) < 1e-5f) // histogram L1-normalized
    }
    // determinism across runs
    val again = Multimodal.featurize(df, batchSize = 7).collect().sortBy(_.doc_id)
    assert(out.zip(again).forall { case (a, b) => a.feat.sameElements(b.feat) })
  }

  test("q_multimodal_feat covers every document exactly once") {
    val out = Multimodal.queries("q_multimodal_feat")(spark, sf)
    assert(out.count() == graft.Tables.documents(spark, sf).count())
    assert(out.select(col("doc_id")).distinct().count() == out.count())
  }
}
