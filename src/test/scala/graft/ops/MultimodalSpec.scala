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

  test("q_multimodal_frames: even frame indices, ≤4 frames/doc, checksums match brute force") {
    val rows = Multimodal.queries("q_multimodal_frames")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 % 2 == 0), "only every second frame is sampled")
    rows.groupBy(_._1).foreach { case (_, fs) => assert(fs.length <= 4) }
    val texts = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, fi, sum) =>
      val bytes = texts(id).getBytes("UTF-8")
      val want = bytes.slice(fi * 32, fi * 32 + 32).map(_ & 0xff).sum.toLong
      assert(sum == want, s"doc $id frame $fi")
    }
    // frame fan-out bounded: docs shorter than one frame emit nothing
    texts.filter(_._2.length < 32).keys.foreach { id =>
      assert(!rows.exists(_._1 == id))
    }
  }
}
