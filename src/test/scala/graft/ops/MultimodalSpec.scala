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

  test("q_multimodal_png: javax.imageio round-trip recovers every pixel of the closed form") {
    import spark.implicits._
    // real PNG bytes, real decode: featurize over rendered images must
    // reproduce the pixel formula's geometry, sum, and bin counts exactly
    val ids = Seq(0L, 1L, 7L, 13L, 23L)
    val df = ids.map(id => (id, Multimodal.renderPng(id))).toDF("doc_id", "payload")
    val out = Multimodal.featurize(df, batchSize = 2).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == ids.sorted)
    out.foreach { f =>
      val (w, h) = ((8 + f.doc_id % 9).toInt, (8 + f.doc_id % 7).toInt)
      assert((f.width, f.height) == (w, h))
      val px = for { y <- 0 until h; x <- 0 until w }
        yield ((f.doc_id * 31 + x * 7 + y * 13) % 256).toInt
      assert(f.px_sum == px.map(_.toLong).sum)
      val bins = px.groupBy(_ >> 5).view.mapValues(_.size).toMap
      (0 until 8).foreach { b =>
        assert(math.round(f.feat(b) * w * h).toInt == bins.getOrElse(b, 0), s"bin $b doc ${f.doc_id}")
      }
      assert(f.n_bytes > 8, "payload is a real encoded PNG, not raw pixels")
    }
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
