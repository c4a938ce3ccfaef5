package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force twins for the round-12 training-data ops. */
class Round12OpsSpec extends SparkSpec {

  test("q_kcenter matches a literal greedy farthest-point replay") {
    val got = TrainingOps.queries("q_kcenter")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

    // brute force over the collected corpus (500 vectors at sf0.001)
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def d2e6(a: Array[Float], b: Array[Float]): Long = {
      var s = 0.0; var sa = 0.0; var sb = 0.0
      var i = 0
      while (i < a.length) {
        s += a(i).toDouble * b(i).toDouble
        sa += a(i).toDouble * a(i).toDouble
        sb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.round((sa + sb - 2 * s) * 1e6)
    }
    var sel = List((1, emb.head._1, 0L))
    var centers = List(emb.head._2)
    for (r <- 2 to 8) {
      val scored = emb.map { case (id, v) =>
        (id, centers.map(c => d2e6(v, c)).min)
      }
      val (id, md) = scored.maxBy { case (id, md) => (md, -id) }
      sel = sel :+ ((r, id, md))
      centers = centers :+ emb.find(_._1 == id).get._2
    }
    assert(got.toSeq == sel, s"greedy trajectories diverge:\n$got\nvs\n$sel")
  }

  test("q_dsir_sample: the top-20 is dominated by the target domain") {
    // bigram importance weights separate the synthetic languages (the
    // shared 31-token vocabulary makes unigrams nearly signal-free);
    // the declared top-20 must be overwhelmingly target-domain
    val top = TrainingOps.queries("q_dsir_sample")(spark, sf).collect()
    assert(top.length == 20)
    val langs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enShare = top.count(r => langs(r.getLong(0)) == "en")
    assert(enShare >= 15, s"top-20 should be target-dominated, got $enShare en")
  }
}
