package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Property tests for the non-oracle LLM ops (SURVEY §5.2): near-dup LSH
  * recall/precision vs an exact O(n²) reference, cosine top-k vs brute force. */
class LlmOpsSpec extends SparkSpec {

  private def shingleSets: Map[Long, Set[String]] =
    Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).trim.split(" ")
        val sh =
          if (toks.length <= 5) Set(toks.mkString(" "))
          else (0 to toks.length - 5).map(i => toks.slice(i, i + 5).mkString(" ")).toSet
        r.getLong(0) -> sh
      }.toMap

  test("q_dedup_cluster: pairs land in one cluster; rep is the cluster min; sizes partition") {
    val pairs = LlmOps.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = LlmOps.queries("q_dedup_cluster")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val rep = rows.map { case (id, (r, _)) => id -> r }.toMap
    // every paired doc is clustered, and both ends share a representative
    assert(pairs.forall { case (a, b) => rep.contains(a) && rep(a) == rep(b) })
    // the representative is the minimum member of its cluster
    val members = rows.groupBy(_._2._1).map { case (r, xs) => r -> xs.map(_._1) }
    assert(members.forall { case (r, ids) => ids.min == r })
    // cluster_size is consistent with membership counts
    assert(rows.forall { case (id, (r, sz)) => members(r).length.toLong == sz })
  }

  test("q_dedup_near: exact recall AND precision vs brute-force jaccard >= 0.5") {
    val got = LlmOps.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = shingleSets
    val ids = sets.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      if a.intersect(b).size.toDouble / a.union(b).size >= 0.5
    } yield (ids(i), ids(j))).toSet
    assert(got == want, s"missing=${want.diff(got)} extra=${got.diff(want)}")
    assert(want.nonEmpty, "corpus should contain planted near-dups")
  }

  test("q_dedup_near is idempotent on survivors (dedup ∘ dedup = dedup)") {
    // removing the higher doc_id of each pair leaves a pair-free corpus
    val pairs = LlmOps.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val removed = pairs.map(_._2).toSet
    val sets = shingleSets.filter { case (id, _) => !removed.contains(id) }
    val ids = sets.keys.toSeq.sorted
    val residual = for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      if a.intersect(b).size.toDouble / a.union(b).size >= 0.5
    } yield (ids(i), ids(j))
    assert(residual.isEmpty)
  }

  test("q_sim_topk matches brute-force double cosine") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (0L until 10L).flatMap { q =>
      vecs.keys.toSeq.map(n => (q, n, cos(vecs(q), vecs(n))))
        .sortBy { case (_, n, s) => (-s, n) }.take(5)
        .zipWithIndex.map { case ((_, n, s), i) => (q, i + 1) -> (n, math.round(s * 10000).toInt) }
    }.toMap
    LlmOps.queries("q_sim_topk")(spark, sf).collect().foreach { r =>
      val (n, s4) = want((r.getLong(0), r.getInt(3)))
      assert(r.getLong(1) == n && r.getInt(2) == s4, s"row $r expected ($n, $s4)")
    }
  }

  test("q_quality_filter only passes docs satisfying every gate") {
    val out = LlmOps.queries("q_quality_filter")(spark, sf)
    assert(out.where(col("n_chars") < 100 || col("n_chars") > 2000 ||
      !col("lang").isin("en", "de", "fr") || col("sym_ratio") >= 0.1).count() == 0)
  }

  test("q_vocab_oov matches a brute-force top-64 vocab OOV count") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).trim.toLowerCase.split(" ").toSeq))
    val counts = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, o) => (t, o.size) }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(64).map(_._1).toSet
    val want = docs.groupBy(_._1).map { case (lang, ds) =>
      val toks = ds.flatMap(_._2)
      val oov = toks.count(!vocab(_)).toLong
      (lang, (toks.size.toLong, oov, oov * 10000 / toks.size))
    }
    val got = graft.ops.TextAnalysis.queries("q_vocab_oov")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, s"got=$got want=$want")
  }
}
