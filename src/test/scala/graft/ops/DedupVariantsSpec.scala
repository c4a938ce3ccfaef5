package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupVariantsSpec extends SparkSpec {

  test("simhash pairs and minhash pairs substantially agree on planted dups") {
    val mh = LlmOps.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = DedupVariants.queries("q_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty && sh.nonEmpty)
    val overlap = mh.intersect(sh).size.toDouble / mh.size
    assert(overlap >= 0.8, s"simhash found ${sh.size}, minhash ${mh.size}, overlap $overlap")
  }

  test("q_dedup_ngram: every emitted pair's jaccard is exact") {
    val rows = DedupVariants.queries("q_dedup_ngram")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0))
  }

  test("q_dedup_embcos symmetric bound: scores within [-1,1] e4") {
    val rows = DedupVariants.queries("q_dedup_embcos")(spark, sf).collect()
    assert(rows.forall(r => r.getInt(3) >= 3500 && r.getInt(3) <= 10000))
  }

  test("q_dedup_embcos_lsh ⊆ exact twin; sub-blocked recall is useful") {
    val exact = DedupVariants.queries("q_dedup_embcos")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupVariants.queries("q_dedup_embcos_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "sub-blocking can only drop pairs, never invent them")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    info(s"embcos sub-blocked recall vs exact twin = $recall (${lsh.size}/${exact.size})")
    // ≥ 0.35-cosine pairs are ≤ ~69° apart; 4 sign planes with Hamming≤1
    // probing keep about half of them on random vectors (measured exactly
    // 7/14 at sf0.001 — deterministic, but pin the floor a notch under).
    assert(recall >= 0.45, s"recall collapsed: $recall")
  }

  test("q_sim_lsh: recall@5 vs brute force is useful, self-match at rank 1") {
    val ann = Similarity.queries("q_sim_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val exact = LlmOps.queries("q_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every query finds itself first (same bucket, cosine 1)
    (0L until 10L).foreach { q =>
      assert(ann.exists(a => a._1 == q && a._2 == q && a._3 == 1), s"query $q missing self")
    }
    val annSet = ann.map(a => (a._1, a._2)).toSet
    val recall = exact.count(annSet.contains).toDouble / exact.length
    assert(recall >= 0.3, s"ANN recall@5 = $recall")
    info(s"ANN recall@5 vs brute force = $recall")
  }

  test("q_sim_pq: self-match at rank 1, candidates respect ADC, recall vs brute force useful") {
    val pq = Similarity.queries("q_sim_pq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // a query's own vector has ADC distance 0 → always a candidate, and
    // exact re-rank puts cosine 1 first
    (0L until 10L).foreach { q =>
      assert(pq.exists(p => p._1 == q && p._2 == q && p._3 == 1), s"query $q missing self")
    }
    val exact = LlmOps.queries("q_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pqSet = pq.map(p => (p._1, p._2)).toSet
    val recall = exact.count(pqSet.contains).toDouble / exact.length
    info(s"PQ recall@5 vs brute force = $recall (2×8 sampled codebook, top-20 re-rank)")
    assert(recall >= 0.3, s"PQ recall collapsed: $recall")
  }

  test("q_dedup_cluster_star ≡ q_dedup_cluster (two algorithms, one answer)") {
    val lp = LlmOps.queries("q_dedup_cluster")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val star = LlmOps.queries("q_dedup_cluster_star")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lp.nonEmpty && lp == star)
  }

  test("q_lang_id covers all docs; accuracy is deterministic and sane") {
    val rows = TextAnalysis.queries("q_lang_id")(spark, sf).collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    val acc = rows.count(_.getBoolean(3)).toDouble / rows.length
    info(s"lang-id self-trained accuracy = $acc")
    assert(acc > 0.0)
  }

  test("q_fingerprint: near-dup docs share min_hash; fingerprints are stable") {
    val fp = TextAnalysis.queries("q_fingerprint")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = LlmOps.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val high = pairs.filter(_._3 >= 0.95)
    assert(high.nonEmpty)
    val share = high.count { case (a, b, _) => fp(a) == fp(b) }.toDouble / high.size
    assert(share >= 0.8, s"only $share of >=0.95-jaccard pairs share min_hash")
  }

  test("q_sentiment: lexicon score matches a brute-force token count") {
    val lex = Map("fast" -> 2, "slow" -> -2, "big" -> 1, "small" -> -1, "dup" -> -3)
    val texts = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    TextAnalysis.queries("q_sentiment")(spark, sf).collect().foreach { r =>
      val want = texts(r.getLong(0)).trim.toLowerCase.split(" ")
        .map(t => lex.getOrElse(t, 0)).sum
      assert(r.getInt(1) == want, s"doc ${r.getLong(0)}")
      assert(r.getString(2) == (if (want > 2) "pos" else if (want < -2) "neg" else "neutral"))
    }
  }

  test("q_tok_cooccur matches a brute-force vocabulary co-occurrence count") {
    val rows = TextAnalysis.queries("q_tok_cooccur")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 20)
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().map(_.getString(0))
    val docSets = docs.map(_.trim.toLowerCase.split(" ").filter(_.length >= 4).toSet)
    val df = docSets.flatten.groupBy(identity).view.mapValues(_.length).toMap
    val vocab = df.toSeq.sortBy { case (t, n) => (-n, t) }.take(50).map(_._1).toSet
    rows.foreach { case (ta, tb, nCo) =>
      assert(vocab(ta) && vocab(tb) && ta < tb)
      assert(nCo == docSets.count(s => s(ta) && s(tb)),
        s"pair ($ta,$tb): $nCo vs brute ${docSets.count(s => s(ta) && s(tb))}")
    }
  }

  test("q_quality_score: score matches a brute-force reimplementation of the model") {
    val rows = TextAnalysis.queries("q_quality_score")(spark, sf).collect()
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val texts = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      val toks = t.trim.toLowerCase.split(" ")
      val nTok = toks.length.toLong
      val stopR = toks.count(stop) * 10000L / nTok
      val alphaR = t.toLowerCase.count(c => c >= 'a' && c <= 'z') * 10000L / t.length
      val punct = t.count(".,!?;:".contains(_)).toLong
      val digits = t.count(_.isDigit).toLong
      val score = 2L * math.min(nTok, 500) + 3L * stopR / 10 + alphaR / 5 - 8L * punct - 4L * digits
      assert(r.getLong(4) == score, s"doc ${r.getLong(0)}: ${r.getLong(4)} vs $score")
      assert(r.getBoolean(5) == (score >= 2500))
    }
  }

  test("degenerate LSH bucket cap: boilerplate clique shed, non-degenerate recall unaffected") {
    // Planted corpus: a 40-doc exact-boilerplate clique (every band bucket
    // holds all 40 → degenerate) plus 10 disjoint-vocabulary near-dup pairs
    // (J ≈ 0.93, comfortably over the τ=0.5 verify and the 8×4 band curve).
    val boiler = (0 until 60).map(w => s"boiler_$w").mkString(" ")
    val boilerDocs = (0L until 40L).map(i => (1000L + i, boiler))
    val planted = (0 until 10).flatMap { k =>
      val words = (0 until 30).map(w => s"w${k}_$w")
      Seq((2000L + 2 * k, words.mkString(" ")),
          (2000L + 2 * k + 1, (words.dropRight(1) :+ s"z$k").mkString(" ")))
    }
    import spark.implicits._
    val docs = (boilerDocs ++ planted).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      graft.functions.TextHashes.shingles(5)(split(trim(col("text")), " ")).as("sh"))
    def pairs(cap: Int): Set[(Long, Long)] =
      LlmOps.minhashVerifiedPairs(sh, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(32)
    val uncapped = pairs(Int.MaxValue)
    val isBoiler = (p: (Long, Long)) => p._1 < 2000L
    // the cap sheds the 40-doc clique's 780 in-bucket pairs entirely...
    assert(!capped.exists(isBoiler), s"degenerate pairs leaked: ${capped.filter(isBoiler).take(5)}")
    assert(uncapped.count(isBoiler) == 40 * 39 / 2,
      s"uncapped expansion should materialize the full clique, got ${uncapped.count(isBoiler)}")
    // ...while every non-degenerate planted pair is still found, and the
    // non-degenerate output is bit-identical with and without the cap.
    (0 until 10).foreach { k =>
      assert(capped.contains((2000L + 2 * k, 2000L + 2 * k + 1)), s"planted pair $k lost")
    }
    assert(capped == uncapped.filterNot(isBoiler), "cap must only affect degenerate buckets")
  }

  test("q_dedup_contain: containment bounds dominate jaccard; near-dup pairs agree") {
    val rows = DedupVariants.queries("q_dedup_contain")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, ca, cb, j) =>
      assert(a < b)
      assert(math.max(ca, cb) >= 8000, s"pair ($a,$b) below threshold")
      // containment of either side always dominates Jaccard (|A∩B|/|A| ≥ |A∩B|/|A∪B|)
      assert(ca >= j && cb >= j, s"containment < jaccard for ($a,$b)")
    }
    // symmetric cross-check: containment pairs that are ALSO J ≥ 0.5 must be
    // exactly the ones the minhash near-dup family finds (recall there is
    // 100% on this corpus, oracle-pinned)
    val near = LlmOps.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.filter(_._5 >= 5000).foreach { case (a, b, _, _, _) =>
      assert(near.contains((a, b)), s"high-J containment pair ($a,$b) missing from q_dedup_near")
    }
  }

  test("q_pagerank: full rank audit — 20 rows, ordered, above damping floor") {
    val rows = TextAnalysis.queries("q_pagerank")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 20)
    assert(rows.map(_._3).toSeq == (1 to 20), "rnk must be 1..20 in order")
    assert(rows.sliding(2).forall { case Array(x, y) => x._2 >= y._2; case _ => true },
      "pr_e6 must be non-increasing with rank")
    // every node's rank = 150000 + damped inbound mass > the base alone
    assert(rows.forall(_._2 > 150000L), "ranks must exceed the damping floor")
  }

  test("q_bpe_encode: merges only ever shrink; corpus actually compresses") {
    val rows = TextAnalysis.queries("q_bpe_encode")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.foreach { case (id, _, chars, syms, comp) =>
      assert(syms <= chars, s"doc $id grew under BPE")
      assert(comp == syms * 10000 / chars)
    }
    assert(rows.exists(_._5 < 10000), "the 3 learned merges should compress some doc")
  }

  test("q_emb_rp: projections equal a driver-side exact reference") {
    val rows = Similarity.queries("q_emb_rp")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val emb = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.size == emb.size * 16)
    // exact integer equality for a sample of vectors x all 16 planes: the
    // ±float sums are exact in double, so there is exactly one right answer
    emb.keys.take(20).foreach { vid =>
      Similarity.rpPlanes.zipWithIndex.foreach { case (w, j) =>
        val expect = math.round(
          emb(vid).zip(w).map { case (x, p) => x.toDouble * p }.sum * 10000)
        assert(rows((vid, j)) == expect, s"proj mismatch vec=$vid plane=$j")
      }
    }
  }

  test("q_ccnet_bucket: DistRank composite-key path ≡ plain per-lang NTILE window") {
    val got = TextAnalysis.queries("q_ccnet_bucket")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3), r.getString(4)))
    assert(got.length == graft.Tables.documents(spark, sf).count())
    // reference: the formulation the operator deliberately avoids at scale
    val lm = TextAnalysis.queries("q_unigram_lm")(spark, sf)
      .select(col("doc_id"), col("per_tok_e4"))
      .join(graft.Tables.documents(spark, sf).select(col("doc_id"), col("lang")), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("per_tok_e4"), col("doc_id"))
    val want = lm.withColumn("tercile", ntile(3).over(w)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("tercile")).toMap
    got.foreach { case (id, _, _, terc, bucket) =>
      assert(terc == want(id), s"doc $id: DistRank tercile $terc != window ${want(id)}")
      assert(bucket == Seq("head", "middle", "tail")(terc - 1))
    }
  }

  test("q_winnow fingerprints equal a driver-side exact MOSS reference") {
    val got = TextAnalysis.queries("q_winnow")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getString(5))).toList
    val docs = graft.Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got.size == docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h28(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    got.foreach { case (id, nWin, nFp, dens, fpMin, fpHash) =>
      val toks = docs(id).trim.split(" ").toSeq
      val grams = if (toks.length <= 5) Seq(toks.mkString(" "))
                  else toks.sliding(5).map(_.mkString(" ")).toSeq
      val hx = grams.map(h28)
      val mins = if (hx.length <= 4) Seq(hx.min)
                 else hx.sliding(4).map(_.min).toSeq
      val fp = mins.distinct.sorted
      assert(nWin == mins.length, s"doc $id window count")
      assert(nFp == fp.length && fpMin == fp.head, s"doc $id fingerprint set")
      assert(dens == fp.length.toLong * 10000 / mins.length)
      val refHash = md.digest(fp.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fpHash == refHash, s"doc $id fp_hash mismatch")
    }
  }

  test("q_sim_rp_topk: self-match at rank 1, recall vs brute force useful") {
    val rp = Similarity.queries("q_sim_rp_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    (0L until 10L).foreach { q =>
      assert(rp.exists(p => p._1 == q && p._2 == q && p._3 == 1), s"query $q missing self")
    }
    val exact = LlmOps.queries("q_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rpSet = rp.map(p => (p._1, p._2)).toSet
    val recall = exact.count(rpSet.contains).toDouble / exact.length
    info(s"RP-prefilter recall@5 vs brute force = $recall (16-dim, top-40 re-rank)")
    assert(recall >= 0.5, s"RP recall collapsed: $recall")
  }

  test("q_feat_hash: hashed tf mass equals token count; 64-bucket width") {
    val rows = TrainingOps.queries("q_feat_hash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, b, tf) => b >= 0 && b < 64 && tf >= 1 })
    val perDoc = rows.groupBy(_._1)
    perDoc.foreach { case (_, rs) => assert(rs.map(_._2).distinct.size == rs.size) }
    val tokCounts = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(lower(col("text"))), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (id, rs) =>
      assert(rs.map(_._3).sum == tokCounts(id), s"doc $id hashed tf mass != token count")
    }
  }

  test("q_ann_recall agrees with a direct join of the two pipelines") {
    val got = Similarity.queries("q_ann_recall")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lsh = Similarity.queries("q_sim_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = LlmOps.queries("q_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.groupBy(_._1)
    assert(got.map(_._1).toSet == exact.keySet)
    got.foreach { case (q, nHit, recE4) =>
      val expect = exact(q).count(lsh.contains).toLong
      assert(nHit == expect, s"q=$q n_hit=$nHit expected $expect")
      assert(recE4 == nHit * 10000 / 5)
      assert(nHit >= 1, s"q=$q must at least recall itself")
    }
  }

  test("q_substr_dedup equals a driver-side positional 8-gram df walk") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" ", -1).toSeq)
    def grams(toks: Seq[String]): Seq[String] =
      if (toks.length <= 8) Seq(toks.mkString(" "))
      else toks.sliding(8).map(_.mkString(" ")).toSeq
    val docGrams = docs.map { case (id, t) => id -> grams(t) }
    val df = docGrams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val want = docGrams.map { case (id, gs) =>
      val nDup = gs.count(g => df(g) >= 2).toLong
      id -> (gs.size.toLong, nDup, nDup * 10000 / gs.size)
    }.toMap
    val got = DedupVariants.queries("q_substr_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(want.values.exists(_._2 > 0), "fixture must contain duplicated spans")
    assert(want.values.exists(_._2 == 0), "and non-duplicated docs")
  }

  test("q_bigram_lm: in-vocabulary scores are non-negative; repeated docs score low") {
    val rows = TextAnalysis.queries("q_bigram_lm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.foreach { case (id, n, tot, per) =>
      assert(n >= 1)
      assert(tot >= 0, s"doc $id: self-trained NLL can never be negative")
      assert(per == math.round(tot.toDouble / n))
    }
    // a bigram seen only once scores ln(c1/1) > 0; fully-repetitive docs
    // (every bigram frequent relative to its history) sit near 0 — the
    // spread is the signal; assert it exists
    assert(rows.map(_._4).distinct.length > 10, "per-bigram NLL must discriminate docs")
  }

  test("q_entropy equals a driver-side exact token-entropy computation") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split(" ", -1).toSeq)
    val want = docs.map { case (id, toks) =>
      val tf = toks.groupBy(identity).map { case (_, v) => v.size.toLong }
      val L = toks.size.toLong
      val ent = tf.map(c => math.round(1e4 * (c.toDouble / L) * math.log(L.toDouble / c))).sum
      id -> (L, tf.size.toLong, ent)
    }.toMap
    val got = TextAnalysis.queries("q_entropy")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    // entropy is maximal when all tokens distinct: bounded by ln(L), plus
    // per-term rounding slack (≤ 0.5 units per distinct term)
    got.foreach { case (id, (l, nd, e)) =>
      assert(e <= math.round(1e4 * math.log(l.toDouble)) + (nd + 1) / 2,
        s"doc $id entropy above ln(L) bound") }
  }

  test("q_knn_graph: edges are mutual top-3 and scores match exact cosine") {
    val rows = Similarity.queries("q_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty, "knn graph should produce edges at sf0.001")
    rows.foreach { case (u, v, _) => assert(u < v) }
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length)
    // verify emitted scores against exact cosine from raw embeddings
    val emb = graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.foreach { case (u, v, s) =>
      assert(math.abs(s - math.round(cos(emb(u), emb(v)) * 10000)) <= 1,
        s"edge ($u,$v) score drift")
    }
  }

  test("q_zipf_fit: OLS over top-100 rank/freq matches a driver fit; slope is negative") {
    val counts = graft.Tables.documents(spark, sf)
      .selectExpr("explode(split(trim(lower(text)), ' ')) as t")
      .groupBy("t").count().collect().map(r => (r.getString(0), r.getLong(1)))
    val top = counts.sortBy { case (t, c) => (-c, t) }.take(100)
    val xy = top.zipWithIndex.map { case ((_, c), i) =>
      (math.round(1e6 * math.log(i + 1.0)), math.round(1e6 * math.log(c.toDouble)))
    }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum; val sxx = xy.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val wantSlope = math.round(1e6 * slope)
    val wantIcept = math.round((sy.toDouble - slope * sx) / n.toDouble)
    val r = graft.SparkEntry.queries("q_zipf_fit")(spark, sf).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((n, wantSlope, wantIcept)),
      s"got=$r want=($n, $wantSlope, $wantIcept)")
    assert(wantSlope < 0, "natural-language rank/frequency slope must be negative")
  }

  test("q_kmv_sketch: estimator within theta-sketch error of the exact jaccard") {
    val rows = graft.SparkEntry.queries("q_kmv_sketch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, common, est, exact) =>
      assert(common <= 128, s"($a,$b) common=$common exceeds k")
      assert(est >= 0 && est <= 10000 && exact >= 0 && exact <= 10000)
      // k=128 → stderr ≈ sqrt(j(1-j)/k) ≤ 0.045; allow 4 sigma
      assert((est - exact).abs <= 1800, s"($a,$b) est=$est exact=$exact off by ${(est - exact).abs}")
    }
  }
}
