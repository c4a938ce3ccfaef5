package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingOpsSpec extends SparkSpec {

  test("q_pack_seq matches a sequential per-language packing fold") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).trim.split(" ").length.toLong))
    // reference: walk each language stream in doc_id order, fixed 2048 stride
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      var cum = 0L
      rows.sortBy(_._1).toSeq.map { case (id, _, n) =>
        val bin = cum / 2048; cum += n; (lang, bin, id, n)
      }
    }.groupBy(t => (t._1, t._2))
      .map { case ((lang, bin), g) =>
        (lang, bin, g.size.toLong, g.map(_._4).sum, g.map(_._3).min, g.map(_._3).max)
      }.toSet
    val got = TrainingOps.queries("q_pack_seq")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }

  test("q_sample_strat: deterministic and per-stratum rates in ballpark") {
    val a = TrainingOps.queries("q_sample_strat")(spark, sf).collect()
    val b = TrainingOps.queries("q_sample_strat")(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    val totals = graft.Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    // fr is the 50% stratum — with ≥20 docs it must dominate en's 5% rate
    for ((lang, n) <- sampled) assert(n <= totals(lang))
    assert(sampled.getOrElse("fr", 0L).toDouble / totals("fr") >
           sampled.getOrElse("en", 0L).toDouble / totals("en"))
  }

  test("q_semdedup: drops bounded by membership; all non-zero vectors bucketed") {
    val rows = TrainingOps.queries("q_semdedup")(spark, sf).collect()
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1)))
    val nz = graft.Tables.embeddings(spark, sf)
      .where(expr("aggregate(embedding, 0D, (a, x) -> a + abs(cast(x as double)))") > 0)
      .count()
    assert(rows.map(_.getLong(1)).sum == nz)
  }

  test("q_emb_quantize: codes bounded, error within half a quantization step") {
    val rows = TrainingOps.queries("q_emb_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getString(2).split(",").map(_.toInt)
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec ${r.getLong(0)}: code out of int8 range")
      assert(codes.exists(c => math.abs(c) == 127), "amax element must hit full scale")
      // max dequant error ≤ scale/2 (+1 unit slack for the e6/e9 rounding)
      assert(r.getLong(3) <= r.getLong(1) / 2000 + 1,
        s"vec ${r.getLong(0)}: err_e6=${r.getLong(3)} vs scale_e9=${r.getLong(1)}")
    }
  }

  test("q_data_mix: weighted repetition matches a brute-force md5 walk") {
    val rows = TrainingOps.queries("q_data_mix")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val brute = docs.map { case (id, src) =>
      val w = if (src < "src1") 150 else if (src < "src2") 50 else 100
      val b = md.digest(id.toString.getBytes)(0) & 0xff
      val copies = w / 100 + (if (b * 100 < (w % 100) * 256) 1 else 0)
      (src, copies)
    }.groupBy(_._1).view.mapValues { cs =>
      (cs.count(_._2 > 0).toLong, cs.map(_._2).sum.toLong)
    }.toMap
    brute.filter(_._2._2 > 0).foreach { case (src, want) =>
      assert(rows(src) == want, s"source $src: ${rows.get(src)} vs $want")
    }
    // upweighted source emits MORE than its doc count, downweighted fewer
    assert(rows("src0")._2 > rows("src0")._1)
    assert(rows("src1")._2 < docs.count(_._2 == "src1"))
  }

  test("q_dataset_split: partitions are complete and roughly 80/10/10") {
    val rows = TrainingOps.queries("q_dataset_split")(spark, sf).collect()
    val total = graft.Tables.documents(spark, sf).count()
    val bySplit = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.values.sum == total, "splits must cover every document exactly once")
    assert(bySplit("train").toDouble / total > 0.7 && bySplit("train").toDouble / total < 0.9)
    assert(bySplit.keySet == Set("train", "val", "test"))
  }

  test("q_emb_kmeans: both assignment rounds are total over non-zero vectors") {
    val rows = TrainingOps.queries("q_emb_kmeans")(spark, sf).collect()
    val nz = graft.Tables.embeddings(spark, sf)
      .where(expr("aggregate(embedding, 0D, (a, x) -> a + abs(cast(x as double)))") > 0)
      .count()
    assert(rows.map(_.getLong(1)).sum == nz)
    assert(rows.map(_.getLong(2)).sum == nz)
    assert(rows.map(_.getLong(0)).toSet == (100L to 115L).toSet)
  }

  test("q_epoch_order matches a driver-side LCG sort; epochs permute differently") {
    val ids = graft.Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val consts = Seq((0L, 48271L, 11L), (1L, 69621L, 37L), (2L, 40692L, 73L))
    val want = consts.flatMap { case (e, a, b) =>
      ids.map(id => (id, (a * id + b) % 1000003L)).sortBy { case (id, k) => (k, id) }
        .take(10).zipWithIndex
        .map { case ((id, k), i) => (e, i + 1, id, k) }
    }
    val got = TrainingOps.queries("q_epoch_order")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"got=$got want=$want")
    // different multipliers must yield different leading orders
    val heads = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).values.toSeq
    assert(heads.distinct.size == 3, "epoch permutations should differ")
  }

  test("q_curriculum: stages partition the corpus into balanced, ordered score bands") {
    val rows = TrainingOps.queries("q_curriculum")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(rows.map(_._2).sum == nDocs, "stages must partition the corpus")
    // NTILE balance: sizes differ by at most 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // easy -> hard: score bands are non-decreasing across stages (equality
    // allowed when one score value straddles a stage boundary)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"stage bands out of order: $lo vs $hi")
    }
  }

  test("q_sample_topp equals a sequential nucleus walk per language") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).map { case (lang, ds) =>
      val ordered = ds.sortBy(d => (-d._3, d._1))
      val total = ordered.map(_._3).sum
      val thr = (total * 4 + 4) / 5
      var cum = 0L
      val kept = ordered.takeWhile { d => val before = cum; cum += d._3; before < thr }
      lang -> (ds.length.toLong, kept.length.toLong, total, kept.map(_._3).sum)
    }
    val got = TrainingOps.queries("q_sample_topp")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want, s"got=$got want=$want")
    // nucleus property: kept weight reaches 80% but dropping the last kept
    // doc would fall below it
    got.foreach { case (lang, (_, nKept, total, wKept)) =>
      assert(wKept * 5 >= total * 4, s"$lang kept < 80%")
      assert(nKept >= 1)
    }
  }

  test("q_cluster_purity: buckets are centroids, sizes total the corpus, purity exact") {
    val rows = TrainingOps.queries("q_cluster_purity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val nz = graft.Tables.embeddings(spark, sf)
      .where(expr("aggregate(embedding, 0D, (a, x) -> a + abs(cast(x as double)))") > 0)
      .count()
    assert(rows.map(_._2).sum == nz, "cluster sizes must partition the non-zero corpus")
    rows.foreach { case (b, n, _, majN, purity) =>
      assert(b >= 100 && b <= 115)
      assert(majN >= 1 && majN <= n)
      assert(purity == majN * 10000 / n)
    }
  }
}
