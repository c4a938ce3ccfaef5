package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted-BM25-index contract (round-11 verdict #4 — the sparse twin
  * of AnnIndexSpec):
  *  - a probe plans ONLY the query terms' posting shards (partition pruning
  *    is the inverted-list lookup);
  *  - refresh folds the corpus CDF by exact integer deltas and equals a
  *    from-scratch rebuild of the head corpus, bit for bit;
  *  - an untouched shard's data files carry over by IDENTITY;
  *  - rebuilds publish through the shared generation pointer (old results
  *    until the swap). */
class TextIndexSpec extends SparkSpec {

  private val fmt = "graft.sources.StoreSink"
  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def freshDir(name: String): String = {
    val dir = s"target/tmp/textindex_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  /** A corpus whose term sets are knowable: doc 1..4 share "alpha", half
    * carry "bravo", one carries "zulu". */
  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "alpha bravo common words here"),
      (2L, "alpha common words again here"),
      (3L, "alpha bravo more common words"),
      (4L, "alpha zulu rare words here")).toDF("doc_id", "text")
  }

  private def seedCorpusStore(dir: String, d: DataFrame): Unit = {
    val root = new Path(dir)
    StoreSink.writeExtras(root, fs, StoreSink.extrasOf(Seq(
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType))))
    d.select(col("doc_id").as("k"), lit("d").as("grp"), lit(0L).as("amt_cents"),
        col("text"))
      .coalesce(1)
      .write.format(fmt).mode("append").option("path", dir).save()
  }

  private def indexContent(idx: String): (Set[Seq[Any]], Set[Seq[Any]], (Long, Long)) = {
    // SCORING content only: `imp` is the top-k pruning accessory — its
    // quantization bakes build-time (nd, tl), so refresh deliberately
    // leaves it stale/null and disarms the bound (ImpProp) instead of
    // recomputing every shard; equality claims exclude it
    val po = spark.read.format(fmt).option("path", TextIndex.postingsPath(idx))
      .load()
      .select(col("k"), col("grp"), col("amt_cents"), col("term"), col("dl"))
      .collect().map(_.toSeq).toSet
    val tm = spark.read.format(fmt).option("path", TextIndex.termsPath(idx))
      .load().collect().map(_.toSeq).toSet
    (po, tm, TextIndex.stats(idx))
  }

  test("probe plans only the query terms' shards; scoring matches the " +
       "recompute kernel") {
    import spark.implicits._
    val idx = freshDir("probe_idx")
    val (nTm, nPl) = TextIndex.build(spark, docs, idx)
    assert(nTm > 0 && nPl > 0)
    // single-term query: the planned postings files must be exactly the
    // term's shard's files (zone hook counts planned files post-pruning)
    StoreSink.lastZonePrune = None
    val one = Seq(("zulu", 1L)).toDF("t", "df")
    val scored = TextIndex.score(spark, idx, one).collect()
    assert(scored.length == 1 && scored(0).getLong(0) == 4L,
      s"zulu lives in doc 4 only: ${scored.toSeq}")
    val entries = StoreSink.readEntries(
      new Path(TextIndex.postingsPath(idx)), fs)
    val total = entries.size
    val planned = StoreSink.lastZonePrune
    assert(planned.exists { case (t, p) => p < t },
      s"single-term probe should plan a shard subset of $total files: $planned")
  }

  test("refresh == full rebuild of the head corpus, bit for bit; " +
       "untouched shards carry files by identity") {
    import spark.implicits._
    val corpus = freshDir("ref_corpus")
    val idx = freshDir("ref_idx")
    val twin = freshDir("ref_twin")
    seedCorpusStore(corpus, docs)
    TextIndex.buildFromStore(spark, corpus, idx)
    val filesBefore = StoreSink.readEntries(
      new Path(TextIndex.postingsPath(idx)), fs)
      .map(e => (e.part.getOrElse("?"), e.name)).toSet
    // CDC: doc 2 retires, doc 5 (fresh vocabulary) arrives
    new StoreTable(corpus).deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("k", 2L)))
    Seq((5L, "d", 0L, "yankee words appear here now"))
      .toDF("k", "grp", "amt_cents", "text")
      .coalesce(1)
      .write.format(fmt).mode("append").option("path", corpus).save()
    val (nDocs, nShards) = TextIndex.refresh(spark, idx)
    assert(nDocs == 2L && nShards >= 1,
      s"one delete + one insert changed 2 docs: ($nDocs, $nShards)")
    // twin: a from-scratch build over the HEAD corpus
    TextIndex.buildFromStore(spark, corpus, twin)
    val (po1, tm1, st1) = indexContent(idx)
    val (po2, tm2, st2) = indexContent(twin)
    assert(st1 == st2, s"stats drifted: $st1 vs $st2")
    assert(tm1 == tm2, "dictionary drifted from the rebuild")
    assert(po1 == po2, "postings drifted from the rebuild")
    // shards untouched by the delta keep their FILES (identity, not just
    // content) — maintenance cost is the touched shards only
    val filesAfter = StoreSink.readEntries(
      new Path(TextIndex.postingsPath(idx)), fs)
      .map(e => (e.part.getOrElse("?"), e.name)).toSet
    val changedTerms = Seq("alpha", "common", "words", "again", "here",
      "yankee", "appear", "now") // doc 2's + doc 5's vocab
    val touchedShards = changedTerms.toDF("t")
      .select(concat(lit("b"), pmod(hash(col("t")), lit(16)).cast("string")))
      .distinct().collect().map(_.getString(0)).toSet
    val untouchedBefore = filesBefore.filterNot { case (p, _) =>
      touchedShards.exists(p.endsWith) }
    assert(untouchedBefore.nonEmpty, "fixture: need at least one untouched shard")
    assert(untouchedBefore.subsetOf(filesAfter),
      "untouched shards must carry their files by identity across refresh")
  }

  test("impact-ordered top-k: skips files the bound excludes, equals the " +
       "full scoring; refresh disarms the bound until rebuild") {
    import spark.implicits._
    val idx = freshDir("topn_idx")
    val corpus = freshDir("topn_corpus")
    // 300 docs, tf of the probe term varies 1..5 and lengths vary — the
    // impact-banded files get discriminating zones
    val big = (1 to 300).map { i =>
      val tf = 1 + i % 5
      val filler = (1 to (3 + i % 7)).map(j => s"w${(i + j) % 40}").mkString(" ")
      (i.toLong, (Seq.fill(tf)("alphaword") :+ filler).mkString(" "))
    }.toDF("doc_id", "text")
    seedCorpusStore(corpus, big)
    TextIndex.buildFromStore(spark, corpus, idx)
    TextIndex.lastTopNFiles = None
    val et = TextIndex.probeTopN(spark, idx, topk = 10).collect()
    val pruned = TextIndex.lastTopNFiles.get
    assert(pruned._1 >= 1 && pruned._1 < pruned._2,
      s"impact bound must skip files: planned ${pruned._1} of ${pruned._2}")
    // rank-safe: equals the full single-term scoring
    val dict = TextIndex.terms(spark, idx)
    val qt = dict.where(length(col("t")) >= 4)
      .orderBy(col("df").desc, col("t")).limit(1)
    val full = TextIndex.score(spark, idx, qt)
      .select(col("doc_id"), col("bm25_e4"))
      .orderBy(col("bm25_e4").desc, col("doc_id")).limit(10).collect()
    assert(et.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq,
      "early-terminated top-k must equal the full scoring")
    // refresh stage 1: delete a LONGER-than-average doc (doc 34: tf 5 +
    // 9 filler words, avg dl ≈ 9) — the nd/tl ratio RISES, stored
    // impacts remain upper bounds, the vintage advances, and the probe
    // keeps pruning AND keeps equalling the full scoring
    new StoreTable(corpus).deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("k", 34L)))
    TextIndex.refresh(spark, idx)
    TextIndex.lastTopNFiles = None
    val armed = TextIndex.probeTopN(spark, idx, topk = 10).collect()
    val mid = TextIndex.lastTopNFiles.get
    assert(mid._1 < mid._2,
      s"a ratio-raising refresh must keep the bound armed: $mid")
    val full2 = TextIndex.score(spark, idx,
        TextIndex.terms(spark, idx).where(length(col("t")) >= 4)
          .orderBy(col("df").desc, col("t")).limit(1))
      .select(col("doc_id"), col("bm25_e4"))
      .orderBy(col("bm25_e4").desc, col("doc_id")).limit(10).collect()
    assert(armed.map(_.toSeq).toSeq == full2.map(_.toSeq).toSeq,
      "armed post-refresh top-k must still equal the full scoring")
    // refresh stage 2: delete a SHORTER-than-average doc (doc 7: tf 3 +
    // 3 filler) — the ratio drops below the vintage, stale impacts can
    // under-bound, the probe falls back to every candidate file
    new StoreTable(corpus).deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("k", 7L)))
    TextIndex.refresh(spark, idx)
    TextIndex.lastTopNFiles = None
    TextIndex.probeTopN(spark, idx, topk = 10).collect()
    val post = TextIndex.lastTopNFiles.get
    assert(post._1 == post._2,
      s"a ratio-dropping refresh must disarm the bound: $post")
  }

  test("ordered (impact-banded) writes mark the store: the k-sorted " +
       "per-file ordering claim withdraws") {
    val idx = freshDir("ordmark_idx")
    TextIndex.build(spark, docs, idx)
    val plRoot = new Path(TextIndex.postingsPath(idx))
    // postings files are (shard, imp)-sorted, NOT k-sorted — without the
    // marker, SupportsReportOrdering's per-partition `k ASC` claim could
    // activate over them and a merge join would drop Sorts on unsorted
    // keys (review catch)
    assert(StoreSink.readProps(plRoot, fs).toMap
      .contains(StoreSink.OrderedByProp),
      "orderedBy commits must withdraw the k-sort claim")
  }

  test("rebuild publishes through the generation pointer: old probe " +
       "results until the swap") {
    val idx = freshDir("gen_idx")
    TextIndex.build(spark, docs, idx)
    val before = TextIndex.probeTop(spark, idx, topk = 5)
      .collect().map(_.toSeq).toSet
    import spark.implicits._
    val docs2 = docs.select(col("doc_id") + 100 as "doc_id", col("text"))
    var mid: Set[Seq[Any]] = null
    AnnIndex.onBeforeIndexPublish = () => {
      mid = TextIndex.probeTop(spark, idx, topk = 5)
        .collect().map(_.toSeq).toSet
    }
    try TextIndex.build(spark, docs2, idx)
    finally AnnIndex.onBeforeIndexPublish = () => ()
    assert(mid == before, "probe in the stage window must see the old gen")
    val after = TextIndex.probeTop(spark, idx, topk = 5)
      .collect().map(_.toSeq).toSet
    assert(after != before && after.forall(_.head.asInstanceOf[Long] > 100),
      s"post-swap probes read the new generation: $after")
    assert(AnnIndex.dropStaleGenerations(idx) == 1)
  }
}
