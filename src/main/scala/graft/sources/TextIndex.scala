package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField}

/** PERSISTED SPARSE (BM25) TEXT INDEX — the sparse twin of [[AnnIndex]]
  * (round-11 verdict #4): q_bm25 recomputes the whole tf/df/dlen stack
  * inside every query; a retrieval system builds those tables ONCE and
  * serves queries from them (Lucene's inverted index as a table). Both
  * halves are ordinary graft-store tables under the shared generation
  * pointer ([[IndexGen]] — rebuilds stage aside and publish atomically):
  *
  *  - `postings` — one row per (term, doc): k = doc_id, grp = the term's
  *    SHARD (`b<hash(t) % 16>`), amt_cents = tf, trailing `term` (string)
  *    and `dl` (the doc's length, denormalized the way impact-ordered
  *    posting formats carry norms — scoring never joins a doclen table).
  *    IDENTITY-PARTITIONED on the shard: a probe for q query terms PLANS
  *    only their shards' partitions (the store's partition pruning is the
  *    posting-list lookup), never the corpus. Sharding, not term-per-
  *    partition: vocabulary is unbounded, shards are fixed — the file
  *    count stays sane at any corpus size while pruning stays
  *    term-selective (≤ q of 16 shards).
  *  - `terms` — the dictionary: k = xxhash64(term) (zone locality only;
  *    the string is the key), grp = shard, amt_cents = df, trailing
  *    `term`. Same partitioning, so df lookups prune the same way.
  *  - corpus stats (nd = docs, tl = total tokens) ride the terms store's
  *    `_props` as exact integers, with corpus provenance for [[refresh]].
  *
  * Tokenization and scoring replicate ops/TextAnalysis q_bm25 EXACTLY
  * (split-on-space of trimmed lowercase text; Okapi k1=1.2 b=0.75,
  * per-term e4 rounding before the integer sum), so an indexed probe is
  * bit-identical to the recompute pipeline and SHARES its DuckDB oracle —
  * the AnnIndex "persisted == retrained" contract, sparse edition.
  *
  * Maintenance is INCREMENTAL ([[refresh]]): the corpus store's change
  * feed is re-tokenized (CDF delete rows carry the dead doc's text, so
  * deletes never read the index), df/nd/tl adjust by exact integer
  * deltas, and only TOUCHED shards rewrite in one replace-set commit —
  * cost tracks changed docs' tokens, never the corpus. */
object TextIndex {

  private val Fmt = "graft.sources.StoreSink"
  val CorpusProp = "graft.index.corpus"
  val VersionProp = "graft.index.corpus_version"
  val NdProp = "graft.text.nd"
  val TlProp = "graft.text.tl"
  private val Shards = 16

  private def pl(genRoot: String) = s"$genRoot/postings"
  private def tm(genRoot: String) = s"$genRoot/terms"

  def postingsPath(indexPath: String): String = pl(IndexGen.dir(indexPath))
  def termsPath(indexPath: String): String = tm(IndexGen.dir(indexPath))

  /** The term's shard — hash-based, writer and probe evaluate the SAME
    * Spark expression (never re-implemented driver-side). */
  private def shardCol(t: org.apache.spark.sql.Column) =
    concat(lit("b"), pmod(hash(t), lit(Shards)).cast("string"))

  /** q_bm25's tokenizer, verbatim: split-on-space of trimmed lowercase. */
  private def tokensOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), " ")).as("t"))

  /** (tf, dlen) of a document set — the index's row ingredients. */
  private def tfOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val tf = tokensOf(docs).groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
    (tf, tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
  }

  /** Build the index from (doc_id, text) rows; stage-then-swap publish.
    * Returns (n_terms, n_postings). */
  def build(s: SparkSession, docs: DataFrame, indexPath: String,
            corpusRef: Option[(String, Int)] = None): (Long, Long) = {
    val gen = IndexGen.next(indexPath)
    val genRoot = s"$indexPath/$gen"
    val plRoot = new Path(pl(genRoot))
    val tmRoot = new Path(tm(genRoot))
    val fsys = StoreSink.fs(plRoot)
    StoreSink.writeExtras(plRoot, fsys, StoreSink.extrasOf(Seq(
      StructField("term", StringType), StructField("dl", LongType))))
    StoreSink.writeExtras(tmRoot, fsys, StoreSink.extrasOf(Seq(
      StructField("term", StringType))))
    val (tf, dlen) = tfOf(docs)
    val tfd = tf.join(dlen, "doc_id").localCheckpoint() // one tokenize pass
    tfd.select(col("doc_id").as("k"), shardCol(col("t")).as("grp"),
        col("tf").as("amt_cents"), col("t").as("term"), col("dl"))
      .write.format(Fmt).mode("append").option("path", pl(genRoot))
      .option("partitionedBy", "identity:grp").save()
    tfd.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .select(xxhash64(col("t")).as("k"), shardCol(col("t")).as("grp"),
        col("df").as("amt_cents"), col("t").as("term"))
      .write.format(Fmt).mode("append").option("path", tm(genRoot))
      .option("partitionedBy", "identity:grp").save()
    val st = dlen.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .collect()(0)
    StoreSink.withCommitLock(tmRoot, fsys) {
      val ps = StoreSink.readProps(tmRoot, fsys).toMap ++
        Map(NdProp -> st.getLong(0).toString, TlProp -> st.getLong(1).toString) ++
        corpusRef.map(r => CorpusProp -> r._1) ++
        corpusRef.map(r => VersionProp -> r._2.toString)
      StoreSink.writeProps(tmRoot, fsys, ps.toSeq)
    }
    val nTm = StoreSink.readEntries(tmRoot, fsys).map(_.rows).sum
    val nPl = StoreSink.readEntries(plRoot, fsys).map(_.rows).sum
    AnnIndex.onBeforeIndexPublish() // shared stage/publish-window hook
    IndexGen.publish(indexPath, gen)
    (nTm, nPl)
  }

  /** Build from a corpus STORE (k = doc_id, trailing `text`), recording
    * provenance so [[refresh]] can fold its change feed. */
  def buildFromStore(s: SparkSession, corpusPath: String,
                     indexPath: String): (Long, Long) = {
    val v = StoreSink.listVersions(new Path(corpusPath),
      StoreSink.fs(new Path(corpusPath))).lastOption.getOrElse(0)
    build(s, s.read.format(Fmt).option("path", corpusPath).load()
      .select(col("k").as("doc_id"), col("text")), indexPath, Some((corpusPath, v)))
  }

  /** Corpus stats (nd, tl) from the terms store's props — exact integers,
    * resolved once per probe and baked into the scoring expression as
    * literals (the oracle's cross-joined stats row, collapsed). */
  def stats(indexPath: String): (Long, Long) = statsAt(IndexGen.dir(indexPath))

  private def statsAt(genRoot: String): (Long, Long) = {
    val tmRoot = new Path(tm(genRoot))
    val ps = StoreSink.readProps(tmRoot, StoreSink.fs(tmRoot)).toMap
    (ps(NdProp).toLong, ps(TlProp).toLong)
  }

  /** The dictionary as (t, df). */
  def terms(s: SparkSession, indexPath: String): DataFrame =
    termsAt(s, IndexGen.dir(indexPath))

  private def termsAt(s: SparkSession, genRoot: String): DataFrame =
    s.read.format(Fmt).option("path", tm(genRoot)).load()
      .select(col("term").as("t"), col("amt_cents").as("df"))

  /** Score a (t, df) query-term list against the PERSISTED postings —
    * q_bm25's kernel with index-resident tf/dl and literal (nd, tl). The
    * term list is query-sized: its shard set (≤ |terms|) prunes postings
    * partition planning, the inverted-list lookup. */
  def score(s: SparkSession, indexPath: String, qterms: DataFrame): DataFrame =
    scoreAt(s, IndexGen.dir(indexPath), qterms)

  private def scoreAt(s: SparkSession, genRoot: String,
                      qterms: DataFrame): DataFrame = {
    val (nd, tl) = statsAt(genRoot)
    val q = qterms.select(col("t"), col("df")).localCheckpoint() // query-sized
    // driver-side shard list via the WRITER'S OWN expression (never a
    // re-implementation); bounded by |query terms|
    val shards = q.select(shardCol(col("t")).as("b")).distinct()
      .collect().map(_.getString(0)).toSeq
    val termList = q.select(col("t")).collect().map(_.getString(0)).toSeq
    s.read.format(Fmt).option("path", pl(genRoot)).load()
      .where(col("grp").isin(shards: _*)) // partition pruning = list lookup
      .where(col("term").isin(termList: _*))
      .select(col("k").as("doc_id"), col("term").as("t"),
              col("amt_cents").as("tf"), col("dl"))
      .join(broadcast(q), "t")
      .select(col("doc_id"), expr(
        s"""cast(round(1e4 * ln(1.0 + ($nd - df + 0.5) / (df + 0.5))
           |  * (tf * (1.2 + 1.0))
           |  / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * $nd / cast(${tl}L as double))))
           |as bigint)""".stripMargin).as("sc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("sc")).as("bm25_e4"))
  }

  /** The q_bm25 query executed index-resident: top-5 dictionary terms
    * (len ≥ 4, df desc, term) scored over their posting shards. */
  def probeTop(s: SparkSession, indexPath: String, topk: Int = 20): DataFrame = {
    val genRoot = IndexGen.dir(indexPath) // ONE generation end to end
    val qterms = termsAt(s, genRoot).where(length(col("t")) >= 4)
      .orderBy(col("df").desc, col("t")).limit(5)
    scoreAt(s, genRoot, qterms)
      .orderBy(col("bm25_e4").desc, col("doc_id")).limit(topk)
  }

  /** INCREMENTAL MAINTENANCE: fold the corpus store's change feed since
    * the indexed version. CDF delete rows carry the dead doc's TEXT, so
    * both sides re-tokenize from the feed alone — the index is never
    * consulted to find what a delete removes. Exact integer deltas:
    * nd ±= docs, tl ±= tokens; postings of changed docs leave/enter their
    * term shards; touched shards' DICTIONARY rows re-derive from the
    * rewritten postings (df = rows per term). Every step is
    * CRASH-IDEMPOTENT: the postings fold anti-joins the same changed-doc
    * set, the dict recompute is derived state, and (nd, tl, version)
    * land in ONE atomic props write LAST — a crash anywhere replays
    * cleanly from the old version. Returns (docs_changed,
    * shards_touched). */
  def refresh(s: SparkSession, indexPath: String): (Long, Long) = {
    val genRoot = IndexGen.dir(indexPath)
    val plRoot = new Path(pl(genRoot))
    val tmRoot = new Path(tm(genRoot))
    val fsys = StoreSink.fs(tmRoot)
    val props = StoreSink.readProps(tmRoot, fsys).toMap
    val corpus = props.getOrElse(CorpusProp, throw new IllegalStateException(
      s"index at $indexPath was not built from a corpus store — nothing to refresh"))
    val fromV = props(VersionProp).toInt
    val headV = StoreSink.listVersions(new Path(corpus),
      StoreSink.fs(new Path(corpus))).lastOption.getOrElse(0)
    if (headV == fromV) return (0L, 0L)
    val feed = StoreSink.changes(s, corpus, fromV, Some(headV))
      .select(col("op"), col("k").as("doc_id"), col("text"))
      .localCheckpoint() // CDF-sized: changed rows only
    val changedDocs = feed.select(col("doc_id")).distinct().localCheckpoint()
    def side(op: String): (DataFrame, DataFrame) =
      tfOf(feed.where(col("op") === op).select(col("doc_id"), col("text")))
    val (delTf, delDl) = side("delete")
    val (insTf, insDl) = side("insert")
    val insRows = insTf.join(insDl, "doc_id").localCheckpoint()
    // exact stat deltas (one collect over four bounded aggregates)
    val d = delDl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).collect()(0)
    val i = insDl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).collect()(0)
    // per-term df deltas; union gives the touched-term set
    val dfDelta = delTf.groupBy(col("t")).agg(count(lit(1)).as("ddel"))
      .join(insTf.groupBy(col("t")).agg(count(lit(1)).as("dins")), Seq("t"), "full")
      .na.fill(0L, Seq("ddel", "dins"))
      .localCheckpoint() // changed-vocabulary-sized
    val touched = dfDelta.select(shardCol(col("t")).as("b")).distinct()
      .collect().map(_.getString(0)).toSeq // ≤ 16 shards
    def replaceSet(root: Path): String = StoreSink.readEntries(root, fsys)
      .filter(_.part.exists(p => touched.exists(p.endsWith)))
      .map(_.name).mkString(",")
    if (touched.nonEmpty) {
      // postings: surviving rows of touched shards (anti-join on changed
      // docs — never a literal IN over data-sized keys) + fresh rows
      s.read.format(Fmt).option("path", pl(genRoot)).load()
        .where(col("grp").isin(touched: _*))
        .join(changedDocs.withColumnRenamed("doc_id", "k"), Seq("k"), "left_anti")
        .select(col("k"), col("grp"), col("amt_cents"), col("term"), col("dl"))
        .unionByName(insRows.select(col("doc_id").as("k"),
          shardCol(col("t")).as("grp"), col("tf").as("amt_cents"),
          col("t").as("term"), col("dl")))
        .write.format(Fmt).mode("append").option("path", pl(genRoot))
        .option("replace", replaceSet(plRoot))
        .option("preserveMarkers", "true").save()
      // dictionary rows for the touched shards DERIVED from the
      // just-rewritten postings (df = posting rows per term — (doc, term)
      // rows are unique by construction): a REPLAYED refresh recomputes
      // the identical rows, which delta arithmetic applied to an
      // already-adjusted dictionary would not — this is what makes a
      // crash between the dict commit and the version bump recoverable
      // by simply running refresh again
      s.read.format(Fmt).option("path", pl(genRoot)).load()
        .where(col("grp").isin(touched: _*))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .select(xxhash64(col("term")).as("k"), shardCol(col("term")).as("grp"),
          col("df").as("amt_cents"), col("term"))
        .write.format(Fmt).mode("append").option("path", tm(genRoot))
        .option("replace", replaceSet(tmRoot))
        .option("preserveMarkers", "true").save()
    }
    StoreSink.withCommitLock(tmRoot, fsys) {
      val ps = StoreSink.readProps(tmRoot, fsys).toMap
      val nd = ps(NdProp).toLong - d.getLong(0) + i.getLong(0)
      val tl = ps(TlProp).toLong - d.getLong(1) + i.getLong(1)
      StoreSink.writeProps(tmRoot, fsys, (ps ++ Map(
        NdProp -> nd.toString, TlProp -> tl.toString,
        VersionProp -> headV.toString)).toSeq)
    }
    (changedDocs.count(), touched.size.toLong)
  }
}
