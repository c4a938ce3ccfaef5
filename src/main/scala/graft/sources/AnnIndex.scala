package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField}

/** PERSISTED IVF ANN INDEX — the index as a MAINTAINED TABLE (verdict r9 #1).
  *
  * q_sim_ivf_kmeans retrains its codebook inside every query; at 100 TB an
  * index is an artifact you build once and probe many times, exactly like
  * FAISS persists a trained quantizer + inverted lists. Here both halves are
  * ordinary graft-store tables under `<indexPath>/`:
  *
  *  - `codebook`  — one row per trained centroid: k = centroid id (the seed
  *    vector's vec_id), amt_cents = cluster size n, sv_csv = the per-dim
  *    EXACT-INTEGER Lloyd sums in 2^-20 units. Persisting (sv, n) instead of
  *    the float centroid makes the reconstruction `cast((sv/1048576.0)/n as
  *    float)` BIT-IDENTICAL to training-time arithmetic — so a probe of the
  *    persisted index returns exactly what the retrain-per-query pipeline
  *    returns, and the DuckDB oracle keeps replaying training.
  *  - `postings`  — one row per indexed vector: k = vec_id, grp = assigned
  *    centroid id (as text), emb = the vector itself (comma-joined float
  *    literals; Spark's float→string→float round-trip is exact by the Java
  *    Float.toString contract). The store is IDENTITY-PARTITIONED on grp, so
  *    each centroid's posting list is its own partition — probing c cells
  *    PLANS c partitions (the store's partition pruning IS the inverted-list
  *    lookup), never a corpus scan.
  *
  * Training matches ops/TrainingOps.scala q_sim_ivf_kmeans line for line:
  * √n-derived stride seeds (k ≈ √n — codebook stays broadcast-sized and
  * the n·k assignment stays n^1.5, never quadratic) + ONE exact-integer
  * Lloyd step. Maintenance is INCREMENTAL: [[refresh]] folds the corpus
  * store's change feed (StoreSink.changes) into the postings under the
  * FROZEN codebook — cost tracks changed rows + touched partitions, the
  * q_store_ivm fold applied to index upkeep. At 100 TB: codebook is √n rows
  * (broadcast-sized), postings rewrite is O(touched posting lists), and a
  * probe reads nprobe lists only. */
/** Shared GENERATION-POINTER mechanics for persisted index artifacts
  * (AnnIndex's dense family and TextIndex's sparse one): tables live under
  * `gen-<n>/` directories; a `_current` pointer file — swapped in ONE
  * atomic namespace op — names the live generation. Rebuilds stage a whole
  * new generation and publish it with the pointer swap; readers resolve
  * the pointer ONCE per operation and see a complete generation either
  * way. A pointer-less root reads as its own generation (legacy). */
private[sources] object IndexGen {
  val CurrentPtr = "_current"

  def dir(indexPath: String): String = {
    val root = new Path(indexPath)
    StoreSink.readSmall(root, StoreSink.fs(root), CurrentPtr) match {
      case Some(g) if g.nonEmpty => s"$indexPath/$g"
      case _ => indexPath
    }
  }

  /** Allocate the next generation UNDER THE INDEX ROOT'S COMMIT LOCK and
    * materialize its directory inside the critical section — two racing
    * rebuilds get DISTINCT generations (they'd otherwise both stage into
    * gen-(max+1) and the published index would interleave two builds).
    * The lock covers only the claim; builds run unlocked and the last
    * pointer swap wins, which is the documented rebuild semantics. */
  def next(indexPath: String): String = {
    val root = new Path(indexPath)
    val raw = StoreSink.fs(root)
    StoreSink.withCommitLock(root, raw) {
      val n =
        if (!raw.exists(root)) 0
        else raw.listStatus(root).map(_.getPath.getName)
          .filter(_.startsWith("gen-"))
          .flatMap(g => scala.util.Try(g.stripPrefix("gen-").toInt).toOption)
          .foldLeft(0)(math.max)
      val gen = s"gen-${n + 1}"
      raw.mkdirs(new Path(root, gen)) // visible to the next claimant
      gen
    }
  }

  /** Supersession stamp written INTO a generation dir the moment the
    * pointer moves off it — the age-margined GC's clock starts at
    * supersession, not at build (a generation built hours ago but
    * superseded a second ago still deserves its drain margin). */
  val StaleAt = "_stale_at"

  def publish(indexPath: String, gen: String): Unit = {
    val root = new Path(indexPath)
    val fsys = StoreSink.fs(root)
    val prev = StoreSink.readSmall(root, fsys, CurrentPtr)
    StoreSink.atomicWriteSmall(root, fsys, CurrentPtr, gen)
    prev.filter(p => p.nonEmpty && p != gen).foreach { p =>
      if (fsys.exists(new Path(root, p)))
        StoreSink.atomicWriteSmall(root, fsys, s"$p/$StaleAt",
          System.currentTimeMillis.toString)
    }
  }

  def dropStale(indexPath: String): Int = {
    val root = new Path(indexPath)
    val fsys = StoreSink.fs(root)
    val cur = StoreSink.readSmall(root, fsys, CurrentPtr)
    if (!fsys.exists(root) || cur.isEmpty) return 0
    val stale = fsys.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("gen-") && !cur.contains(n))
    stale.foreach(n => fsys.delete(new Path(root, n), true))
    stale.length
  }

  /** AGE-MARGINED generation GC (round-12 verdict #6 — the
    * remove_orphans retention pattern applied to index artifacts): a
    * superseded generation is collected only once it has been stale for
    * ≥ `olderMs`, so in-flight probes that resolved the old pointer get
    * their drain window. Legacy stale generations without a stamp begin
    * aging NOW (stamped, skipped this round) — never deleted under the
    * feet of a probe that just resolved them. */
  def dropStaleOlder(indexPath: String, olderMs: Long): Int = {
    val root = new Path(indexPath)
    val fsys = StoreSink.fs(root)
    val cur = StoreSink.readSmall(root, fsys, CurrentPtr)
    if (!fsys.exists(root) || cur.isEmpty) return 0
    // generation numbers are monotone ([[next]] allocates max+1), so a
    // non-current generation NUMBERED ABOVE the pointer is the staging
    // area of an IN-FLIGHT rebuild, not a superseded one — stamping it
    // here would have a second sweep delete it mid-build once the margin
    // elapsed (advice catch). Unstamped gens BELOW the pointer are
    // genuinely superseded legacy state and begin aging.
    val curN = cur.flatMap(c =>
      scala.util.Try(c.stripPrefix("gen-").toInt).toOption).getOrElse(Int.MaxValue)
    val now = System.currentTimeMillis
    var dropped = 0
    fsys.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("gen-") && !cur.contains(n))
      .foreach { n =>
        StoreSink.readSmall(root, fsys, s"$n/$StaleAt") match {
          case Some(ts) if ts.nonEmpty && now - ts.toLong >= olderMs =>
            fsys.delete(new Path(root, n), true)
            dropped += 1
          case Some(_) => () // inside its margin: survives this sweep
          case None =>
            val gn = scala.util.Try(n.stripPrefix("gen-").toInt)
              .getOrElse(Int.MaxValue)
            if (gn < curN) // never an in-flight staging generation
              StoreSink.atomicWriteSmall(root, fsys, s"$n/$StaleAt", now.toString)
        }
      }
    dropped
  }
}

object AnnIndex {

  private val Fmt = "graft.sources.StoreSink"
  val CorpusProp = "graft.index.corpus"
  val VersionProp = "graft.index.corpus_version"
  /** Corpus version the PQ `codes` table reflects — advanced by the
    * refresh fold; [[probePq]] refuses when it trails [[VersionProp]]
    * (stale ADC results would otherwise serve silently). */
  val PqVersionProp = "graft.index.pq_version"

  // ---------------------------------------------------- generation pointer
  /** ATOMIC REBUILD (round-11 verdict #2a): a rebuild must never leave a
    * probe staring at a missing or half-written index, so index tables
    * live under GENERATION directories (`gen-<n>/codebook`, …) and a
    * `_current` pointer file — swapped in ONE atomic namespace op — names
    * the live one. [[buildFrom]] stages the whole new generation first and
    * publishes it with the pointer swap; a concurrent probe resolves the
    * pointer ONCE at operation start and reads a complete generation
    * either way (the FAISS "build aside, flip the symlink" discipline,
    * and exactly Iceberg's metadata-pointer contract). Superseded
    * generations stay on disk for in-flight probes until
    * [[dropStaleGenerations]]. A pointer-less root reads as its own
    * generation (legacy layout). */
  private def nextGen(indexPath: String): String = IndexGen.next(indexPath)
  private def publishGen(indexPath: String, gen: String): Unit = {
    onBeforeIndexPublish()
    IndexGen.publish(indexPath, gen)
  }
  private[graft] def genDir(indexPath: String): String = IndexGen.dir(indexPath)

  /** Test hook: runs after a rebuild's generation is fully written but
    * BEFORE the pointer swap publishes it — the stage/publish window. */
  @volatile private[graft] var onBeforeIndexPublish: () => Unit = () => ()

  /** GC superseded generation directories (never the live one). The
    * operator runs this once in-flight probes of the old generation have
    * drained — the vacuum step of the rebuild lifecycle. */
  def dropStaleGenerations(indexPath: String): Int =
    IndexGen.dropStale(indexPath)

  /** Test/fixture hook: backdate a superseded generation's supersession
    * stamp so expire scenarios age deterministically. */
  private[graft] def backdateStale(indexPath: String, gen: String,
                                   toMs: Long): Unit = {
    val root = new Path(indexPath)
    StoreSink.atomicWriteSmall(root, StoreSink.fs(root),
      s"$gen/${IndexGen.StaleAt}", toMs.toString)
  }

  /** Live-generation table paths (public: specs and the streaming refresh
    * op address the sub-tables through the pointer, never by layout). */
  def codebookPath(indexPath: String): String = cb(genDir(indexPath))
  def postingsPath(indexPath: String): String = pl(genDir(indexPath))

  // `genRoot` below is always a RESOLVED generation directory
  private def cb(genRoot: String) = s"$genRoot/codebook"
  private def pl(genRoot: String) = s"$genRoot/postings"

  /** Non-zero-norm vectors of a corpus STORE (k = vec_id, trailing `emb` =
    * comma-joined float literals), shaped like TrainingOps.nzEmbeddings.
    * `at` pins the read to an archived version — build paths pass the
    * version they are about to RECORD as provenance, so a concurrent
    * append can never be indexed-but-unrecorded (the refresh would
    * re-fold it and double-count; the TextIndex.rebuildIf review catch,
    * applied to the dense family's identical pattern). */
  private[graft] def nzOfStore(s: SparkSession, corpusPath: String,
                               at: Option[Int] = None): DataFrame = {
    val rd = s.read.format(Fmt).option("path", corpusPath)
    nzOf(at.fold(rd)(v => rd.option("atVersion", v.toString)).load()
      .select(col("k").as("vec_id"),
        expr("transform(split(emb, ','), x -> cast(x as float))").as("embedding")))
  }

  private def nzOf(vecs: DataFrame): DataFrame = {
    graft.functions.FloatDot.register(vecs.sparkSession)
    vecs.withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
      .where(col("nrm") > 0)
  }

  /** √n-CARDINALITY CODEBOOK (round-12 verdict #1): the seed stride
    * DERIVES from the corpus count so k ≈ n/stride ≈ √n, capped at 64k
    * centroids (beyond that an operator shards the codebook rather than
    * growing one broadcast). The previous FIXED stride made k linear in
    * n — broadcast(cents) stops fitting and the n·k assignment goes
    * quadratic at 100 TB; with √n cells, assignment is n^1.5 (the
    * standard FAISS-IVF training shape) and the codebook stays
    * broadcast-sized at any corpus. The formula — GREATEST(ceil(√n),
    * ceil(n/65536), 1) — is replayed verbatim inside the DuckDB oracles
    * ([[graft.ops.TrainingOps.strideSql]]): both engines derive it from
    * the same non-zero-norm corpus, and IEEE double sqrt/ceil agree
    * bit-for-bit, so training stays hash-pinned with no literal to
    * serialize. */
  private[graft] def seedStride(n: Long): Long =
    math.max(1L, math.max(math.ceil(math.sqrt(n.toDouble)).toLong,
      math.ceil(n.toDouble / 65536.0).toLong))

  /** Test hook: pin the stride so the index-MECHANICS specs (refresh COW,
    * atomicity, PQ fold) keep their hand-built deterministic cluster
    * fixtures — the derivation itself is spec-pinned separately. */
  @volatile private[graft] var seedStrideOverride: Option[Long] = None

  /** Derived-stride seeds + one exact 2^-20-integer Lloyd step over `nz`
    * (vec_id, embedding, nrm). Returns one row per trained centroid:
    * (c_id, n, sv_csv) — the EXACT-integer state the codebook persists. */
  private def train(nz: DataFrame): DataFrame = {
    val stride = seedStrideOverride.getOrElse(seedStride(nz.count()))
    val vecs = nz.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
                         col("nrm").as("n_nrm"))
    val seeds = nz.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
              col("nrm").as("c_nrm"))
    graft.ops.TrainingOps.assign(vecs, seeds)
      .select(col("bucket"), posexplode(col("n_emb")).as(Seq("idx", "v")))
      .groupBy(col("bucket"), col("idx"))
      .agg(expr("sum(cast(round(cast(v as double) * 1048576) as bigint))").as("sv"),
           count(lit(1)).as("n"))
      .groupBy(col("bucket"))
      .agg(max(col("n")).as("n"), // every dim counts the same vectors
           expr("array_join(transform(array_sort(collect_list(struct(idx, sv))), p -> cast(p.sv as string)), ',')")
             .as("sv_csv"))
      .select(col("bucket").as("c_id"), col("n"), col("sv_csv"))
  }

  /** Reconstruct the float centroids from persisted exact-integer state —
    * the same `(sv / 1048576.0) / n` expression training evaluated. */
  private def centroidsOf(raw: DataFrame): DataFrame =
    raw.select(col("c_id"),
        expr("transform(split(sv_csv, ','), x -> cast((cast(x as bigint) / 1048576.0) / n as float))")
          .as("c_emb"))
      .withColumn("c_nrm", sqrt(expr("graft_float_dot(c_emb, c_emb)")))

  /** Per-cell live posting counts from the postings MANIFEST alone (zero
    * data reads — one line per partition file): the occupancy audit an IVF
    * operator reads before deciding to rebuild. */
  def cellCounts(indexPath: String): Seq[(Long, Long)] = {
    val plRoot = new Path(postingsPath(indexPath))
    StoreSink.readEntries(plRoot, StoreSink.fs(plRoot))
      .groupBy(e => StoreSink.partTag(e.part.get)._2.toLong)
      .map { case (c, es) => (c, es.map(e => math.max(e.rows, 0L)).sum) }
      .toSeq
  }

  /** The persisted codebook as (c_id, c_emb, c_nrm). */
  def codebook(s: SparkSession, indexPath: String): DataFrame =
    codebookAt(s, genDir(indexPath))

  private def codebookAt(s: SparkSession, genRoot: String): DataFrame = {
    graft.functions.FloatDot.register(s)
    centroidsOf(s.read.format(Fmt).option("path", cb(genRoot)).load()
      .select(col("k").as("c_id"), col("amt_cents").as("n"), col("sv_csv")))
  }

  /** Build the index from `nz` (vec_id, embedding, nrm): train the codebook,
    * assign every vector, persist both store tables. Returns
    * (n_centroids, n_postings). `corpusRef` records provenance for refresh
    * (the corpus store path + the version the postings reflect). `attr`
    * names an integer metadata column of `nz` to persist INSIDE the
    * postings (the amt_cents slot, unused — 0 — on plain builds): the
    * filtered-search attribute every production vector store carries
    * alongside its vectors, so [[probeFiltered]] never has to join the
    * corpus to evaluate its predicate. The slot is the store's SECOND
    * ZONE COLUMN, so the attribute gets manifest min/max file pruning
    * for free on top of the cell pruning. */
  private def buildFrom(s: SparkSession, nz: DataFrame, indexPath: String,
                        corpusRef: Option[(String, Int)],
                        attr: Option[String] = None): (Long, Long) = {
    // STAGE-THEN-SWAP: the whole generation is written aside and published
    // by one atomic pointer write — a concurrent probe reads the previous
    // generation until the swap, the new one after, never a torn index
    val gen = nextGen(indexPath)
    val genRoot = s"$indexPath/$gen"
    val cbRoot = new Path(cb(genRoot))
    val plRoot = new Path(pl(genRoot))
    val fsys = StoreSink.fs(cbRoot)
    // trailing schemas persist BEFORE any write (the CTAS-shaped path)
    StoreSink.writeExtras(cbRoot, fsys,
      StoreSink.extrasOf(Seq(StructField("sv_csv", StringType))))
    StoreSink.writeExtras(plRoot, fsys, StoreSink.extrasOf(Seq(
      StructField("emb", StoreSink.FloatArrayType))))
    val trained = train(nz).localCheckpoint() // codebook-sized (√n rows)
    val vecs = nz.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
                         col("nrm").as("n_nrm"))
    // the filterable attribute projects straight off nz and rides THROUGH
    // the assignment's aggregate (assign's carry — r14: the former
    // join-back on vec_id re-shuffled the whole vector table to recover a
    // column the scan already had) and lands inside the posting row,
    // never paid at probe time
    val withAttr = attr.fold(
      graft.ops.TrainingOps.assign(vecs, centroidsOf(trained))
        .withColumn("attr_v", lit(0L))) { c =>
      graft.ops.TrainingOps.assign(
        nz.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
          col("nrm").as("n_nrm"), col(c).cast("long").as("attr_v")),
        centroidsOf(trained), carry = Seq("attr_v"))
    }
    // the codebook and postings commits are independent (different roots,
    // both read the checkpointed `trained`) — overlap them so the tiny
    // single-task codebook write rides the assignment's tail (§2.6, r15)
    StoreSink.inParallel {
      trained.select(col("c_id").as("k"), lit("c").as("grp"),
          col("n").as("amt_cents"), col("sv_csv"))
        .coalesce(1)
        .write.format(Fmt).mode("append").option("path", cb(genRoot)).save()
    } {
      withAttr
        .select(col("n_id").as("k"), col("bucket").cast("string").as("grp"),
          col("attr_v").as("amt_cents"), col("n_emb").as("emb")) // farr: native array
        .write.format(Fmt).mode("append").option("path", pl(genRoot))
        .option("partitionedBy", "identity:grp").save()
    }
    corpusRef.foreach { case (path, v) =>
      StoreSink.withCommitLock(cbRoot, fsys) {
        val ps = StoreSink.readProps(cbRoot, fsys).toMap
        StoreSink.writeProps(cbRoot, fsys,
          (ps + (CorpusProp -> path) + (VersionProp -> v.toString)).toSeq)
      }
    }
    // PQ CARRY-FORWARD: if the generation being superseded held the
    // compressed leg (codes + pqcb), re-encode it into the NEW generation
    // BEFORE the pointer swap — a policy-triggered retrain must not
    // strand the only PQ state where dropStaleGenerations will delete it
    // (probePq would then fail on missing paths; advice catch)
    val prevGen = genDir(indexPath)
    val prevPq = new Path(s"$prevGen/pqcb")
    if (prevGen != genRoot && StoreSink.fs(prevPq).exists(prevPq))
      buildPqAt(s, nz, genRoot, attr)
    val nCb = StoreSink.readEntries(cbRoot, fsys).map(_.rows).sum
    val nPl = StoreSink.readEntries(plRoot, fsys).map(_.rows).sum
    publishGen(indexPath, gen) // the ONE visible instant of the rebuild
    (nCb, nPl)
  }

  /** Build from a raw embeddings table (the sf-dir parquet). `attrCol`
    * optionally names an integer metadata column to persist in the
    * postings for [[probeFiltered]] (vector stores call this the
    * filterable payload attribute). */
  def build(s: SparkSession, embeddings: DataFrame, indexPath: String,
            attrCol: Option[String] = None): (Long, Long) =
    buildFrom(s, nzOf(embeddings), indexPath, None, attrCol)

  /** Build from a corpus STORE (k = vec_id, emb = float CSV), recording
    * (corpus path, corpus version) so [[refresh]] can fold its change feed. */
  def buildFromStore(s: SparkSession, corpusPath: String,
                     indexPath: String): (Long, Long) = {
    val vs = StoreSink.listVersions(new Path(corpusPath),
      StoreSink.fs(new Path(corpusPath)))
    buildFrom(s, nzOfStore(s, corpusPath, vs.lastOption), indexPath,
      Some((corpusPath, vs.lastOption.getOrElse(0))))
  }

  /** Probe the persisted index: queries' nprobe nearest cells, exact cosine
    * ranking INSIDE probed posting lists only. The probed cell set is
    * bounded (|queries| × nprobe), so materializing it to drive partition
    * pruning is a catalog-sized collect, and the postings scan PLANS only
    * those partitions — at any corpus size the probe reads nprobe lists per
    * query, never the table. Output shape = q_sim_ivf_kmeans. */
  def probe(s: SparkSession, queries: DataFrame, indexPath: String,
            nprobe: Int = 2, topk: Int = 5): DataFrame =
    probeImpl(s, queries, indexPath, nprobe, topk, None)

  /** FILTERED ANN SEARCH — the predicate leg every production vector
    * store exposes (Qdrant/Milvus/Vespa "filtered search", FAISS
    * IDSelector): rank only vectors whose stored metadata attribute
    * equals `attrEq`. The filter is evaluated against the attribute
    * PERSISTED IN THE POSTINGS at build ([[build]]'s `attrCol`), so the
    * probe stays index-resident — no corpus join — and the predicate is
    * a pushed amt_cents equality: the store's second zone column prunes
    * whole posting FILES whose [minA, maxA] excludes the value, on top
    * of cell-level partition pruning. Semantics are post-filter WITHIN
    * the probed cells (candidates drop before ranking, so top-k is over
    * matching vectors — a match outside the probed cells is missed,
    * exactly the recall trade every IVF filtered search makes; widen
    * nprobe to buy it back). */
  def probeFiltered(s: SparkSession, queries: DataFrame, indexPath: String,
                    attrEq: Long, nprobe: Int = 2, topk: Int = 5): DataFrame =
    probeImpl(s, queries, indexPath, nprobe, topk, Some(attrEq))

  /** Materialize a bounded probes frame in ONE job: collect the rows once,
    * hand back a local-relation twin for the broadcast side plus the
    * distinct bucket list for partition pruning. The previous
    * localCheckpoint + distinct().collect() pair was two sequential jobs
    * over the same |queries|×nprobe rows (r14 optimization — results are
    * the collected rows themselves, so the join input is bit-identical). */
  private def localizeProbes(s: SparkSession,
                             probes: DataFrame): (DataFrame, Seq[String]) = {
    val rows = probes.collect()
    import scala.jdk.CollectionConverters._
    val local = s.createDataFrame(rows.toSeq.asJava, probes.schema)
    val bi = probes.schema.fieldIndex("bucket")
    (local, rows.map(_.getLong(bi)).distinct.map(_.toString).toSeq)
  }

  private def probeImpl(s: SparkSession, queries: DataFrame, indexPath: String,
                        nprobe: Int, topk: Int, attrEq: Option[Long]): DataFrame = {
    val genRoot = genDir(indexPath) // one generation for the whole probe
    val cents = codebookAt(s, genRoot)
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("p_score").desc, col("c_id"))
    val (probes, buckets) = localizeProbes(s, queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
              col("nrm").as("q_nrm"))
      .join(broadcast(cents))
      .withColumn("p_score",
        expr("graft_float_dot(q_emb, c_emb)") / (col("q_nrm") * col("c_nrm")))
      .withColumn("prn", row_number().over(wProbe))
      .where(col("prn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id").as("bucket")))
    val scanned = s.read.format(Fmt).option("path", pl(genRoot)).load()
      .where(col("grp").isin(buckets: _*)) // partition pruning = list lookup
    val cand = attrEq.fold(scanned)(v => scanned.where(col("amt_cents") === v))
      .select(col("k").as("n_id"), col("grp").cast("long").as("bucket"),
        col("emb").as("n_emb")) // farr decodes once in the reader
      .withColumn("n_nrm", sqrt(expr("graft_float_dot(n_emb, n_emb)")))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    cand.join(broadcast(probes), "bucket")
      .withColumn("score",
        expr("graft_float_dot(q_emb, n_emb)") / (col("q_nrm") * col("n_nrm")))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= topk)
      .select(col("q_id"), col("n_id"),
              round(col("score") * 10000).cast("int").as("score_e4"), col("rn"))
  }

  // ----------------------------------------------------- PQ side tables
  /** PRODUCT-QUANTIZATION state persisted NEXT TO the coarse index — the
    * memory-bound leg of the index family (FAISS IVFPQ): `codes` holds each
    * vector's 2 sub-space codeword ids as trailing bigints, partitioned by
    * its coarse cell exactly like `postings` (one probe plans the same
    * partitions in both), and `pqcb` freezes the sampled sub-codebooks
    * (vec_id 100-107 halves — q_sim_pq's replayable contract). At 100 TB
    * the codes table is the one that fits in RAM: 2 small ints per vector
    * instead of 64 floats; ADC scoring inside probed cells costs two
    * integer lookups per candidate, floats are touched only for the
    * top-20 re-rank. Returns (n_codewords, n_codes). */
  def buildPq(s: SparkSession, embeddings: DataFrame, indexPath: String,
              attrCol: Option[String] = None): (Long, Long) =
    // PQ state joins the LIVE generation (built right after the coarse
    // swap, before the generation serves PQ probes); a coarse REBUILD
    // stages a fresh generation and re-encodes into IT (buildFrom's
    // carry-forward), so this delete only ever clears a same-generation
    // re-encode, never a table a probe is reading
    buildPqAt(s, nzOf(embeddings), genDir(indexPath), attrCol)

  /** Build the PQ leg from the index's own corpus store provenance,
    * read PINNED at the version the coarse index recorded — the codes
    * must reflect exactly the postings' snapshot or the next refresh
    * re-folds rows the codes already hold (the rebuildIf race class). */
  def buildPqFromStore(s: SparkSession, indexPath: String): (Long, Long) = {
    val genRoot = genDir(indexPath)
    val ps = StoreSink.readProps(new Path(cb(genRoot)),
      StoreSink.fs(new Path(cb(genRoot)))).toMap
    val corpus = ps.getOrElse(CorpusProp, throw new IllegalStateException(
      s"index at $indexPath has no corpus provenance — build PQ from a DataFrame"))
    buildPqAt(s, nzOfStore(s, corpus, ps.get(VersionProp).map(_.toInt)), genRoot)
  }

  private def buildPqAt(s: SparkSession, nz: DataFrame,
                        genRoot: String,
                        attr: Option[String] = None): (Long, Long) = {
    import org.apache.spark.sql.expressions.Window
    val cdRoot = new Path(s"$genRoot/codes")
    val qbRoot = new Path(s"$genRoot/pqcb")
    val fsys = StoreSink.fs(cdRoot)
    fsys.delete(cdRoot, true); fsys.delete(qbRoot, true)
    StoreSink.writeExtras(qbRoot, fsys, StoreSink.extrasOf(Seq(
      StructField("sub", StoreSink.FloatArrayType))))
    StoreSink.writeExtras(cdRoot, fsys, StoreSink.extrasOf(Seq(
      StructField("c0", org.apache.spark.sql.types.LongType),
      StructField("c1", org.apache.spark.sql.types.LongType))))
    val cb = graft.ops.Similarity.pqSides(nz.where(col("vec_id").between(100, 107)))
      .select(col("vec_id").as("c_id"), col("side"), col("sub").as("c_sub"))
      .localCheckpoint() // 16 rows
    cb.select((col("side") * 1000 + col("c_id")).as("k"), lit("q").as("grp"),
        lit(0L).as("amt_cents"), col("c_sub").as("sub"))
      .coalesce(1)
      .write.format(Fmt).mode("append").option("path", s"$genRoot/pqcb").save()
    // per-(vec, side) argmin as ONE partial-aggregating pivot — min(struct
    // (dist, c_id)) per side picks the identical codeword as the former
    // row_number window ordered by (dist, c_id), and the aggregate
    // reduces the vec × codewords cross product map-side instead of
    // shuffling it whole (r14 — the assign() reshape, PQ edition). The
    // filterable attribute rides THROUGH the aggregate as a pqSides carry
    // (max of a per-vec constant; r15 — the former join-back on vec_id
    // re-shuffled the whole vector table to recover a column the scan
    // already had) and lands in the codes rows' amt slot, so a filtered
    // ADC probe never has to open the float postings to evaluate its
    // predicate — the whole point of the compressed leg is that ADC stays
    // integer-and-codes-only.
    val nzA = attr.fold(nz.withColumn("attr_v", lit(0L)))(c =>
      nz.withColumn("attr_v", col(c).cast("long")))
    val wide = graft.ops.Similarity.pqSides(nzA, carry = Seq("attr_v"))
      .join(broadcast(cb), "side")
      .withColumn("dist", expr(graft.ops.Similarity.PqL2Sq))
      .groupBy(col("vec_id")).agg(
        min(when(col("side") === 0, struct(col("dist"), col("c_id")))).as("m0"),
        min(when(col("side") === 1, struct(col("dist"), col("c_id")))).as("m1"),
        max(col("attr_v")).as("attr_v"))
      .select(col("vec_id"), col("m0.c_id").as("c0"), col("m1.c_id").as("c1"),
        col("attr_v"))
    val assigned = graft.ops.TrainingOps.assign(
      nz.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
                col("nrm").as("n_nrm")),
      codebookAt(s, genRoot))
    wide
      .join(assigned.select(col("n_id").as("vec_id"), col("bucket")), "vec_id")
      .select(col("vec_id").as("k"), col("bucket").cast("string").as("grp"),
              col("attr_v").as("amt_cents"), col("c0"), col("c1"))
      .write.format(Fmt).mode("append").option("path", s"$genRoot/codes")
      .option("partitionedBy", "identity:grp").save()
    // record the corpus version these codes reflect (probePq's staleness
    // witness) — only meaningful for provenance-built indexes
    val cbRoot = new Path(s"$genRoot/codebook")
    StoreSink.readProps(cbRoot, fsys).toMap.get(VersionProp).foreach { v =>
      StoreSink.withCommitLock(cbRoot, fsys) {
        val ps = StoreSink.readProps(cbRoot, fsys).toMap
        StoreSink.writeProps(cbRoot, fsys, (ps + (PqVersionProp -> v)).toSeq)
      }
    }
    (StoreSink.readEntries(qbRoot, fsys).map(_.rows).sum,
     StoreSink.readEntries(cdRoot, fsys).map(_.rows).sum)
  }

  /** IVFPQ probe against the PERSISTED tables only: coarse codebook picks
    * nprobe cells per query, the ADC table (query × 16 codewords, integer
    * 1e-6 units) scores the probed cells' CODES, and the top-`adcN` ADC
    * survivors re-rank by exact cosine against the probed `postings`
    * partitions — index-resident end to end, the corpus never opens.
    * `adcN` is the standard IVFPQ refinement dial (round-12 verdict #3):
    * a wider ADC candidate set costs only integer lookups plus `adcN`
    * exact re-rank rows per query, and recovers the recall the code
    * approximation loses — q_ann_recall_pq's `pqwide` variant measures
    * the curve. */
  def probePq(s: SparkSession, queries: DataFrame, indexPath: String,
              nprobe: Int = 2, topk: Int = 5, adcN: Int = 20): DataFrame =
    probePqImpl(s, queries, indexPath, nprobe, topk, adcN, None)

  /** FILTERED IVFPQ SEARCH — the filtered probe on the COMPRESSED leg:
    * the metadata equality evaluates against the attribute persisted in
    * the `codes` rows (buildPq's `attrCol`), so candidates drop BEFORE
    * ADC ranking — non-matching vectors never consume the adcN
    * refinement budget (post-filtering after the ADC cut would starve
    * selective filters, the classic filtered-PQ failure), and the probe
    * stays integer-and-codes-only until the exact re-rank. */
  def probePqFiltered(s: SparkSession, queries: DataFrame, indexPath: String,
                      attrEq: Long, nprobe: Int = 2, topk: Int = 5,
                      adcN: Int = 20): DataFrame =
    probePqImpl(s, queries, indexPath, nprobe, topk, adcN, Some(attrEq))

  private def probePqImpl(s: SparkSession, queries: DataFrame,
                          indexPath: String, nprobe: Int, topk: Int,
                          adcN: Int, attrEq: Option[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val genRoot = genDir(indexPath) // one generation end to end
    // STALENESS GUARD: the refresh fold advances PqVersionProp with the
    // corpus version — if codes trail the postings' version, ADC results
    // would silently rank against dead/missing vectors; refuse loudly
    locally {
      val cbR = new Path(s"$genRoot/codebook")
      val ps = StoreSink.readProps(cbR, StoreSink.fs(cbR)).toMap
      for (v <- ps.get(VersionProp); pv <- ps.get(PqVersionProp))
        require(pv == v, s"stale PQ codes at $indexPath: corpus is at " +
          s"version $v but codes were encoded at $pv — run refresh")
    }
    val cents = codebookAt(s, genRoot)
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("p_score").desc, col("c_id"))
    val (probes, buckets) = localizeProbes(s, queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
              col("nrm").as("q_nrm"))
      .join(broadcast(cents))
      .withColumn("p_score",
        expr("graft_float_dot(q_emb, c_emb)") / (col("q_nrm") * col("c_nrm")))
      .withColumn("prn", row_number().over(wProbe))
      .where(col("prn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id").as("bucket")))
    val cb = s.read.format(Fmt).option("path", s"$genRoot/pqcb").load()
      .select((col("k") % 1000).as("c_id"), (col("k") / 1000).cast("int").as("side"),
        col("sub").as("c_sub"))
    val dtab = graft.ops.Similarity.pqSides(queries)
      .select(col("vec_id").as("q_id"), col("side"), col("sub"))
      .join(broadcast(cb), "side")
      .select(col("q_id"), col("side"), col("c_id"),
        expr(s"cast(round(${graft.ops.Similarity.PqL2Sq} * 1000000) as bigint)").as("d_e6"))
      .withColumnRenamed("c_id", "code")
      .localCheckpoint() // |queries| × 16
    val codesScan = s.read.format(Fmt).option("path", s"$genRoot/codes").load()
      .where(col("grp").isin(buckets: _*)) // the probed cells only
    val codes = attrEq.fold(codesScan)(v => codesScan.where(col("amt_cents") === v))
      .select(col("k").as("n_id"), col("grp").cast("long").as("bucket"),
              col("c0"), col("c1"))
    val candW = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("n_id"))
    val cand = codes
      .join(broadcast(probes.select(col("q_id"), col("bucket"))), "bucket")
      .select(col("q_id"), col("n_id"), explode(array(
        struct(lit(0).as("side"), col("c0").as("code")),
        struct(lit(1).as("side"), col("c1").as("code")))).as("sc"))
      .select(col("q_id"), col("n_id"), col("sc.side").as("side"),
              col("sc.code").as("code"))
      .join(broadcast(dtab), Seq("q_id", "side", "code"))
      .groupBy(col("q_id"), col("n_id")).agg(sum(col("d_e6")).as("adc"))
      .withColumn("rn", row_number().over(candW)).where(col("rn") <= adcN)
      .select(col("q_id"), col("n_id"))
    val vecsIdx = s.read.format(Fmt).option("path", pl(genRoot)).load()
      .where(col("grp").isin(buckets: _*))
      .select(col("k").as("n_id"), col("emb").as("n_emb"))
      .withColumn("n_nrm", sqrt(expr("graft_float_dot(n_emb, n_emb)")))
    val rerankW = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    cand
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))), "q_id")
      .join(vecsIdx, "n_id")
      .withColumn("score",
        expr("graft_float_dot(q_emb, n_emb)") / (col("q_nrm") * col("n_nrm")))
      .withColumn("rn", row_number().over(rerankW)).where(col("rn") <= topk)
      .select(col("q_id"), col("n_id"),
              round(col("score") * 10000).cast("int").as("score_e4"), col("rn"))
  }

  /** REBUILD POLICY (round-11 verdict #7 — "rebuild cadence is the
    * operator's knob", as a procedure instead of a slide): fold any
    * pending corpus changes, then decide REFRESH-WAS-ENOUGH vs FULL
    * RETRAIN from two measurable signals —
    *  - occupancy skew (max cell / mean cell, e4 units, from the postings
    *    MANIFEST alone — the q_index_stats audit): skewed growth means new
    *    data piled into few cells and probe cost degenerates toward a scan;
    *  - recall drift: stride-sampled queries probed against the index vs
    *    their EXACT top-k over the corpus store (a bounded maintenance-time
    *    ground truth, the ANALYZE-shaped cost): a frozen codebook that no
    *    longer centers the data loses recall even when occupancy looks flat.
    * Either trigger fires → [[buildFromStore]] retrains — atomic via the
    * generation pointer, so probes never notice the decision being acted
    * on. Returns (action, skew_e4, recall_e4). */
  def rebuildIf(s: SparkSession, indexPath: String, maxSkewE4: Long,
                minRecallE4: Long = 0L, topk: Int = 5): (String, Long, Long) = {
    refresh(s, indexPath) // maintenance ordering: fold the feed first
    val genRoot = genDir(indexPath)
    val corpus = StoreSink.readProps(new Path(cb(genRoot)),
        StoreSink.fs(new Path(cb(genRoot)))).toMap
      .getOrElse(CorpusProp, throw new IllegalStateException(
        s"index at $indexPath has no corpus provenance — policy needs one"))
    val cells = cellCounts(indexPath)
    val total = cells.map(_._2).sum
    val skewE4 =
      if (total == 0L || cells.isEmpty) 0L
      else cells.map(_._2).max * 10000L * cells.size / total
    // recall probe ONLY when the floor is armed: the exact ground truth
    // costs a corpus × sample pass (the ANALYZE-shaped maintenance scan)
    // — a skew-only policy run must not pay it (recall_e4 = -1 then)
    val recallE4 =
      if (minRecallE4 <= 0L) -1L
      else {
        val nz = nzOfStore(s, corpus)
        val queries = nz.where(pmod(col("vec_id"), lit(251)) === 0)
        val qv = queries.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("n_id"))
        val exact = nz
          .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
                  col("nrm").as("n_nrm"))
          .join(broadcast(qv))
          .withColumn("score",
            expr("graft_float_dot(q_emb, n_emb)") / (col("q_nrm") * col("n_nrm")))
          .withColumn("rn", row_number().over(wTop))
          .where(col("rn") <= topk)
          .select(col("q_id"), col("n_id"))
          .localCheckpoint() // topk rows per sampled query
        val got = probe(s, queries, indexPath, nprobe = 2, topk = topk)
          .select(col("q_id"), col("n_id"))
        val denom = exact.count()
        val hits = exact.join(got, Seq("q_id", "n_id"), "left_semi").count()
        if (denom == 0L) 10000L else hits * 10000L / denom
      }
    // the recall trigger only fires when its floor is ARMED — with the
    // 2-arg form recallE4 is the -1 sentinel and must not read as "below
    // the floor" (it did: -1 < 0 made every skew-only call retrain and
    // the keep branch unreachable — advice catch, spec-pinned)
    val recallTrips = minRecallE4 > 0L && recallE4 < minRecallE4
    if (skewE4 > maxSkewE4 || recallTrips) {
      buildFromStore(s, corpus, indexPath) // atomic: stage + pointer swap
      ("rebuild", skewE4, recallE4)
    } else ("keep", skewE4, recallE4)
  }

  /** INCREMENTAL MAINTENANCE: fold the corpus store's change feed since the
    * indexed version into the postings under the FROZEN codebook — the
    * q_store_ivm fold applied to the index. Deletes drop their posting row,
    * inserts assign against the persisted centroids (an update is its CDF
    * delete+insert pair), and only TOUCHED posting-list partitions are
    * rewritten (one replace-set commit). The codebook is never retrained —
    * recall drifts only as far as the data does, the standard IVF contract
    * (rebuild to re-center). Returns (keys_changed, partitions_rewritten). */
  def refresh(s: SparkSession, indexPath: String): (Long, Long) = {
    val genRoot = genDir(indexPath) // refresh maintains the LIVE generation
    val cbRoot = new Path(cb(genRoot))
    val plRoot = new Path(pl(genRoot))
    val fsys = StoreSink.fs(cbRoot)
    val props = StoreSink.readProps(cbRoot, fsys).toMap
    val corpus = props.getOrElse(CorpusProp, throw new IllegalStateException(
      s"index at $indexPath was not built from a corpus store — nothing to refresh"))
    val fromV = props(VersionProp).toInt
    val headV = StoreSink.listVersions(new Path(corpus),
      StoreSink.fs(new Path(corpus))).lastOption.getOrElse(0)
    if (headV == fromV) return (0L, 0L)
    val feed = StoreSink.changes(s, corpus, fromV, Some(headV))
      .select(col("op"), col("k").as("vec_id"),
        expr("transform(split(emb, ','), x -> cast(x as float))").as("embedding"))
      .localCheckpoint() // CDF-sized: changed rows only
    val cdRoot = new Path(s"$genRoot/codes")
    val hasPq = fsys.exists(cdRoot) // the compressed leg folds too
    graft.functions.FloatDot.register(s)
    // every changed key leaves the postings; non-zero-norm inserts re-enter
    // under their frozen-codebook cell
    val changedKeys = feed.select(col("vec_id").as("k")).distinct()
    val newAsg = graft.ops.TrainingOps.assign(
      feed.where(col("op") === "insert")
        .withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
        .where(col("nrm") > 0)
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
                col("nrm").as("n_nrm")),
      codebookAt(s, genRoot))
      .select(col("n_id").as("k"), col("bucket").cast("string").as("grp"),
        lit(0L).as("amt_cents"), col("n_emb").as("emb"))
      .localCheckpoint()
    def postings = s.read.format(Fmt).option("path", pl(genRoot)).load()
    // touched cells: where new assignments land + where changed keys lived
    // (bounded by the codebook size — a catalog-sized driver list)
    val touched = (newAsg.select(col("grp")).distinct()
      .unionByName(postings.join(changedKeys, Seq("k"), "left_semi")
        .select(col("grp")).distinct())
      .distinct().collect().map(_.getString(0))).toSeq
    def bumpVersion(): Unit = StoreSink.withCommitLock(cbRoot, fsys) {
      val ps = StoreSink.readProps(cbRoot, fsys).toMap
      val pq = if (hasPq) Map(PqVersionProp -> headV.toString)
               else Map.empty[String, String]
      StoreSink.writeProps(cbRoot, fsys,
        (ps + (VersionProp -> headV.toString) ++ pq).toSeq)
    }
    if (touched.isEmpty) {
      // keys absent from the postings never entered codes either —
      // version (and PQ version) advance, nothing rewrites
      bumpVersion()
      return (changedKeys.count(), 0L)
    }
    val replaced = StoreSink.readEntries(plRoot, fsys)
      .filter(_.part.exists(touched.contains)).map(_.name)
    // partition-grain copy-on-write: surviving rows of touched lists
    // (anti-join, never a literal IN — the predicate must not scale with
    // the delete batch) + the fresh assignments, ONE replace-set commit
    postings.where(col("grp").isin(touched: _*))
      .join(changedKeys, Seq("k"), "left_anti")
      .select(col("k"), col("grp"), col("amt_cents"), col("emb"))
      .unionByName(newAsg)
      .write.format(Fmt).mode("append").option("path", pl(genRoot))
      .option("replace", replaced.mkString(","))
      .option("preserveMarkers", "true").save()
    if (hasPq) {
      // PQ CODES FOLD (round-12 verdict #2): the compressed leg follows
      // the same CDF discipline under the FROZEN sub-codebooks — changed
      // keys leave, inserts re-encode against pqcb (exactly buildPq's
      // argmin, applied to the feed only), and the SAME touched cells
      // rewrite in one replace-set commit (codes partition identically
      // to postings by construction). Cost tracks changed rows; the
      // sub-codebooks are never retrained — the standard PQ contract
      // (rebuild to re-center, exactly like the coarse codebook).
      import org.apache.spark.sql.expressions.Window
      val cbq = s.read.format(Fmt).option("path", s"$genRoot/pqcb").load()
        .select((col("k") % 1000).as("c_id"),
          (col("k") / 1000).cast("int").as("side"), col("sub").as("c_sub"))
        .localCheckpoint() // 16 rows
      val ins = feed.where(col("op") === "insert")
        .withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
        .where(col("nrm") > 0)
        .select(col("vec_id"), col("embedding"), col("nrm"))
      // same argmin pivot as buildPqAt (r14): min(struct(dist, c_id)) per
      // side == the former (dist, c_id) window winner, partial-aggregated
      val wide = graft.ops.Similarity.pqSides(ins).join(broadcast(cbq), "side")
        .withColumn("dist", expr(graft.ops.Similarity.PqL2Sq))
        .groupBy(col("vec_id")).agg(
          min(when(col("side") === 0, struct(col("dist"), col("c_id")))).as("m0"),
          min(when(col("side") === 1, struct(col("dist"), col("c_id")))).as("m1"))
        .select(col("vec_id"), col("m0.c_id").as("c0"), col("m1.c_id").as("c1"))
      val newCodes = wide
        .join(newAsg.select(col("k").as("vec_id"), col("grp")), "vec_id")
        .select(col("vec_id").as("k"), col("grp"), lit(0L).as("amt_cents"),
                col("c0"), col("c1"))
      val replacedCd = StoreSink.readEntries(cdRoot, fsys)
        .filter(_.part.exists(touched.contains)).map(_.name)
      s.read.format(Fmt).option("path", s"$genRoot/codes").load()
        .where(col("grp").isin(touched: _*))
        .join(changedKeys, Seq("k"), "left_anti")
        .select(col("k"), col("grp"), col("amt_cents"), col("c0"), col("c1"))
        .unionByName(newCodes)
        .write.format(Fmt).mode("append").option("path", s"$genRoot/codes")
        .option("replace", replacedCd.mkString(","))
        .option("preserveMarkers", "true").save()
    }
    bumpVersion()
    (changedKeys.count(), touched.size.toLong)
  }
}
