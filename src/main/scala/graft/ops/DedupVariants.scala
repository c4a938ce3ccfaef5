package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 / BASELINE.json:6 — the dedup family beyond MinHash:
  * SimHash (bitwise near-dup), direct n-gram Jaccard, embedding-cosine
  * near-dup. All three are oracle-able: SimHash uses md5-derived 32-bit
  * hashes (identical hex → int on both engines) instead of engine-specific
  * hash functions.
  *
  * Scale posture (every blocking key here must scale its cardinality WITH
  * the corpus — the 10× rehearsal showed any fixed key space turns linear
  * bucket growth into quadratic in-bucket pair expansion):
  * - SimHash: one linear scan (signature per doc) + banded group-join;
  *   60-bit signatures banded 5×12 (4096 sigs/band; bits are the dial).
  * - n-gram Jaccard: banded 2-row salted-min-md5 blocking (P[band match]
  *   = J², so the weak-similarity tail that dominates all-pairs candidate
  *   volume is suppressed quadratically), then the EXACT Jaccard verify on
  *   the candidates only. The former single-min-shingle (k=1 MinHash)
  *   blocking had P[candidate] = J — its candidate count is Σ_pairs J,
  *   which grows quadratically with the corpus (measured 33.8× at the 10×
  *   tier with near-constant output).
  * - Embedding-cosine (`q_dedup_embcos`): label-equal blocking — a DECLARED
  *   fixed-cardinality exact baseline; `q_dedup_embcos_lsh` is the
  *   corpus-scaling form. NOTE on the 10× rehearsal numbers: GenScale's
  *   jittered replicas are genuine near-duplicates (cosine ≈ 1), so the
  *   ground-truth pair set itself grows ~500× at 10× (213 → 106 341 rows);
  *   embcos_lsh's 12× runtime there is output-bound and sublinear per
  *   result row — the right verdict is "the data has quadratically more
  *   dups", not "the plan is quadratic".
  */
object DedupVariants extends OpModule {

  /** q_dedup_contain's boilerplate shed: shingles appearing in more than
    * this many docs are too common to be blocking evidence (and their
    * posting lists would drive quadratic pair expansion). */
  private val RareDf = 20

  private def withShingles(df: DataFrame, n: Int): DataFrame =
    df.withColumn("sh",
      graft.functions.TextHashes.shingles(n)(split(trim(col("text")), " ")))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 60-bit SimHash from md5(shingle), banded 5×12 bits, hamming ≤ 6.
    // The former 32-bit/4×8-band form had a 256-signature band space — a
    // FIXED key set whose buckets grow linearly with the corpus and whose
    // in-bucket pair expansion therefore grows quadratically (measured 11.4×
    // at the 10× tier). 12-bit bands give 4096 signatures per band (bits per
    // band is the scale dial), the pigeonhole guarantee is exact for
    // hamming ≤ 4 (5 bands), ≥ ~88% for 5-6 errors (surjection counting;
    // the oracle mirrors the banding, so any miss is mirrored too, never a
    // hash diff), and the ≤ 6 threshold preserves the old 3/32 allowed-
    // disagreement rate at the new width. Degenerate buckets (boilerplate)
    // are shed at MaxBucket like every other LSH family here.
    "q_dedup_simhash" -> ((s, d) => {
      val sim = withShingles(Tables.documents(s, d), 5)
        // JVM kernel, bit-identical to the md5-based SQL/DuckDB formulation
        // (the nested-lambda version was the slowest query in the bench)
        .withColumn("simhash", graft.functions.TextHashes.simhash60md5(col("sh")))
        .select(col("doc_id"), col("simhash"))
      val bands = sim.select(col("doc_id"), col("simhash"),
          posexplode(expr("transform(sequence(0, 4), b -> (simhash >> (b * 12)) & 4095)")))
        .toDF("doc_id", "simhash", "band", "sig")
      bands.groupBy(col("band"), col("sig"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("xs"))
        .where(size(col("xs")) > 1 && size(col("xs")) <= graft.ops.LlmOps.MaxBucket)
        .select(explode(expr(
          """flatten(transform(xs, (a, i) -> transform(slice(xs, i + 2, size(xs)),
            |  b -> named_struct('doc_a', a.doc_id, 'doc_b', b.doc_id,
            |                    'hamming', bit_count(a.simhash ^ b.simhash)))))""".stripMargin)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"), col("p.hamming").cast("int").as("hamming"))
        .distinct()
        .where(col("hamming") <= 6)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Exact 3-gram Jaccard on banded-MinHash candidates: 8 bands × 2 rows
    // of (a·md5₂₈(s) + b) mod (2³¹−1) minima (P[band match] = J², detection
    // = 1-(1-J²)^8 — ≈0.53 at the τ=0.3 threshold, 0.90 at J=0.5, ≈1 at
    // J≥0.7; the b/r pair is the recall/pruning dial). The 2-row bands are
    // what make this scale: the candidate volume is ~8·Σ_pairs J², so the
    // ocean of weak-similarity pairs that a 1-row scheme surfaces (P = J)
    // never materializes, and the signature space grows with the corpus
    // shingle space. The former single-min-shingle (k=1 MinHash) blocking
    // measured 33.8× at the 10× tier with near-constant output — candidate
    // count Σ_pairs J is quadratic in the corpus. Candidates travel id-only
    // (shingle arrays join back on verified pairs), buckets above MaxBucket
    // (boilerplate cliques) are shed, and the emitted jaccard is EXACT. The
    // md5-seeded permutations are engine-deterministic, with the (aₖ, bₖ)
    // coefficients riding into the oracle SQL as list literals (the
    // q_sim_lsh plane technique), so DuckDB reproduces buckets, candidates,
    // and pairs exactly — the hash gate pins the whole candidate model,
    // recall curve included.
    "q_dedup_ngram" -> ((s, d) => {
      val sh = withShingles(Tables.documents(s, d), 3)
        .select(col("doc_id"), col("sh"))
      val bands = sh.select(col("doc_id"),
          posexplode(graft.functions.TextHashes.bandedMinHash(8, ngramA, ngramB)(col("sh"))))
        .toDF("doc_id", "band", "sig")
      val cand = bands.groupBy(col("band"), col("sig"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")) > 1 && size(col("ids")) <= graft.ops.LlmOps.MaxBucket)
        .select(explode(expr(
          """flatten(transform(ids,
            |  (a, i) -> transform(slice(ids, i + 2, size(ids)),
            |            b -> named_struct('doc_a', a, 'doc_b', b))))""".stripMargin)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          expr("size(array_intersect(sh_a, sh_b)) / cast(size(array_union(sh_a, sh_b)) as double)"))
        .where(col("jaccard") >= 0.3)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // CONTAINMENT dedup — the asymmetric case symmetric Jaccard misses: a
    // short doc quoted/embedded inside a long one has C(A,B) = |A∩B|/|A|
    // ≈ 1 while J(A,B) is small, so no Jaccard-threshold family surfaces
    // it. Candidates come from RARE-shingle posting lists (prefix-filter /
    // PPJoin-style blocking): any pair with C ≥ 0.8 shares ≥ 80% of the
    // smaller doc's shingles, every shared shingle has df ≥ 2 by
    // definition, and shingles with df > RareDf (boilerplate) are shed —
    // so candidate volume is Σ_g C(df_g, 2) ≤ C(RareDf, 2) per gram,
    // LINEAR in distinct grams, and gram cardinality grows with the corpus
    // (the CLAUDE.md blocking-key rule). The shed is mirrored in the
    // oracle, so the hash gate pins the candidate model including its
    // recall caveat. Verify stage is exact set arithmetic in integer e4
    // units; both containment directions plus Jaccard are emitted so a
    // consumer separates subset-pairs (high C, low J) from near-dups.
    "q_dedup_contain" -> ((s, d) => {
      val sh = withShingles(Tables.documents(s, d), 5).select(col("doc_id"), col("sh"))
      val post = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      val rare = post.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .where(col("df").between(2, RareDf)).select(col("g"))
      val rp = post.join(rare, "g")
      // candidate pairs explode MAP-SIDE from each rare gram's own doc
      // list (bounded: df ≤ RareDf by the filter above) — the r14
      // pair-generation reshape; the posting self-join on g paid an
      // extra exchange + sort for the identical pair set, and the
      // collect_set groupBy reuses the join's g partitioning outright
      val cand = rp.groupBy(col("g")).agg(collect_set(col("doc_id")).as("ds"))
        .select(explode(col("ds")).as("doc_a"), col("ds"))
        .select(col("doc_a"), explode(col("ds")).as("doc_b"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
        // bounded (rare-gram-capped) pair set, mined ONCE — the id
        // union below otherwise re-runs the whole mining lineage for a
        // second action-side reference (the q_dsir_sample rule)
        .localCheckpoint()
      // §3.2 pre-filter (r15): the verification joins only ever need the
      // CANDIDATE docs' shingle arrays, yet they used to shuffle the whole
      // corpus array table twice (by doc_a, then by doc_b). Semi-join the
      // broadcast candidate-id set first — the corpus is filtered MAP-SIDE
      // with zero exchange of the arrays — and checkpoint the survivors so
      // the corpus pays ONE more scan instead of two. At cluster scale the
      // broadcast id set swaps for a Bloom filter over the same ids (no
      // false negatives, so the exact joins below are unchanged).
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val shCand = sh.join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .localCheckpoint() // candidate-bounded survivor arrays
      cand
        .join(shCand.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(shCand.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("inter", expr("cast(size(array_intersect(sh_a, sh_b)) as long)"))
        .withColumn("cont_a_e4", expr("inter * 10000L div size(sh_a)"))
        .withColumn("cont_b_e4", expr("inter * 10000L div size(sh_b)"))
        .withColumn("j_e4", expr("inter * 10000L div size(array_union(sh_a, sh_b))"))
        .where(greatest(col("cont_a_e4"), col("cont_b_e4")) >= 8000)
        .select(col("doc_a"), col("doc_b"),
                col("cont_a_e4"), col("cont_b_e4"), col("j_e4"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Embedding-cosine near-dup, blocked by label; double math, e4 ints.
    "q_dedup_embcos" -> ((s, d) => {
      // zero-norm vectors make cosine undefined (NaN) and NaN ordering
      // DIVERGES between engines (DuckDB sorts NaN high) — exclude them
      // identically on both sides (norm = 0 ⟺ abs-sum = 0, the oracle's
      // filter). Norms staged per ROW; the per-pair work is ONE codegen'd
      // dot product (FloatDot — the UDF's Seq[Float] boxing dominated this
      // query's bench time).
      graft.functions.FloatDot.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
        .where(col("nrm") > 0)
      val a = e.select(col("vec_id").as("va"), col("label"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("vb"), col("label").as("lb"), col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, col("label") === col("lb") && col("va") < col("vb"))
        .withColumn("score", expr("graft_float_dot(ea, eb)") / (col("na") * col("nb")))
        .where(col("score") >= 0.35)
        .select(col("va"), col("vb"), col("label"),
                round(col("score") * 10000).cast("int").as("score_e4"))
        .orderBy(col("va"), col("vb"))
    }),

    // The 100 TB lever for q_dedup_embcos, as a hash-checked twin: the
    // sf0.1→sf1 scale rehearsal (BASELINE.md) showed label-only blocking is
    // the one family whose block size grows with the corpus (labels are a
    // FIXED-cardinality key → per-block pairs grow quadratically). This
    // variant sub-blocks by (label, 4-plane sign-LSH bucket) and probes
    // Hamming≤1 neighbor buckets, so the equi-join key cardinality scales
    // WITH the corpus and per-block work stays bounded; the plane count is
    // the dial (2^planes buckets). Declared-approximate like q_sim_lsh and
    // oracled the same way: the ±1 planes ride into the SQL as literals, so
    // DuckDB reproduces buckets, probes, and verified pairs exactly; recall
    // vs the exact twin is property-tested in DedupVariantsSpec.
    // BITEXT MINING (the LASER/CCMatrix parallel-corpus recipe, Artetxe &
    // Schwenk 2019): for every non-English document, the English top-1 by
    // cosine is a translation-pair CANDIDATE, accepted only on a MARGIN —
    // best / mean(top-4) — because an embedding that is "close to
    // everything" (a hub) produces false pairs an absolute threshold
    // can't reject. Candidates come from an IVF coarse quantizer whose
    // centroid set is STRIDE-SAMPLED from the corpus (vec_id % 199 == 0),
    // so the bucket-key cardinality GROWS with the corpus (the recorded
    // blocking rule — a first cut on the 16 fixed hyperplane buckets
    // measured 22.9× at the 10× tier from in-bucket pair expansion with
    // near-linear output; centroid buckets measure sublinear). English
    // docs assign to their top-1 centroid; each query probes its top-2
    // (the q_sim_ivf nprobe shape). Scoring is per-pair double cosine
    // rounded to e6 ONCE (the embcos determinism technique — both engines
    // sum the lists sequentially); ranking, the margin ratio
    // (best·k·1e4 div Σtop-k over positives), and the accept thresholds
    // are pure integers after that. At 100 TB the stride becomes a
    // kmeans-√n codebook, same plan shape.
    "q_bitext_mine" -> ((s, d) => {
      graft.functions.FloatDot.register(s)
      val lang = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
        .where(col("nrm") > 0)
        .join(lang, col("vec_id") === col("doc_id"))
      val cents = e.where(col("vec_id") % 199 === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
                col("nrm").as("c_nrm"))
      def cells(side: DataFrame, n: Int): DataFrame = {
        val w = Window.partitionBy(col("vid"))
          .orderBy(col("c_score").desc, col("c_id"))
        side.join(broadcast(cents))
          .withColumn("c_score",
            expr("graft_float_dot(emb, c_emb)") / (col("vnrm") * col("c_nrm")))
          .withColumn("crn", row_number().over(w)).where(col("crn") <= n)
          .select(col("vid"), col("emb"), col("vnrm"), col("c_id").as("cell"))
      }
      val src = cells(e.where(col("lang") =!= "en")
        .select(col("vec_id").as("vid"), col("embedding").as("emb"),
                col("nrm").as("vnrm")), 2) // nprobe = 2
        .toDF("sid", "es", "ns", "cell")
      val tgt = cells(e.where(col("lang") === "en")
        .select(col("vec_id").as("vid"), col("embedding").as("emb"),
                col("nrm").as("vnrm")), 1)
        .toDF("tid", "et", "nt", "cell")
      val cand = src.join(tgt, "cell")
        .withColumn("cos_e6",
          round(expr("graft_float_dot(es, et)") / (col("ns") * col("nt"))
            * 1000000).cast("long"))
        // (sid, tid) is unique: a target lives in exactly one cell
        .where(col("cos_e6") > 0) // hubs score on positive mass only
        .select(col("sid"), col("tid"), col("cos_e6"))
      val ranked = cand.withColumn("rk", row_number().over(
          Window.partitionBy(col("sid")).orderBy(col("cos_e6").desc, col("tid"))))
        .where(col("rk") <= 4)
      ranked.groupBy(col("sid"))
        .agg(max(when(col("rk") === 1, col("cos_e6"))).as("best"),
             max(when(col("rk") === 1, col("tid"))).as("tid"),
             sum(col("cos_e6")).as("sumk"), count(lit(1)).as("k"))
        .select(col("sid"), col("tid"),
                expr("best div 100").as("cos_e4"),
                expr("best * k * 10000 div sumk").as("margin_e4"))
        .where(col("cos_e4") >= 3000 && col("margin_e4") >= 10200)
        .orderBy(col("sid"))
    }),

    "q_dedup_embcos_lsh" -> ((s, d) => {
      graft.functions.FloatDot.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
        .where(col("nrm") > 0)
        .withColumn("bkt", Similarity.signBucket(col("embedding"), embPlanes))
      val a = e.select(col("vec_id").as("va"), col("label"),
                       col("embedding").as("ea"), col("nrm").as("na"), col("bkt").as("ba"))
        .withColumn("probe", explode(expr(
          "concat(array(ba), transform(sequence(0, 3), k -> cast(ba as int) ^ shiftleft(1, k)))")))
      val b = e.select(col("vec_id").as("vb"), col("label").as("lb"),
                       col("embedding").as("eb"), col("nrm").as("nb"), col("bkt").as("bb"))
      // no distinct needed: the 5 probe values are distinct ints, so each
      // (va, vb) pair matches exactly one probe row — deduping here would
      // shuffle rows carrying both embedding payloads for nothing
      a.join(b, col("label") === col("lb") && col("probe") === col("bb") &&
                col("va") < col("vb"))
        .withColumn("score", expr("graft_float_dot(ea, eb)") / (col("na") * col("nb")))
        .where(col("score") >= 0.35)
        .select(col("va"), col("vb"), col("label"),
                round(col("score") * 10000).cast("int").as("score_e4"))
        .orderBy(col("va"), col("vb"))
    }),

    // Duplicated-SPAN detection — the exact-substring dedup family (Lee et
    // al., "Deduplicating Training Data Makes Language Models Better"):
    // instead of doc-level pairs, find the positions inside each document
    // whose word-8-gram also occurs in another document, and report the
    // duplicated fraction (the signal used to cut spans, not drop docs).
    // The suffix-array formulation is replaced by a hash-groupBy over
    // POSITIONAL 8-grams: df(gram) = distinct-doc count, a position is
    // duplicated iff df ≥ 2. Crucially there is NO pair join anywhere —
    // a boilerplate gram shared by a million docs contributes one (hash,
    // df) row, never a candidate clique, so the plan is strictly linear
    // in corpus positions: one kernel scan, two hash aggregations, one
    // equi-join back on the 32-hex md5 key (grams travel as hashes, not
    // 8-word strings). Blocking-key rule: positional-gram space grows
    // with the corpus by construction.
    "q_substr_dedup" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextHashes.shinglesAll(8)(
          split(trim(col("text")), " "))).as("g"))
        .select(col("doc_id"), md5(col("g")).as("gh"))
      // r14 reshape: one (gh, doc_id) partial-aggregating count, then df =
      // a COUNT window over gh — the distinct + df-aggregate + full-grams
      // join chain paid four exchanges (one of them the entire un-deduped
      // gram table) for the same numbers (measured 1.74 -> 1.15 s at
      // sf0.1, output bit-identical). n_spans = sum of per-doc occurrence
      // counts == the old per-row count; n_dup weights by the same c.
      val gcount = grams.groupBy(col("gh"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      gcount.withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_spans"),
             sum(when(col("df") >= 2, col("c")).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_spans"), col("n_dup"),
                expr("n_dup * 10000 div n_spans").as("dup_frac_e4"))
        .orderBy(col("doc_id"))
    }),

    // Content-defined chunking dedup (the rsync/FastCDC idea at token
    // granularity): a STATELESS gear rule cuts after any token whose
    // ending 3-gram hashes ≡ 0 mod 8 (expected chunk ≈ 8 tokens), so an
    // edit re-synchronizes chunk boundaries within 3 tokens — unlike
    // fixed-size blocks, where one insertion shifts every later block and
    // kills all downstream matches. Chunks dedup by md5 across the corpus:
    // the shuffle carries (hash, len), never chunk text, and the output is
    // the top-duplicated chunks plus a storage-savings total. At 100 TB
    // this is the chunk-store layer of incremental crawl snapshots: chunk
    // hashing is one linear kernel scan, the groupBy key space grows with
    // the corpus by construction (the blocking-key rule), and dedup cost
    // is one hash shuffle of ~tokens/8 keys. The stateless cut rule (vs
    // FastCDC's sequential min/max-size gear loop) is what makes the
    // boundary function SQL-expressible — the oracle reproduces every cut,
    // chunk, and hash exactly.
    "q_chunk_cdc" -> ((s, d) => {
      val chunks = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.TextHashes.cdcChunks(3, 8)(
            split(trim(col("text")), " "))).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("chunk_hash"),
                size(split(col("chunk"), " ", -1)).cast("long").as("tok_len"))
      // both output branches (top-20, total) read the per-chunk aggregate;
      // without materialization each re-runs the kernel+shuffle lineage
      // (executed plan shows NO ReusedExchange — checked, per the
      // materialize-vs-reuse rule) and the frame is BOUNDED (one row per
      // distinct chunk ≈ tokens/8), so one eager checkpoint is the fix
      val agg = chunks.groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("n_occ"),
             countDistinct(col("doc_id")).as("n_docs"),
             max(col("tok_len")).as("tok_len"))
        .localCheckpoint()
      val top = agg
        .orderBy(col("n_occ").desc, col("chunk_hash")).limit(20)
        .select(col("chunk_hash"), col("n_occ"), col("n_docs"), col("tok_len"))
      // total row: chunk count, distinct-chunk count, tokens a chunk store
      // saves (occurrences beyond the first, weighted by chunk length)
      val tot = agg.agg(
          sum(col("n_occ")).as("n_occ"),
          count(lit(1)).as("n_docs"),
          sum(when(col("n_occ") > 1, (col("n_occ") - 1) * col("tok_len"))
            .otherwise(0L)).as("tok_len"))
        .select(lit("__total").as("chunk_hash"), col("n_occ"),
                col("n_docs"), col("tok_len"))
      top.unionByName(tot).orderBy(col("n_occ").desc, col("chunk_hash"))
    }),

    // SOFT dedup (the SoftDeDup idea: arXiv 2407.06654 — down-WEIGHT
    // commonly-duplicated content instead of dropping whole documents,
    // which loses the unique spans inside mostly-duplicate docs): per
    // document, the fraction of its content-defined chunks whose hash
    // appears in MORE THAN ONE document, mapped to a sampling weight in
    // exact integer e4 units (up to 80% downweight — truncating div, both
    // engines agree). Cost is the same one chunk-hash shuffle q_chunk_cdc
    // pays — (doc_id, hash) pairs, text never moves — plus a bounded
    // per-hash doc count; keys scale with the corpus (the blocking-key
    // rule). Downstream, q_sample_weighted consumes exactly this shape.
    "q_dedup_soft" -> ((s, d) => {
      val pairs = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.TextHashes.cdcChunks(3, 8)(
            split(trim(col("text")), " "))).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("h"))
        .distinct()
      val docsPerChunk = pairs.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      pairs.join(docsPerChunk, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
             sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_chunks"),
          expr("n_dup * 10000L div n_chunks").as("dup_frac_e4"))
        .withColumn("weight_e4", expr("10000L - dup_frac_e4 * 8L div 10L"))
        .orderBy(col("doc_id"))
    }),

    // The SOFT-DEDUP weights APPLIED: a reproducible Bernoulli draw keeps
    // each document with probability weight_e4/10⁴ (the 16-bit
    // md5-fraction rule shared with q_mix_anneal_draw — integer
    // cross-multiplied, so both engines decide identically), turning
    // q_dedup_soft's scores into an actual curated subset with per-lang
    // retention audit. Heavily-duplicated docs survive at ~20% while
    // unique docs survive at ~100% — the SoftDeDup sampling step itself,
    // one broadcast-free hash draw per row.
    "q_sample_soft" -> ((s, d) => {
      val w = queries("q_dedup_soft")(s, d).select(col("doc_id"), col("weight_e4"))
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(w, "doc_id")
        .withColumn("b16",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long"))
        .withColumn("kept",
          when(expr("b16 * 10000L < weight_e4 * 65536L"), 1L).otherwise(0L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"),
             sum(when(col("kept") === 1L, col("weight_e4")).otherwise(0L))
               .as("kept_w_e4"))
        .orderBy(col("lang"))
    }),

    // Incremental chunk-store ingest (q_chunk_cdc's production flow, the
    // chunk-granular twin of q_dedup_incr's signature-index shape): a new
    // BATCH of documents (doc_id ≡ 0 mod 10) is chunked by the same gear
    // rule and joined against the CORPUS chunk index (distinct hashes of
    // everything else) — only chunks absent from the index are new bytes;
    // per-document novelty is what an ingest pipeline uses to route
    // near-duplicate crawl revisits away from storage. One distinct per
    // side + one hash equi-join on the chunk hash; at 100 TB the
    // persisted index is bucketed on the hash so the per-batch join
    // co-locates against it without reshuffling the index (the
    // q_dedup_incr posture), and the shuffle carries hashes, never text.
    "q_dedup_chunk_incr" -> ((s, d) => {
      def chunksOf(df: DataFrame) = df
        .select(col("doc_id"),
          explode(graft.functions.TextHashes.cdcChunks(3, 8)(
            split(trim(col("text")), " "))).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("h"),
                size(split(col("chunk"), " ", -1)).cast("long").as("tok_len"))
      val docs = Tables.documents(s, d)
      val index = chunksOf(docs.where(pmod(col("doc_id"), lit(10)) =!= 0))
        .select(col("h")).distinct()
      chunksOf(docs.where(pmod(col("doc_id"), lit(10)) === 0))
        .join(index.withColumn("known", lit(1L)), Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
             sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_new"),
             sum(when(col("known").isNull, col("tok_len")).otherwise(0L)).as("new_toks"))
        .select(col("doc_id"), col("n_chunks"), col("n_new"), col("new_toks"),
                expr("n_new * 10000L div n_chunks").as("novelty_e4"))
        .orderBy(col("doc_id"))
    }),
  )

  /** 4 ±1 hyperplanes (16 sub-buckets per label), seed 7 — deliberately a
    * different seed family from q_sim_lsh's 8-plane set. */
  private val embPlanes: Array[Array[Double]] = Similarity.mkPlanes(4, 64, 7L)

  /** 16 (a, b) coefficient pairs for q_dedup_ngram's 8×2 banded MinHash —
    * seeded, a ∈ [1, P−1] and b ∈ [0, P−1]; shared verbatim with the oracle
    * SQL as list literals. */
  private val (ngramA, ngramB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(11L)
    (Array.fill(16)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
     Array.fill(16)(rnd.nextInt(Int.MaxValue).toLong))
  }

  override def oracles: Map[String, String] = Map(
    "q_dedup_simhash" ->
      s"""WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(0, GREATEST(LEN(toks) - 4, 1)),
        |         i -> ARRAY_TO_STRING(toks[i + 1:i + 5], ' '))) AS sh FROM base),
        |h AS (SELECT doc_id, LIST_TRANSFORM(sh, s -> CAST(('0x' || SUBSTR(md5(s), 1, 15)) AS BIGINT)) AS h60 FROM sh),
        |sim AS (SELECT doc_id,
        |  CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, 60), j ->
        |    CASE WHEN LIST_SUM(LIST_TRANSFORM(h60, x ->
        |           CASE WHEN ((x >> j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
        |    THEN (CAST(1 AS BIGINT) << (59 - j)) ELSE 0 END)) AS BIGINT) AS simhash
        |  FROM h),
        |bands AS (SELECT doc_id, simhash, b, (simhash >> (b * 12)) & 4095 AS sig
        |          FROM sim, (SELECT UNNEST(RANGE(0, 5)) AS b)),
        |sized AS (SELECT doc_id, simhash, b, sig,
        |                 COUNT(*) OVER (PARTITION BY b, sig) AS bn FROM bands),
        |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |                x.simhash AS sa, y.simhash AS sb
        |         FROM sized x JOIN sized y
        |           ON x.b = y.b AND x.sig = y.sig AND x.doc_id < y.doc_id
        |         WHERE x.bn <= ${graft.ops.LlmOps.MaxBucket})
        |SELECT doc_a, doc_b, CAST(BIT_COUNT(XOR(sa, sb)) AS INTEGER) AS hamming
        |FROM cand WHERE BIT_COUNT(XOR(sa, sb)) <= 6
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(0, GREATEST(LEN(toks) - 2, 1)),
        |         i -> ARRAY_TO_STRING(toks[i + 1:i + 3], ' '))) AS sh FROM base),
        |xs AS (SELECT doc_id, sh,
        |    LIST_TRANSFORM(sh, s -> CAST(('0x' || SUBSTR(md5(s), 1, 7)) AS BIGINT)) AS hx
        |  FROM sh),
        |consts AS (SELECT [${ngramA.mkString(", ")}] AS av,
        |                  [${ngramB.mkString(", ")}] AS bv),
        |bands AS (SELECT doc_id, b,
        |    LIST_MIN(LIST_TRANSFORM(hx, x -> (av[b * 2 + 1] * x + bv[b * 2 + 1]) % 2147483647))
        |      * 2147483648 +
        |    LIST_MIN(LIST_TRANSFORM(hx, x -> (av[b * 2 + 2] * x + bv[b * 2 + 2]) % 2147483647)) AS sig
        |  FROM xs, (SELECT UNNEST(RANGE(0, 8)) AS b), consts),
        |sized AS (SELECT doc_id, b, sig, COUNT(*) OVER (PARTITION BY b, sig) AS bn FROM bands),
        |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |         FROM sized x JOIN sized y
        |           ON x.b = y.b AND x.sig = y.sig AND x.doc_id < y.doc_id
        |         WHERE x.bn <= ${graft.ops.LlmOps.MaxBucket})
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  ROUND(LEN(LIST_INTERSECT(a.sh, b.sh))
        |        / CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))) AS DOUBLE), 4) AS jaccard
        |FROM cand JOIN sh a ON cand.doc_a = a.doc_id JOIN sh b ON cand.doc_b = b.doc_id
        |WHERE LEN(LIST_INTERSECT(a.sh, b.sh))
        |      / CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))) AS DOUBLE) >= 0.3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Mirrors the rare-shingle blocking (2 ≤ df ≤ RareDf) and the integer
    // e4 containment/Jaccard arithmetic exactly.
    "q_dedup_contain" ->
      s"""WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(0, GREATEST(LEN(toks) - 4, 1)),
        |         i -> ARRAY_TO_STRING(toks[i + 1:i + 5], ' '))) AS sh FROM base),
        |post AS (SELECT doc_id, UNNEST(sh) AS g FROM sh),
        |rare AS (SELECT g FROM post GROUP BY g HAVING COUNT(*) BETWEEN 2 AND $RareDf),
        |rp AS (SELECT post.g, post.doc_id FROM post JOIN rare ON post.g = rare.g),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM rp a JOIN rp b ON a.g = b.g AND a.doc_id < b.doc_id),
        |v AS (SELECT doc_a, doc_b,
        |        CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS BIGINT) AS inter,
        |        CAST(LEN(a.sh) AS BIGINT) AS na, CAST(LEN(b.sh) AS BIGINT) AS nb,
        |        CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))) AS BIGINT) AS un
        |      FROM cand JOIN sh a ON cand.doc_a = a.doc_id
        |                JOIN sh b ON cand.doc_b = b.doc_id)
        |SELECT doc_a, doc_b,
        |  inter * 10000 // na AS cont_a_e4,
        |  inter * 10000 // nb AS cont_b_e4,
        |  inter * 10000 // un AS j_e4
        |FROM v
        |WHERE GREATEST(inter * 10000 // na, inter * 10000 // nb) >= 8000
        |ORDER BY doc_a, doc_b""".stripMargin,

    // the same stride-sampled centroids, top-1 assign / top-2 probe, and
    // margin arithmetic — pure integers after the single per-pair e6
    // rounding; double cosines are bit-identical (sequential list sums)
    "q_bitext_mine" ->
      s"""WITH e AS (SELECT vec_id, d.lang, embedding,
        |  SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        |  FROM embeddings JOIN documents d ON vec_id = d.doc_id
        |  WHERE LIST_SUM(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) > 0),
        |cents AS (SELECT vec_id AS c_id, embedding AS c_emb, norm AS c_nrm
        |  FROM e WHERE vec_id % 199 = 0),
        |sc AS (SELECT v.vec_id, v.lang, v.embedding, v.norm, c.c_id,
        |    LIST_SUM(LIST_TRANSFORM(LIST_ZIP(v.embedding, c.c_emb),
        |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (v.norm * c.c_nrm) AS c_score
        |  FROM e v CROSS JOIN cents c),
        |cr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY c_score DESC, c_id) AS crn FROM sc),
        |src AS (SELECT vec_id AS sid, embedding AS es, norm AS ns, c_id AS cell
        |  FROM cr WHERE lang <> 'en' AND crn <= 2),
        |tgt AS (SELECT vec_id AS tid, embedding AS et, norm AS nt, c_id AS cell
        |  FROM cr WHERE lang = 'en' AND crn = 1),
        |cand AS (
        |  SELECT sid, tid,
        |    CAST(ROUND((LIST_SUM(LIST_TRANSFORM(LIST_ZIP(es, et),
        |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (ns * nt))
        |      * 1000000) AS BIGINT) AS cos_e6
        |  FROM src JOIN tgt USING (cell)),
        |pos AS (SELECT * FROM cand WHERE cos_e6 > 0),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY sid
        |      ORDER BY cos_e6 DESC, tid) AS rk
        |  FROM pos),
        |top AS (
        |  SELECT sid,
        |    MAX(CASE WHEN rk = 1 THEN cos_e6 END) AS best,
        |    MAX(CASE WHEN rk = 1 THEN tid END) AS tid,
        |    CAST(SUM(cos_e6) AS BIGINT) AS sumk, COUNT(*) AS k
        |  FROM ranked WHERE rk <= 4 GROUP BY sid)
        |SELECT sid, tid, CAST(best // 100 AS BIGINT) AS cos_e4,
        |  CAST(best * k * 10000 // sumk AS BIGINT) AS margin_e4
        |FROM top
        |WHERE best // 100 >= 3000 AND best * k * 10000 // sumk >= 10200
        |ORDER BY sid""".stripMargin,

    "q_dedup_embcos_lsh" ->
      s"""WITH planes AS (
        |  SELECT * FROM (VALUES
        |    ${Similarity.planeSqlRows(embPlanes, "        |    ")}) AS t(j, w)),
        |e AS (SELECT vec_id, label, embedding,
        |  SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        |  FROM embeddings
        |  WHERE LIST_SUM(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) > 0),
        |bkt AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN LIST_SUM(LIST_TRANSFORM(LIST_ZIP(embedding, w),
        |        s -> CAST(s[1] AS DOUBLE) * s[2])) > 0 THEN 1 << j ELSE 0 END) AS INTEGER) AS b
        |  FROM e CROSS JOIN planes GROUP BY vec_id)
        |SELECT a.vec_id AS va, b.vec_id AS vb, a.label,
        |  CAST(ROUND((LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.embedding, b.embedding),
        |         s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))) / (a.norm * b.norm)) * 10000) AS INTEGER) AS score_e4
        |FROM e a JOIN bkt ba ON a.vec_id = ba.vec_id
        |JOIN bkt bb ON BIT_COUNT(XOR(ba.b, bb.b)) <= 1
        |JOIN e b ON b.vec_id = bb.vec_id
        |WHERE a.label = b.label AND a.vec_id < b.vec_id
        |  AND LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.embedding, b.embedding),
        |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))) / (a.norm * b.norm) >= 0.35
        |ORDER BY va, vb""".stripMargin,

    "q_dedup_embcos" ->
      """WITH e AS (SELECT vec_id, label, embedding,
        |  SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        |  FROM embeddings
        |  WHERE LIST_SUM(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) > 0)
        |SELECT a.vec_id AS va, b.vec_id AS vb, a.label,
        |  CAST(ROUND((LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.embedding, b.embedding),
        |         s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))) / (a.norm * b.norm)) * 10000) AS INTEGER) AS score_e4
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.embedding, b.embedding),
        |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))) / (a.norm * b.norm) >= 0.35
        |ORDER BY va, vb""".stripMargin,

    "q_substr_dedup" ->
      """WITH tk AS (
        |  SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, MD5(gram) AS gh FROM (
        |    SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(0, GREATEST(LEN(toks) - 7, 1)),
        |      i -> ARRAY_TO_STRING(toks[i + 1:i + 8], ' '))) AS gram
        |    FROM tk)),
        |df AS (SELECT gh, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, gh FROM g)
        |       GROUP BY gh)
        |SELECT doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT)
        |    AS dup_frac_e4
        |FROM g JOIN df USING (gh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirrors the stateless gear rule exactly: cut positions are the
    // 1-based i in [3, len) whose ending 3-gram's 28-bit md5 prefix is
    // ≡ 0 mod 8; chunks are the token spans between consecutive bounds
    "q_chunk_cdc" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |cuts AS (SELECT doc_id, toks,
        |    LIST_FILTER(RANGE(3, LEN(toks)), i ->
        |      CAST(('0x' || SUBSTR(md5(ARRAY_TO_STRING(
        |        toks[CAST(i - 2 AS INTEGER):CAST(i AS INTEGER)], ' ')), 1, 7)) AS BIGINT) % 8 = 0) AS cuts
        |  FROM base),
        |bs AS (SELECT doc_id, toks,
        |    LIST_PREPEND(CAST(0 AS BIGINT), LIST_APPEND(cuts, CAST(LEN(toks) AS BIGINT))) AS bs
        |  FROM cuts),
        |chunks AS (SELECT doc_id,
        |    ARRAY_TO_STRING(toks[CAST(bs[CAST(j AS INTEGER)] + 1 AS INTEGER)
        |                         :CAST(bs[CAST(j AS INTEGER) + 1] AS INTEGER)], ' ') AS chunk
        |  FROM bs, UNNEST(RANGE(1, LEN(bs))) AS t(j)),
        |ch AS (SELECT doc_id, md5(chunk) AS chunk_hash,
        |    CAST(LEN(STRING_SPLIT(chunk, ' ')) AS BIGINT) AS tok_len FROM chunks),
        |agg AS (SELECT chunk_hash, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs,
        |    MAX(tok_len) AS tok_len FROM ch GROUP BY 1),
        |top AS (SELECT chunk_hash, n_occ, n_docs, tok_len FROM agg
        |        ORDER BY n_occ DESC, chunk_hash LIMIT 20)
        |SELECT * FROM top
        |UNION ALL
        |SELECT '__total', CAST(SUM(n_occ) AS BIGINT), COUNT(*),
        |  CAST(SUM(CASE WHEN n_occ > 1 THEN (n_occ - 1) * tok_len ELSE 0 END) AS BIGINT)
        |FROM agg
        |ORDER BY n_occ DESC, chunk_hash""".stripMargin,

    // same gear rule; a doc's weight from its cross-doc duplicated-chunk
    // fraction, all integer units
    "q_dedup_soft" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |cuts AS (SELECT doc_id, toks,
        |    LIST_FILTER(RANGE(3, LEN(toks)), i ->
        |      CAST(('0x' || SUBSTR(md5(ARRAY_TO_STRING(
        |        toks[CAST(i - 2 AS INTEGER):CAST(i AS INTEGER)], ' ')), 1, 7)) AS BIGINT) % 8 = 0) AS cuts
        |  FROM base),
        |bs AS (SELECT doc_id, toks,
        |    LIST_PREPEND(CAST(0 AS BIGINT), LIST_APPEND(cuts, CAST(LEN(toks) AS BIGINT))) AS bs
        |  FROM cuts),
        |chunks AS (SELECT doc_id,
        |    ARRAY_TO_STRING(toks[CAST(bs[CAST(j AS INTEGER)] + 1 AS INTEGER)
        |                         :CAST(bs[CAST(j AS INTEGER) + 1] AS INTEGER)], ' ') AS chunk
        |  FROM bs, UNNEST(RANGE(1, LEN(bs))) AS t(j)),
        |pairs AS (SELECT DISTINCT doc_id, md5(chunk) AS h FROM chunks),
        |dpc AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM pairs GROUP BY h),
        |m AS (SELECT p.doc_id, COUNT(*) AS n_chunks,
        |    SUM(CASE WHEN dpc.n_docs > 1 THEN 1 ELSE 0 END) AS n_dup
        |  FROM pairs p JOIN dpc USING (h) GROUP BY p.doc_id)
        |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
        |  CAST(n_dup * 10000 // n_chunks AS BIGINT) AS dup_frac_e4,
        |  CAST(10000 - (n_dup * 10000 // n_chunks) * 8 // 10 AS BIGINT) AS weight_e4
        |FROM m ORDER BY doc_id""".stripMargin,

    // the same weights + the same 16-bit draw, decided in DuckDB
    "q_sample_soft" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |cuts AS (SELECT doc_id, toks,
        |    LIST_FILTER(RANGE(3, LEN(toks)), i ->
        |      CAST(('0x' || SUBSTR(md5(ARRAY_TO_STRING(
        |        toks[CAST(i - 2 AS INTEGER):CAST(i AS INTEGER)], ' ')), 1, 7)) AS BIGINT) % 8 = 0) AS cuts
        |  FROM base),
        |bs AS (SELECT doc_id, toks,
        |    LIST_PREPEND(CAST(0 AS BIGINT), LIST_APPEND(cuts, CAST(LEN(toks) AS BIGINT))) AS bs
        |  FROM cuts),
        |chunks AS (SELECT doc_id,
        |    ARRAY_TO_STRING(toks[CAST(bs[CAST(j AS INTEGER)] + 1 AS INTEGER)
        |                         :CAST(bs[CAST(j AS INTEGER) + 1] AS INTEGER)], ' ') AS chunk
        |  FROM bs, UNNEST(RANGE(1, LEN(bs))) AS t(j)),
        |pairs AS (SELECT DISTINCT doc_id, md5(chunk) AS h FROM chunks),
        |dpc AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM pairs GROUP BY h),
        |m AS (SELECT p.doc_id, COUNT(*) AS n_chunks,
        |    SUM(CASE WHEN dpc.n_docs > 1 THEN 1 ELSE 0 END) AS n_dup
        |  FROM pairs p JOIN dpc USING (h) GROUP BY p.doc_id),
        |w AS (SELECT doc_id,
        |    10000 - (n_dup * 10000 // n_chunks) * 8 // 10 AS weight_e4 FROM m),
        |drawn AS (SELECT d.doc_id, d.lang, w.weight_e4,
        |    CASE WHEN CAST(('0x' || SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
        |           * 10000 < w.weight_e4 * 65536 THEN 1 ELSE 0 END AS kept
        |  FROM documents d JOIN w USING (doc_id))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(kept) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN kept = 1 THEN weight_e4 ELSE 0 END) AS BIGINT) AS kept_w_e4
        |FROM drawn GROUP BY lang ORDER BY lang""".stripMargin,

    // same gear rule, batch (doc_id≡0 mod 10) vs corpus-index split
    "q_dedup_chunk_incr" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |cuts AS (SELECT doc_id, toks,
        |    LIST_FILTER(RANGE(3, LEN(toks)), i ->
        |      CAST(('0x' || SUBSTR(md5(ARRAY_TO_STRING(
        |        toks[CAST(i - 2 AS INTEGER):CAST(i AS INTEGER)], ' ')), 1, 7)) AS BIGINT) % 8 = 0) AS cuts
        |  FROM base),
        |bs AS (SELECT doc_id, toks,
        |    LIST_PREPEND(CAST(0 AS BIGINT), LIST_APPEND(cuts, CAST(LEN(toks) AS BIGINT))) AS bs
        |  FROM cuts),
        |chunks AS (SELECT doc_id,
        |    ARRAY_TO_STRING(toks[CAST(bs[CAST(j AS INTEGER)] + 1 AS INTEGER)
        |                         :CAST(bs[CAST(j AS INTEGER) + 1] AS INTEGER)], ' ') AS chunk
        |  FROM bs, UNNEST(RANGE(1, LEN(bs))) AS t(j)),
        |ch AS (SELECT doc_id, md5(chunk) AS h,
        |    CAST(LEN(STRING_SPLIT(chunk, ' ')) AS BIGINT) AS tok_len FROM chunks),
        |idx AS (SELECT DISTINCT h FROM ch WHERE doc_id % 10 <> 0),
        |batch AS (SELECT * FROM ch WHERE doc_id % 10 = 0)
        |SELECT b.doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN i.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN i.h IS NULL THEN b.tok_len ELSE 0 END) AS BIGINT) AS new_toks,
        |  CAST(SUM(CASE WHEN i.h IS NULL THEN 1 ELSE 0 END) * 10000
        |       // COUNT(*) AS BIGINT) AS novelty_e4
        |FROM batch b LEFT JOIN idx i ON b.h = i.h
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
  )
}
