package graft.ops

import graft.Tables
import graft.functions.TextHashes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond SURVEY §2.9's original set
  * (BASELINE.json:6 "LLM-data-pipeline operators" north star): benchmark
  * decontamination, PII redaction, repetition-based quality filtering,
  * text normalization, deterministic hash sampling, and IVF-style ANN.
  *
  * Scale posture:
  * - Decontamination is the canonical asymmetric join: the benchmark shingle
  *   set is tiny (a few thousand grams) and BROADCAST, the corpus side is one
  *   linear scan + explode — no shuffle of the corpus, which is the only
  *   shape that works when the corpus is 100 TB and the benchmark is MBs.
  * - PII masking / normalization / repetition are pure per-row map stages
  *   (no shuffle at all except repetition's per-doc gram count, which
  *   partial-aggregates on (doc_id, gram)).
  * - Hash sampling replaces TABLESAMPLE for distributed determinism: the
  *   predicate is a pure function of the row key, so the sample is identical
  *   across engines, retries, and partitionings — and pushes down to the
  *   scan as a filter (no coordinated RNG state across 1000 executors).
  * - IVF: centroids are broadcast both for assignment (linear scan) and
  *   probing; at scale the bucket id becomes the table's partition key so a
  *   query reads nprobe/k of the corpus instead of all of it. The exact
  *   re-ranking touches only candidate buckets. Recall/nprobe is the dial.
  */
object PipelineOps extends OpModule {

  /** Exact double cosine (DuckDB twin of the FloatDot staged form; proven
    * bit-exact in q_dedup_embcos). */
  private def duckCos(a: String, b: String): String =
    s"""LIST_SUM(LIST_TRANSFORM(LIST_ZIP($a, $b),
       |      s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
       |    / (SQRT(LIST_SUM(LIST_TRANSFORM($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * SQRT(LIST_SUM(LIST_TRANSFORM($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: flag corpus docs sharing any 8-gram with
    // the "benchmark" slice (doc_id < 20 stands in for an eval set).
    "q_contamination" -> ((s, d) => {
      val shingled = Tables.documents(s, d)
        .withColumn("sh", TextHashes.shingles(8)(split(trim(col("text")), " ")))
      val bench = shingled.where(col("doc_id") < 20)
        .select(explode(col("sh")).as("g")).distinct()
      shingled.where(col("doc_id") >= 20)
        .select(col("doc_id"), explode(col("sh")).as("g"))
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_hits"))
        .orderBy(col("doc_id"))
    }),

    // PII redaction: mask email-shaped tokens and digit runs, count both.
    // (Patterns stay in the RE2 ∩ java.util.regex dialect intersection.)
    "q_pii_mask" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_count(col("text"), lit("[a-z0-9._]+@[a-z0-9.]+[.][a-z][a-z]+")).as("n_emails"),
          regexp_count(col("text"), lit("[0-9]+")).as("n_nums"),
          md5(regexp_replace(
            regexp_replace(col("text"), "[a-z0-9._]+@[a-z0-9.]+[.][a-z][a-z]+", "<EMAIL>"),
            "[0-9]+", "<NUM>")).as("masked_hash"))
        .orderBy(col("doc_id"))),

    // Gopher-style repetition signal: share of the doc's 2-grams taken by
    // its single most frequent 2-gram, in exact integer e4 units.
    "q_repetition_filter" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
                explode(TextHashes.shinglesAll(2)(split(trim(col("text")), " "))).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_cnt"), sum(col("c")).as("n_grams"))
        .select(col("doc_id"), col("n_grams"),
                round(col("top_cnt") * lit(10000.0) / col("n_grams")).cast("int").as("top_e4"))
        .withColumn("repetitive", col("top_e4") >= 500)
        .orderBy(col("doc_id"))),

    // Novelty scoring for curriculum/ingest ordering: the share of a doc's
    // distinct 8-grams FIRST seen in that doc (by doc_id order). Duplicated
    // or boilerplate-heavy docs score near 0 — the cheap online signal for
    // "is this batch adding anything". One gram shuffle (min-owner
    // aggregation, map-side partial) joined back to the per-doc grams;
    // ratio ships as exact integer 1e-4 units of exact counts. Shingling
    // rides the JVM kernel (the interpreted HOF formulation is the measured
    // trap TextHashes exists for — and this frame evaluates twice).
    "q_novelty" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextHashes.shingles(8)(split(trim(col("text")), " "))).as("g"))
      val owner = grams.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
      grams.join(owner, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
             sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"),
                expr("cast(round(n_novel * 1e4 / n_grams) as bigint)").as("novel_e4"))
        .orderBy(col("doc_id"))
    }),

    // Cross-source exact-duplication matrix: which source feeds copy from
    // which — the provenance-leakage audit behind mixture weights (a pair
    // of sources sharing many exact texts double-counts whatever weight
    // both get). Pairs expand only INSIDE md5 groups — bounded by
    // Σ group², never corpus², but note single-source dup groups DO
    // enumerate their pairs before the sa < sb predicate rejects them;
    // ordered source pairs keep the matrix upper-triangular and
    // deterministic.
    // The sf0.01 corpus has no cross-source exact dups — an EMPTY matrix
    // there is the correct answer (verified against the oracle's own 0
    // rows); sf0.1 exercises the non-empty path (7 source pairs).
    "q_dup_matrix" -> ((s, d) => {
      val h = Tables.documents(s, d)
        .select(md5(lower(trim(col("text")))).as("h"), col("source"))
      val a = h.select(col("h"), col("source").as("sa"))
      val b = h.select(col("h"), col("source").as("sb"))
      a.join(b, Seq("h")).where(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_pairs"), countDistinct(col("h")).as("n_texts"))
        .orderBy(col("sa"), col("sb"))
    }),

    // C4-style normalization: lowercase, strip non-alphanumerics, collapse
    // runs of spaces; emit the canonical hash (the exact-dedup key).
    "q_doc_norm" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(regexp_replace(regexp_replace(lower(trim(col("text"))),
            "[^a-z0-9 ]", ""), " +", " ")).as("n_chars_norm"),
          md5(regexp_replace(regexp_replace(lower(trim(col("text"))),
            "[^a-z0-9 ]", ""), " +", " ")).as("norm_hash"))
        .orderBy(col("doc_id"))),

    // Deterministic ~10% sample: first md5 byte of the key < 26/256. A pure
    // function of the row — reproducible across engines/retries/partitions,
    // unlike TABLESAMPLE whose RNG is engine- and split-dependent.
    // The END-TO-END curation chain in one declarative query — normalize →
    // quality gate → exact dedup (min-id survivor) → deterministic split →
    // per-(split, lang) corpus stats. Each stage is a proven primitive
    // (q_doc_norm / q_quality_filter / q_dedup_exact / q_dataset_split);
    // the point here is COMPOSITION: Catalyst plans the whole chain as one
    // pipeline (scan → map stages → one dedup aggregation → one stats
    // aggregation), so the 100 TB corpus is read ONCE end-to-end — there
    // is no materialization boundary between stages unless the operator
    // needs one.
    "q_pipeline_e2e" -> ((s, d) => {
      val norm = Tables.documents(s, d)
        .withColumn("norm", regexp_replace(trim(lower(col("text"))), "\\s+", " "))
        .withColumn("n_tok", size(split(col("norm"), " ")))
      val kept = norm.where(col("n_tok").between(30, 2000))
      val deduped = kept
        .groupBy(md5(col("norm")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), max(col("n_tok")).as("n_tok"))
      val tagged = deduped
        .withColumn("b", conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int"))
        .withColumn("split",
          when(col("b") < 204, "train").when(col("b") < 230, "val").otherwise("test"))
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
      tagged.groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("n_tokens"))
        .orderBy(col("split"), col("lang"))
    }),

    // Boilerplate / shared-span detection: 8-grams appearing in ≥ 3
    // documents are cross-document boilerplate (headers, templates, copied
    // spans); each doc reports how much of it is shared (exact integer
    // ratio). Two hash aggregations — per-doc distinct grams, then gram
    // document-frequency — and a semi-join back; the boiler gram set is
    // the high-df tail (tiny) and broadcasts. Production tunes the
    // threshold as a corpus FRACTION (e.g. 0.1%); this corpus's max 8-gram
    // df is 3 (measured — only the planted near-dup clusters share spans),
    // so the demo threshold is the absolute ≥ 3 — the plan shape is
    // identical either way.
    "q_boilerplate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val grams = docs
        .withColumn("toks", split(trim(lower(col("text"))), " "))
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(
            |  sequence(0, greatest(size(toks) - 8, 0)),
            |  i -> concat_ws(' ', slice(toks, i + 1, 8))))""".stripMargin)).as("g"))
      val boiler = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .where(col("df") >= 3)
        .select(col("g"))
      grams.join(broadcast(boiler), Seq("g"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boiler"))
        .join(grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams")),
              Seq("doc_id"), "right")
        .select(col("doc_id"), col("n_grams"),
                coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
                expr("coalesce(n_boiler, 0L) * 10000 div n_grams").as("boiler_ratio_e4"))
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization + dedup (the Common-Crawl-style curation stage):
    // synthetic fetch URLs (scheme/host case noise, default :443 port,
    // utm_* tracking params, unsorted query strings) collapse to a
    // canonical form — lowercase base, default port stripped, tracking
    // params dropped, remaining params sorted — and duplicates dedup to
    // the lowest doc_id. Pure per-row string surgery (codegen'd split/
    // filter/sort_array) + one hash aggregation on the canonical key.
    "q_dedup_url" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("raw", concat(
          lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM:443/d/"),
          (col("doc_id") % 20).cast("string"),
          lit("?utm_source=feed&ref="), col("lang"),
          lit("&id="), (col("doc_id") % 10).cast("string")))
        .withColumn("base", expr("lower(element_at(split(raw, '[?]'), 1))"))
        .withColumn("base", expr("replace(base, ':443/', '/')"))
        .withColumn("params", expr(
          "array_join(sort_array(filter(split(element_at(split(raw, '[?]'), 2), '&'), p -> p not like 'utm_%')), '&')"))
        .withColumn("canon",
          expr("concat(base, case when params = '' then '' else concat('?', params) end)"))
        .groupBy(col("canon"))
        .agg(count(lit(1)).as("n_dupes"), min(col("doc_id")).as("keep_id"))
        .orderBy(col("canon"))),

    "q_sample_hash" -> ((s, d) =>
      Tables.orders(s, d)
        .where(conv(substring(md5(col("o_orderkey").cast("string")), 1, 2), 16, 10)
          .cast("int") < 26)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Weighted (probability-proportional-to-size) sampling — priority
    // sampling (Duffield–Lund–Thorup): each doc gets priority key u/w where
    // u is a 32-bit md5-derived uniform and w its weight (n_chars — longer
    // docs are worth more training tokens); the sample is the k smallest
    // keys. Deterministic: u is the q_sample_hash md5 idiom widened to 8
    // hex digits, and the key is ONE IEEE-754 double division of two exact
    // integers — bit-identical in both engines, so even key comparisons at
    // rounding boundaries agree. The k-smallest runs as
    // TakeOrderedAndProject (no global sort shuffle); at 100 TB this is a
    // map-side per-partition top-k + a k-row driver merge — the one-pass
    // distributed weighted sampler (no per-stratum thresholds needed,
    // unlike q_sample_strat). The double key is ordering-only and never
    // emitted (float output hazard).
    "q_sample_weighted" -> ((s, d) =>
      Tables.documents(s, d)
        .where(col("n_chars") > 0)
        .withColumn("u",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"))
        .withColumn("key", col("u").cast("double") / col("n_chars"))
        .orderBy(col("key"), col("doc_id")).limit(25)
        .select(col("doc_id"), col("n_chars"), col("u"))
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("u").cast("double") / col("n_chars"),
                                           col("doc_id"))))
        .orderBy(col("rnk"))),

    // IVF ANN: 16 fixed coarse centroids (vec_id 100–115); every vector is
    // assigned to its nearest centroid (the "inverted file" bucket), queries
    // probe their 2 nearest buckets and exact-rank only those candidates.
    // Zero-norm vectors are excluded on both sides (cosine undefined).
    "q_sim_ivf" -> ((s, d) => {
      graft.functions.FloatDot.register(s)
      val nz = Tables.embeddings(s, d)
        .withColumn("nrm", sqrt(expr("graft_float_dot(embedding, embedding)")))
        .where(col("nrm") > 0)
      val cents = nz.where(col("vec_id").between(100, 115))
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
      val wAssign = Window.partitionBy(col("n_id")).orderBy(col("c_score").desc, col("c_id"))
      val assigned = nz.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
        .join(broadcast(cents))
        .withColumn("c_score", expr("graft_float_dot(n_emb, c_emb)") / (col("n_nrm") * col("c_nrm")))
        .withColumn("arn", row_number().over(wAssign))
        .where(col("arn") === 1)
        .select(col("n_id"), col("n_emb"), col("n_nrm"), col("c_id").as("bucket"))
      val wProbe = Window.partitionBy(col("q_id")).orderBy(col("p_score").desc, col("c_id"))
      val probes = nz.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
        .join(broadcast(cents))
        .withColumn("p_score", expr("graft_float_dot(q_emb, c_emb)") / (col("q_nrm") * col("c_nrm")))
        .withColumn("prn", row_number().over(wProbe))
        .where(col("prn") <= 2)
        .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id").as("bucket"))
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
      assigned.join(broadcast(probes), "bucket")
        .withColumn("score", expr("graft_float_dot(q_emb, n_emb)") / (col("q_nrm") * col("n_nrm")))
        .withColumn("rn", row_number().over(wTop))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"),
                round(col("score") * 10000).cast("int").as("score_e4"), col("rn"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // RAG-ingestion chunking: fixed 200-char windows at stride 150 (50-char
    // overlap so no sentence is lost at a boundary) — the retrieval-corpus
    // preparation step between curation and embedding. One generator
    // expression (explode of an offset sequence + substring) per document:
    // no UDF, fully codegen, output size = ceil(len/stride) rows per doc.
    // Chunk identity is (doc_id, idx) + content md5 — the md5 is what an
    // embedding cache / incremental re-chunk keys on.
    "q_chunk_overlap" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        .select(col("doc_id"), col("text"),
                explode(expr("sequence(0, cast(len - 1 as int), 150)")).as("off"))
        .select(col("doc_id"), (col("off") / 150).cast("int").as("chunk_idx"),
                expr("substring(text, off + 1, 200)").as("chunk"))
        .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("chunk_md5"),
                length(col("chunk")).cast("long").as("chunk_len"))
        .orderBy(col("doc_id"), col("chunk_idx"))),
  )

  override def oracles: Map[String, String] = Map(
    "q_novelty" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |grams AS (
        |  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
        |    RANGE(0, GREATEST(LEN(toks) - 7, 1)),
        |    i -> ARRAY_TO_STRING(toks[i + 1:i + 8], ' ')))) AS g
        |  FROM base),
        |owner AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(ROUND(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1e4
        |             / COUNT(*)) AS BIGINT) AS novel_e4
        |FROM grams JOIN owner USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dup_matrix" ->
      """WITH h AS (SELECT md5(LOWER(TRIM(text))) AS h, source FROM documents)
        |SELECT a.source AS sa, b.source AS sb,
        |  COUNT(*) AS n_pairs, COUNT(DISTINCT a.h) AS n_texts
        |FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
        |GROUP BY a.source, b.source ORDER BY sa, sb""".stripMargin,

    "q_contamination" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(0, GREATEST(LEN(toks) - 7, 1)),
        |         i -> ARRAY_TO_STRING(toks[i + 1:i + 8], ' '))) AS sh FROM base),
        |bg AS (SELECT DISTINCT UNNEST(sh) AS g FROM sh WHERE doc_id < 20),
        |corp AS (SELECT doc_id, UNNEST(sh) AS g FROM sh WHERE doc_id >= 20)
        |SELECT corp.doc_id, COUNT(DISTINCT corp.g) AS n_hits
        |FROM corp JOIN bg ON corp.g = bg.g
        |GROUP BY corp.doc_id ORDER BY corp.doc_id""".stripMargin,

    "q_pii_mask" ->
      """SELECT doc_id,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9._]+@[a-z0-9.]+[.][a-z][a-z]+')) AS INTEGER) AS n_emails,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]+')) AS INTEGER) AS n_nums,
        |  md5(REGEXP_REPLACE(
        |    REGEXP_REPLACE(text, '[a-z0-9._]+@[a-z0-9.]+[.][a-z][a-z]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g')) AS masked_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_repetition_filter" ->
      """WITH base AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks FROM documents),
        |grams AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(0, GREATEST(LEN(toks) - 1, 1)),
        |            i -> ARRAY_TO_STRING(toks[i + 1:i + 2], ' '))) AS g FROM base),
        |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g),
        |agg AS (SELECT doc_id, MAX(c) AS top_cnt, CAST(SUM(c) AS BIGINT) AS n_grams
        |        FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_grams,
        |  CAST(ROUND(top_cnt * 10000.0 / n_grams) AS INTEGER) AS top_e4,
        |  (CAST(ROUND(top_cnt * 10000.0 / n_grams) AS INTEGER) >= 500) AS repetitive
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q_doc_norm" ->
      """SELECT doc_id,
        |  CAST(LENGTH(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(TRIM(text)),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS INTEGER) AS n_chars_norm,
        |  md5(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(TRIM(text)),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE CAST(('0x' || SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)) AS INTEGER) < 26
        |ORDER BY o_orderkey""".stripMargin,

    // Priority-sampling key = one IEEE double division of two exact ints —
    // bit-identical cross-engine, so the selected set and its order match.
    "q_sample_weighted" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars,
        |    CAST(('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS u
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars, u,
        |  CAST(ROW_NUMBER() OVER (ORDER BY CAST(u AS DOUBLE) / n_chars, doc_id)
        |    AS INTEGER) AS rnk
        |FROM w ORDER BY rnk LIMIT 25""".stripMargin,

    "q_pipeline_e2e" ->
      """WITH norm AS (
        |  SELECT doc_id, lang,
        |    REGEXP_REPLACE(TRIM(LOWER(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, lang, norm,
        |    CAST(LEN(STRING_SPLIT(norm, ' ')) AS INTEGER) AS n_tok
        |  FROM norm),
        |kept AS (SELECT * FROM tok WHERE n_tok BETWEEN 30 AND 2000),
        |ded AS (
        |  SELECT MD5(norm) AS h, MIN(doc_id) AS doc_id, MAX(n_tok) AS n_tok
        |  FROM kept GROUP BY MD5(norm)),
        |tagged AS (
        |  SELECT d.doc_id, d.n_tok, k.lang,
        |    CASE WHEN CAST(('0x' || SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)) AS INTEGER) < 204 THEN 'train'
        |         WHEN CAST(('0x' || SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)) AS INTEGER) < 230 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM ded d JOIN documents k ON d.doc_id = k.doc_id)
        |SELECT split, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |FROM tagged GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    "q_boilerplate" ->
      """WITH base AS (
        |  SELECT doc_id, STRING_SPLIT(TRIM(LOWER(text)), ' ') AS toks FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
        |    RANGE(0, GREATEST(LEN(toks) - 7, 1)),
        |    i -> ARRAY_TO_STRING(toks[i + 1:i + 8], ' ')))) AS g
        |  FROM base),
        |boiler AS (
        |  SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 3),
        |per AS (
        |  SELECT grams.doc_id, COUNT(*) AS n_grams, COUNT(boiler.g) AS n_boiler
        |  FROM grams LEFT JOIN boiler ON grams.g = boiler.g
        |  GROUP BY grams.doc_id)
        |SELECT doc_id, n_grams, n_boiler,
        |  n_boiler * 10000 // n_grams AS boiler_ratio_e4
        |FROM per ORDER BY doc_id""".stripMargin,

    "q_dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.' || UPPER(source) || '.Example.COM:443/d/'
        |      || CAST(doc_id % 20 AS VARCHAR)
        |      || '?utm_source=feed&ref=' || lang
        |      || '&id=' || CAST(doc_id % 10 AS VARCHAR) AS raw
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    REPLACE(LOWER(STRING_SPLIT(raw, '?')[1]), ':443/', '/') AS base,
        |    ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
        |      STRING_SPLIT(STRING_SPLIT(raw, '?')[2], '&'),
        |      p -> p NOT LIKE 'utm_%')), '&') AS params
        |  FROM u)
        |SELECT base || CASE WHEN params = '' THEN '' ELSE '?' || params END AS canon,
        |  COUNT(*) AS n_dupes, MIN(doc_id) AS keep_id
        |FROM c GROUP BY 1 ORDER BY canon""".stripMargin,

    "q_sim_ivf" -> {
      val cosQC = duckCos("q.q_emb", "c.c_emb")
      val cosEC = duckCos("e.embedding", "c.c_emb")
      val cosQN = duckCos("pr.q_emb", "asg.n_emb")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE LIST_SUM(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) > 0),
         |c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM e WHERE vec_id BETWEEN 100 AND 115),
         |asg AS (SELECT n_id, n_emb, bucket FROM (
         |    SELECT e.vec_id AS n_id, e.embedding AS n_emb, c.c_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY $cosEC DESC, c.c_id) AS arn
         |    FROM e CROSS JOIN c) t WHERE arn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < 10),
         |pr AS (SELECT q_id, q_emb, bucket FROM (
         |    SELECT q.q_id, q.q_emb, c.c_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY $cosQC DESC, c.c_id) AS prn
         |    FROM q CROSS JOIN c) t WHERE prn <= 2)
         |SELECT q_id, n_id, CAST(ROUND(score * 10000) AS INTEGER) AS score_e4, rn FROM (
         |  SELECT pr.q_id, asg.n_id, $cosQN AS score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY pr.q_id
         |      ORDER BY $cosQN DESC, asg.n_id) AS INTEGER) AS rn
         |  FROM asg JOIN pr ON asg.bucket = pr.bucket) t
         |WHERE rn <= 5
         |ORDER BY q_id, rn""".stripMargin
    },

    "q_chunk_overlap" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    UNNEST(RANGE(0, CAST(LENGTH(text) AS BIGINT), 150)) AS off,
        |    text
        |  FROM documents)
        |SELECT doc_id, CAST(off // 150 AS INT) AS chunk_idx,
        |  md5(SUBSTR(text, CAST(off + 1 AS INT), 200)) AS chunk_md5,
        |  CAST(LENGTH(SUBSTR(text, CAST(off + 1 AS INT), 200)) AS BIGINT) AS chunk_len
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
  )
}
