package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 — string / regex / date / math / array / map / JSON scalar
  * functions. All Catalyst built-ins (incl. higher-order array lambdas) —
  * zero UDFs, so everything stays codegen'd and pushdown-safe (§2.10).
  *
  * Dialect drift handled per D5 (verified empirically against DuckDB 1.0):
  * DuckDB LENGTH/INSTR/ranks return BIGINT (cast to INTEGER in oracle SQL);
  * DuckDB `dayofweek` is 0=Sunday vs Spark 1=Sunday (+1 in oracle);
  * DuckDB `regexp_replace` needs the 'g' flag to match Spark's replace-all;
  * DuckDB map access `m[k]` yields a LIST (unwrap with [1]); DuckDB list
  * slicing `l[a:b]` is 1-based inclusive = Spark `slice(l, a, b-a+1)`.
  */
object ScalarFuncs extends OpModule {

  /** float element → exact integer 1e-3 units (D1: bit-exact cross-engine). */
  private val E3 = "cast(round(cast(x as double) * 1000) as bigint)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("pre"),
          length(col("p_name")).as("len"),
          trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
          expr("replace(p_type, ' ', '_')").as("rep"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("pad"),
          instr(col("p_name"), "e").as("pos_e"),
          col("p_name").like("%e%").as("has_e"))
        .orderBy(col("p_partkey"))),

    "q_str_regex" -> ((s, d) =>
      Tables.supplier(s, d)
        .select(
          col("s_suppkey"),
          regexp_extract(col("s_name"), "([0-9]+)", 1).cast("int").as("num"),
          regexp_replace(col("s_name"), "[0-9]+", "#").as("masked"),
          col("s_name").rlike("0{3,}").as("z3"))
        .orderBy(col("s_suppkey"))),

    // Edit-distance similarity — the fuzzy-matching primitive for entity
    // resolution at normalize time.
    "q_str_fuzzy" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).as("lev_bt"),
          levenshtein(col("p_name"), reverse(col("p_name"))).as("lev_pal"),
          levenshtein(lower(col("p_type")), col("p_type")).as("lev_case"))
        .orderBy(col("p_partkey"))),

    "q_str_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(split(trim(col("text")), " ")).as("n_tokens"),
          element_at(split(trim(col("text")), " "), 1).as("first_tok"))
        .orderBy(col("doc_id"))),

    "q_date_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dy"),
          // o_orderdate loads as TIMESTAMP_NTZ (ms parquet, no UTC flag);
          // date_trunc yields tz-aware TIMESTAMP — cast back so the output
          // schema matches DuckDB's naive TIMESTAMP.
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("mstart"),
          // DATE outputs ride as ISO strings (comparator-dtype-proof)
          col("o_orderdate").cast("date").cast("string").as("od"),
          date_add(col("o_orderdate").cast("date"), 7).cast("string").as("d7"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"),
          last_day(col("o_orderdate").cast("date")).cast("string").as("eom"),
          dayofweek(col("o_orderdate")).as("dow"),
          unix_timestamp(col("o_orderdate").cast("timestamp")).as("epoch_s"))
        .orderBy(col("o_orderkey"))),

    "q_math_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          round(col("p_retailprice"), 1).as("r1"),
          floor(col("p_retailprice")).as("flr"),
          ceil(col("p_retailprice")).as("cl"),
          abs(col("p_size") - 25).as("ab"),
          pow(col("p_size"), 2).as("sq"),
          sqrt(col("p_size").cast("double")).as("sqr"),
          round(log(col("p_retailprice")), 4).as("ln_p"),
          round(log10(col("p_retailprice")), 4).as("log10_p"),
          (col("p_size") % 7).as("md"),
          signum(col("p_size") - 25).cast("int").as("sgn"),
          greatest(col("p_size"), lit(10)).as("gr"),
          least(col("p_size"), lit(40)).as("ls"))
        .orderBy(col("p_partkey"))),

    "q_array_funcs" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first"),
          expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
          expr("round(aggregate(embedding, cast(0.0 as double), (a, x) -> a + abs(cast(x as double))), 3)").as("l1"),
          // array outputs ride as CSV strings of integer 1e-3 units: raw
          // arrays crash the driver's pandas row-sort (unhashable ndarray)
          // and stringified doubles have engine-specific exponent rendering
          expr(s"array_join(transform(sort_array(embedding), x -> cast($E3 as string)), ',')").as("srt"),
          expr(s"array_join(transform(slice(embedding, 3, 4), x -> cast($E3 as string)), ',')").as("sl"),
          expr(s"array_join(transform(embedding, x -> cast(cast(round(cast(x as double) * 2000) as bigint) as string)), ',')").as("doubled"),
          size(array_distinct(col("embedding"))).as("nd"))
        .orderBy(col("vec_id"))),

    "q_explode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("token"))
        .orderBy(col("doc_id"), col("token"))),

    // OUTER generator semantics: explode_outer keeps rows whose array is
    // empty (NULL-padded) — plain explode silently DROPS them, losing
    // documents from a per-token pipeline. Most docs here have no 'dup'
    // token, so the inner/outer difference is most of the table.
    "q_explode_outer" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
                explode_outer(expr("filter(split(trim(text), ' '), t -> t = 'dup')")).as("tok"))
        .orderBy(col("doc_id"), col("tok"))),

    "q_map_funcs" -> ((s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
                map_from_arrays(
                  array(lit("nk"), lit("rk")),
                  array(col("n_nationkey"), col("n_regionkey"))).as("m"))
        .select(
          col("n_nationkey"),
          element_at(col("m"), "nk").as("nk_val"),
          element_at(col("m"), "rk").as("rk_val"),
          array_join(map_keys(col("m")), ",").as("ks"))
        .orderBy(col("n_nationkey"))),

    // Spark 4 VariantType: parse the JSON once into a variant, extract
    // typed fields (the modern replacement for repeated get_json_object —
    // one parse, typed shredding).
    "q_json_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k_int"),
          expr("variant_get(parse_json(props), '$.k', 'double')").as("k_dbl"))
        .orderBy(col("event_id"))),

    "q_json_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_point"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
            .getField("k").as("k_full"))
        .orderBy(col("event_id"))),

    // Error-safe arithmetic (try_*): NULL where strict ANSI mode would raise
    // — division by zero, numeric overflow, malformed casts. The ETL-grade
    // "quarantine, don't crash" contract: at 100 TB one dirty row must not
    // kill a 1000-executor job. All try_* stay codegen'd expressions.
    // Overflow fires on 1/1000 rows, NOT every row: Spark's try_add handles
    // overflow via a caught per-row Java exception, and an every-row
    // overflow turns a map-only scalar query into an exception benchmark
    // (measured 42.6 s at the 10× tier, ~28 µs/row — was the single most
    // expensive query in the full sweep). Rare dirty rows are also what the
    // quarantine contract actually models.
    "q_try_arith" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("try_divide(cast(round(o_totalprice * 100) as bigint), day(o_orderdate) - 1)")
            .as("price_per"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
          // round-10: the original cast a STATUS LETTER on every row —
          // Spark's ANSI string→int cast throws (TryEval catches) per
          // malformed row, the same exception-per-row trap the round-7
          // overflow fix removed (isolated: 10.8 s of 36 s at sf1 for this
          // one column). Malformed input now rides the 1/1000 dirty-key
          // contract like overflow_add.
          expr("""try_cast(CASE WHEN o_orderkey % 1000 = 0 THEN o_orderstatus
                 |  ELSE cast(o_orderkey % 100 AS string) END AS INT)"""
            .stripMargin).as("status_num"),
          // keys ≡ 0 (mod 1000) add o_orderkey+1 ≥ 1 to Long.MaxValue →
          // overflow → NULL; all other rows add 0 (legal) → MaxValue.
          expr("""try_add(9223372036854775807L,
                 |  CASE WHEN o_orderkey % 1000 = 0 THEN o_orderkey + 1 ELSE 0L END)"""
            .stripMargin).as("overflow_add"))
        .orderBy(col("o_orderkey"))),

    // Bitwise scalar surface. Dialect trap: `^` is XOR in Spark SQL but
    // EXPONENT in DuckDB — the oracle spells xor() explicitly.
    "q_bitwise" -> ((s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(col("o_custkey")).as("k_and"),
          col("o_orderkey").bitwiseOR(lit(255L)).as("k_or"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("k_xor"),
          expr("shiftleft(o_orderkey & 15, 3)").as("k_shl"),
          expr("shiftright(o_orderkey, 4)").as("k_shr"),
          expr("cast(bit_count(o_orderkey) as int)").as("k_bits"))
        .orderBy(col("o_orderkey"))),

    // regexp_extract_all: every match, not just the first — emitted as a
    // CSV string (raw array outputs crash the driver's row-sort, SURVEY §9).
    "q_regex_extract_all" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(expr("regexp_extract_all(text, '[a-z]+ing', 0)"), ",").as("ings"),
          size(expr("regexp_extract_all(text, '[a-z]+ing', 0)")).as("n_ings"))
        .orderBy(col("doc_id"))),

    // URL parsing (parse_url): host/path/query extraction plus keyed query
    // lookup. The URL is derived from existing columns (the corpus has no
    // URL column); the oracle recovers the same parts with anchored regexes
    // — parse_url has no DuckDB twin.
    "q_url_funcs" -> ((s, d) => {
      val url = concat(lit("https://"), col("source"), lit(".example.org/"),
        col("lang"), lit("/doc/"), col("doc_id").cast("string"),
        lit("?ref="), pmod(col("doc_id"), lit(7)).cast("string"))
      Tables.documents(s, d)
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'QUERY', 'ref')").cast("int").as("ref"))
        .orderBy(col("doc_id"))
    }),

    // Spark 4 collations: UTF8_LCASE makes comparison/grouping
    // case-insensitive at the TYPE level — no lower() rewrites sprinkled
    // through the query, and codegen'd comparators (vs a per-row UDF). The
    // three case variants of each segment must collapse into one group.
    // Output is re-cast to the default collation (lower()) so the result
    // schema stays plain UTF8 for the driver/oracle compare.
    "q_str_collate" -> ((s, d) => {
      val seg = Tables.customer(s, d).select(col("c_mktsegment").as("seg"))
      val mixed = seg.select(lower(col("seg")).as("seg"))
        .unionByName(seg.select(initcap(col("seg")).as("seg")))
        .unionByName(seg)
      mixed.groupBy(expr("collate(seg, 'UTF8_LCASE')").as("k"))
        .agg(count(lit(1)).as("n"))
        .select(expr("cast(lower(k) as string)").as("seg_ci"), col("n"))
        .orderBy(col("seg_ci"))
    }),

    // Bitwise aggregates — order-independent by construction, so they're
    // distribution-safe (partial agg combines map-side like sum).
    "q_bitwise_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(expr("bit_and(o_custkey)").as("b_and"),
             expr("bit_or(o_custkey)").as("b_or"),
             expr("bit_xor(o_custkey)").as("b_xor"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))),
  )

  override def oracles: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS up, LOWER(p_brand) AS lo,
        |  SUBSTR(p_name, 1, 5) AS pre,
        |  CAST(LENGTH(p_name) AS INTEGER) AS len,
        |  TRIM(CONCAT('  ', p_brand, ' ')) AS trimmed,
        |  CONCAT_WS('-', p_brand, p_type) AS cw,
        |  REPLACE(p_type, ' ', '_') AS rep,
        |  LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS pad,
        |  CAST(INSTR(p_name, 'e') AS INTEGER) AS pos_e,
        |  (p_name LIKE '%e%') AS has_e
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_regex" ->
      """SELECT s_suppkey,
        |  CAST(REGEXP_EXTRACT(s_name, '([0-9]+)', 1) AS INTEGER) AS num,
        |  REGEXP_REPLACE(s_name, '[0-9]+', '#', 'g') AS masked,
        |  REGEXP_MATCHES(s_name, '0{3,}') AS z3
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q_str_fuzzy" ->
      """SELECT p_partkey,
        |  CAST(LEVENSHTEIN(p_brand, p_type) AS INTEGER) AS lev_bt,
        |  CAST(LEVENSHTEIN(p_name, REVERSE(p_name)) AS INTEGER) AS lev_pal,
        |  CAST(LEVENSHTEIN(LOWER(p_type), p_type) AS INTEGER) AS lev_case
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_split" ->
      """SELECT doc_id,
        |  CAST(LEN(STRING_SPLIT(TRIM(text), ' ')) AS INTEGER) AS n_tokens,
        |  STRING_SPLIT(TRIM(text), ' ')[1] AS first_tok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
        |  CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
        |  CAST(DAY(o_orderdate) AS INTEGER) AS dy,
        |  DATE_TRUNC('month', o_orderdate) AS mstart,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od,
        |  CAST(CAST(o_orderdate AS DATE) + 7 AS VARCHAR) AS d7,
        |  CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
        |  CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
        |  CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT p_partkey,
        |  ROUND(p_retailprice, 1) AS r1,
        |  CAST(FLOOR(p_retailprice) AS BIGINT) AS flr,
        |  CAST(CEIL(p_retailprice) AS BIGINT) AS cl,
        |  ABS(p_size - 25) AS ab,
        |  POW(p_size, 2) AS sq,
        |  SQRT(CAST(p_size AS DOUBLE)) AS sqr,
        |  ROUND(LN(p_retailprice), 4) AS ln_p,
        |  ROUND(LOG10(p_retailprice), 4) AS log10_p,
        |  (p_size % 7) AS md,
        |  CAST(SIGN(p_size - 25) AS INTEGER) AS sgn,
        |  GREATEST(p_size, 10) AS gr,
        |  LEAST(p_size, 40) AS ls
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(LEN(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS first,
        |  CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        |  ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))), 3) AS l1,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(LIST_SORT(embedding), x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)), ',') AS srt,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(embedding[3:6], x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)), ',') AS sl,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 2000) AS BIGINT)), ',') AS doubled,
        |  CAST(LEN(LIST_DISTINCT(embedding)) AS INTEGER) AS nd
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_explode" ->
      """SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS token
        |FROM documents ORDER BY doc_id, token""".stripMargin,

    // DuckDB has no outer UNNEST — empty lists are padded to [NULL] first,
    // which is exactly explode_outer's contract.
    "q_explode_outer" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    LIST_FILTER(STRING_SPLIT(TRIM(text), ' '), t -> t = 'dup') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  UNNEST(CASE WHEN LEN(toks) = 0 THEN [NULL] ELSE toks END) AS tok
        |FROM l ORDER BY doc_id, tok""".stripMargin,

    "q_map_funcs" ->
      """SELECT n_nationkey,
        |  MAP(['nk','rk'], [n_nationkey, n_regionkey])['nk'][1] AS nk_val,
        |  MAP(['nk','rk'], [n_nationkey, n_regionkey])['rk'][1] AS rk_val,
        |  ARRAY_TO_STRING(MAP_KEYS(MAP(['nk','rk'], [n_nationkey, n_regionkey])), ',') AS ks
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_json_variant" ->
      """SELECT event_id,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE) AS k_dbl
        |FROM events ORDER BY event_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_point,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_full
        |FROM events ORDER BY event_id""".stripMargin,

    // price_per: both engines divide the SAME exact integers (cents BIGINT /
    // small INT) as IEEE doubles → bit-identical. overflow_add: Spark's
    // try_add overflows to NULL exactly on keys ≡ 0 (mod 1000) (elsewhere it
    // adds 0 → MaxValue); DuckDB would raise on BIGINT overflow (no TRY
    // expression in 1.0), so the oracle pins the CASE the Spark semantics
    // guarantee.
    "q_try_arith" ->
      """SELECT o_orderkey,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) / NULLIF(day(o_orderdate) - 1, 0) AS price_per,
        |  TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
        |  CASE WHEN o_orderkey % 1000 = 0 THEN NULL
        |       ELSE CAST(o_orderkey % 100 AS INTEGER) END AS status_num,
        |  CASE WHEN o_orderkey % 1000 = 0 THEN NULL
        |       ELSE 9223372036854775807 END AS overflow_add
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & o_custkey AS k_and,
        |  o_orderkey | 255 AS k_or,
        |  xor(o_orderkey, o_custkey) AS k_xor,
        |  (o_orderkey & 15) << 3 AS k_shl,
        |  o_orderkey >> 4 AS k_shr,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS k_bits
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin,

    "q_bitwise_agg" ->
      """SELECT o_orderpriority,
        |  bit_and(o_custkey) AS b_and,
        |  bit_or(o_custkey) AS b_or,
        |  bit_xor(o_custkey) AS b_xor,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_str_collate" ->
      """SELECT LOWER(seg) AS seg_ci, COUNT(*) AS n FROM (
        |  SELECT LOWER(c_mktsegment) AS seg FROM customer
        |  UNION ALL
        |  SELECT UPPER(SUBSTR(c_mktsegment, 1, 1)) || LOWER(SUBSTR(c_mktsegment, 2)) FROM customer
        |  UNION ALL
        |  SELECT c_mktsegment FROM customer) t
        |GROUP BY LOWER(seg) ORDER BY seg_ci""".stripMargin,

    "q_regex_extract_all" ->
      """SELECT doc_id,
        |  COALESCE(ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(text, '[a-z]+ing'), ','), '') AS ings,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+ing')) AS INTEGER) AS n_ings
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_url_funcs" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.org/' || lang || '/doc/'
        |      || CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 7 AS VARCHAR) AS url
        |  FROM documents)
        |SELECT doc_id,
        |  REGEXP_EXTRACT(url, 'https://([^/]+)', 1) AS host,
        |  REGEXP_EXTRACT(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |  REGEXP_EXTRACT(url, '\?(.*)$', 1) AS query,
        |  CAST(REGEXP_EXTRACT(url, 'ref=([0-9]+)', 1) AS INTEGER) AS ref
        |FROM u ORDER BY doc_id""".stripMargin,
  )
}
