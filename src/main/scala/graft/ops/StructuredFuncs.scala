package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured / encoded-value scalar surface: cryptographic digests and
  * binary encodings, struct round-trips, embedded CSV and XML cells, and
  * array generators. These are the ETL-normalization primitives for feeds
  * whose records carry nested or encoded payloads (the reference's domain is
  * ingest of heterogeneous disaster feeds, `/root/reference/README.md:1-2`),
  * complementing the JSON path in ScalarFuncs (q_json_funcs/q_json_variant).
  *
  * All Catalyst built-ins — digests, codecs and xpath run inside whole-stage
  * codegen, no UDFs, so the scan→project pipeline stays fused at 100 TB.
  *
  * Dialect notes (verified against DuckDB 1.0):
  * - md5/sha256 render lowercase hex on both engines; Spark's `hex()` renders
  *   uppercase A–F while DuckDB's renders lowercase → oracle wraps UPPER().
  * - Spark `base64` takes BINARY (cast from string); DuckDB `base64` takes a
  *   BLOB (`CAST(x AS BLOB)` encodes the UTF-8 bytes) — same RFC 4648 output.
  * - Spark-only digests (xxhash64, crc32 — the shuffle/bucketing hashes) have
  *   no DuckDB twin and are exercised in StructuredFuncsSpec instead.
  * - DuckDB has no XML functions at all: the XML cell is CONSTRUCTED from
  *   base columns, Spark extracts via xpath_*, and the oracle recomputes the
  *   expected values directly from the same base columns — a wrong xpath
  *   parse on the Spark side breaks the hash match.
  */
object StructuredFuncs extends OpModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Digests + binary codecs: the content-addressing primitives (exact
    // dedup keys, cache keys, split assignment all hang off these).
    "q_hash_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          md5(col("p_name")).as("md5_hex"),
          sha2(col("p_name"), 256).as("sha256_hex"),
          hex(col("p_name")).as("name_hex"),
          (decode(unhex(hex(col("p_name"))), "UTF-8") === col("p_name")).as("hex_rt_ok"),
          base64(col("p_name").cast("binary")).as("name_b64"),
          (decode(unbase64(base64(col("p_name").cast("binary"))), "UTF-8") === col("p_name")).as("b64_rt_ok"),
          ascii(substring(col("p_name"), 1, 1)).as("first_code"),
          expr("chr(65 + p_partkey % 26)").as("bucket_chr"))
        .orderBy(col("p_partkey"))),

    // Struct build → field access → JSON render → nested access. The typed
    // record cell: at scale this is how composite keys and denormalized
    // sub-records ride a single column without exploding the schema.
    "q_struct_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
                named_struct(lit("k"), col("o_custkey"),
                             lit("p"), col("o_orderpriority")).as("st"),
                named_struct(lit("inner"),
                             named_struct(lit("st"), col("o_orderstatus")),
                             lit("cents"), Det.cents(col("o_totalprice"))).as("nest"))
        .select(
          col("o_orderkey"),
          col("st.k").as("sk"),
          col("st.p").as("sp"),
          to_json(col("st")).as("js"),
          col("nest.inner.st").as("deep_status"),
          col("nest.cents").as("cents"))
        .orderBy(col("o_orderkey"))),

    // Embedded CSV cell: serialize → parse back with a declared schema →
    // field equality flags. from_csv/to_csv are the per-cell mirror of the
    // src_csv bulk reader.
    "q_csv_funcs" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
                Det.cents(col("o_totalprice")).as("cents"))
        .withColumn("csv", to_csv(struct(col("o_orderkey"), col("o_orderstatus"), col("cents"))))
      base
        .withColumn("rt", from_csv(col("csv"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT"),
          Map.empty[String, String]))
        .select(col("o_orderkey"), col("csv"),
                col("rt.o_orderstatus").as("rt_status"),
                col("rt.cents").as("rt_cents"),
                (col("rt.o_orderkey") === col("o_orderkey")).as("rt_ok"))
        .orderBy(col("o_orderkey"))
    }),

    // Embedded XML cell: construct from base columns, extract with the Hive
    // xpath surface (string/int/boolean/node-list). The node-list lands as
    // a CSV string (raw arrays crash the driver comparator).
    "q_xml_funcs" -> ((s, d) =>
      Tables.supplier(s, d)
        .withColumn("x", concat(
          lit("<r><nm>"), col("s_name"), lit("</nm><v>"),
          col("s_nationkey").cast("string"), lit("</v><v>"),
          col("s_suppkey").cast("string"), lit("</v></r>")))
        .select(
          col("s_suppkey"),
          expr("xpath_string(x, '/r/nm')").as("nm"),
          expr("xpath_int(x, '/r/v[1]')").as("v1"),
          expr("xpath_boolean(x, '/r/v[2] > 3')").as("big"),
          expr("cast(size(xpath(x, '/r/v/text()')) as int)").as("n_v"),
          expr("array_join(xpath(x, '/r/v/text()'), ',')").as("vs"))
        .orderBy(col("s_suppkey"))),

    // Array generators: integer/date sequences, repetition, flattening,
    // element-wise zip — the dimension-densification and synthetic-range
    // primitives (contrast q_calendar_fill, which generates via recursion).
    "q_seq_funcs" -> ((s, d) =>
      Tables.nation(s, d)
        .select(
          col("n_nationkey"),
          expr("array_join(transform(sequence(1, n_nationkey % 5 + 2), x -> cast(x as string)), ',')").as("seq"),
          expr("cast(size(sequence(date'2024-01-01', date'2024-01-05', interval 1 day)) as int)").as("n_days"),
          expr("array_join(array_repeat(n_name, 3), ',')").as("rep3"),
          expr("array_join(transform(flatten(array(array(1, 2), array(3, n_regionkey))), x -> cast(x as string)), ',')").as("flat"),
          expr("array_join(transform(zip_with(sequence(1, 3), sequence(n_nationkey, n_nationkey + 2), (x, y) -> x + y), v -> cast(v as string)), ',')").as("zipsum"))
        .orderBy(col("n_nationkey"))),
  )

  override def oracles: Map[String, String] = Map(
    "q_hash_funcs" ->
      """SELECT p_partkey,
        |  MD5(p_name) AS md5_hex,
        |  SHA256(p_name) AS sha256_hex,
        |  UPPER(HEX(p_name)) AS name_hex,
        |  TRUE AS hex_rt_ok,
        |  BASE64(CAST(p_name AS BLOB)) AS name_b64,
        |  TRUE AS b64_rt_ok,
        |  CAST(ASCII(SUBSTR(p_name, 1, 1)) AS INTEGER) AS first_code,
        |  CHR(CAST(65 + p_partkey % 26 AS INTEGER)) AS bucket_chr
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_struct_funcs" ->
      """SELECT o_orderkey,
        |  o_custkey AS sk,
        |  o_orderpriority AS sp,
        |  '{"k":' || CAST(o_custkey AS VARCHAR) || ',"p":"' || o_orderpriority || '"}' AS js,
        |  o_orderstatus AS deep_status,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_csv_funcs" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ','
        |    || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR) AS csv,
        |  o_orderstatus AS rt_status,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rt_cents,
        |  TRUE AS rt_ok
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_xml_funcs" ->
      """SELECT s_suppkey,
        |  s_name AS nm,
        |  CAST(s_nationkey AS INTEGER) AS v1,
        |  (s_suppkey > 3) AS big,
        |  2 AS n_v,
        |  CAST(s_nationkey AS VARCHAR) || ',' || CAST(s_suppkey AS VARCHAR) AS vs
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q_seq_funcs" ->
      """SELECT n_nationkey,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(GENERATE_SERIES(1, n_nationkey % 5 + 2),
        |                                 x -> CAST(x AS VARCHAR)), ',') AS seq,
        |  5 AS n_days,
        |  n_name || ',' || n_name || ',' || n_name AS rep3,
        |  '1,2,3,' || CAST(n_regionkey AS VARCHAR) AS flat,
        |  CAST(1 + n_nationkey AS VARCHAR) || ','
        |    || CAST(2 + n_nationkey + 1 AS VARCHAR) || ','
        |    || CAST(3 + n_nationkey + 2 AS VARCHAR) AS zipsum
        |FROM nation ORDER BY n_nationkey""".stripMargin,
  )
}
