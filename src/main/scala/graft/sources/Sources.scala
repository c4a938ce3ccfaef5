package graft.sources

import graft.Tables
import graft.ops.OpModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.1 — ingest formats and sinks (the ETL side of the reference's
  * domain, `/root/reference/README.md:2`: feeds in, store out).
  *
  * Each query is a full round-trip: curated table → export format → re-ingest
  * with a DECLARED schema → result. The oracle compares against the original
  * table, so the round-trip must be lossless — that is the ingest contract.
  *
  * JDBC ingest (src_jdbc): executable against embedded Derby (the one
  * RDBMS in the image, `/opt/spark/jars/derby-10.16.1.1.jar`). The extract
  * parallelizes by key range — `partitionColumn`/`lowerBound`/`upperBound`/
  * `numPartitions` generate one range-predicate query per partition, the
  * same pattern every disaster-store upstream (PostGIS, etc.) gets.
  *
  * Scale posture: partitioned parquet (`sink_parquet_part`) is THE store
  * layout — writes are parallel per partition, reads prune by partition
  * predicate (verified: the read-back plan's PartitionFilters carry `yr`).
  * CSV/JSON exist for interchange, never for the hot path.
  */
object Sources extends OpModule {

  private[graft] def tmp(d: String, name: String) =
    s"target/tmp/src_${name}_${java.lang.Integer.toHexString(d.hashCode)}"

  /** Register the graft catalog for `body`, restoring the conf after (the
    * conf-scoped-query rule). Safe to restore eagerly: CatalogManager caches
    * the plugin instance under its name at first resolution, so the already-
    * analyzed plan (and any later `graft.*` query) keeps resolving while the
    * session conf stays clean for sibling queries. */
  private[graft] def withGraftCatalog[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.catalog.graft"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "graft.sources.GraftCatalog")
    try body finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None    => s.conf.unset(key)
    }
  }

  /** Point `graft.store` at `path` for `body`, restoring after. */
  private[graft] def withStorePath[T](s: SparkSession, path: String)(body: => T): T = {
    val key = GraftCatalog.StorePathKey
    val prev = s.conf.getOption(key)
    s.conf.set(key, path)
    try body finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None    => s.conf.unset(key)
    }
  }

  /** Seed a fresh graft-store at `path` from orders; returns (base frame,
    * max key) — shared by the q_store_* row-level family. */
  private[sources] def seedStore(s: SparkSession, d: String,
                        path: String): (DataFrame, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val base = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
              graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
    // range-clustered layout: disjoint per-file key zones, so the manifest
    // zone maps can actually prune (the sink_range_cluster posture)
    base.repartitionByRange(8, col("k"))
      .write.format("graft.sources.StoreSink").mode("overwrite")
      .option("path", path).save()
    (base, base.agg(max(col("k"))).collect()(0).getLong(0))
  }

  /** The shared CDC batch (hard deletes k%89, updates k%97 amt+100,
    * inserts maxK+k for k%101) — q_store_merge and q_store_merge_sql apply
    * it through different protocol layers, one oracle pins both. */
  private[sources] def storeCdc(base: DataFrame,
                       maxK: Long): (DataFrame, DataFrame, DataFrame) = {
    val dels = base.where(pmod(col("k"), lit(89)) === 0).select(col("k"))
    val upds = base.where(pmod(col("k"), lit(97)) === 0 &&
                          pmod(col("k"), lit(89)) =!= 0)
      .select(col("k"), col("grp"), (col("amt_cents") + 100).as("amt_cents"))
    val ins = base.where(pmod(col("k"), lit(101)) === 0)
      .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
              (col("k") * 10).as("amt_cents"))
    (dels, upds, ins)
  }

  /** Read the store back and aggregate per group, materialized inside the
    * caller's conf scope (the conf-scoped-query rule). */
  private[sources] def storeSummary(s: SparkSession, path: String): DataFrame = {
    val res = s.read.format("graft.sources.StoreSink").option("path", path).load()
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
      .orderBy(col("grp"))
    s.createDataFrame(java.util.Arrays.asList(res.collect(): _*), res.schema)
  }

  /** The storage-partitioned join (fact 40k rows ⋈ one-row-per-group dim,
    * both KeyGroupedPartitioning(grp, 8)); private[graft] so
    * BucketSourceSpec can audit the plan under the same confs. */
  private[graft] def spjJoin(s: SparkSession): DataFrame = {
    val a = s.read.format("graft.sources.BucketSource")
      .option("rows", "40000").option("groups", "8").load()
    val b = s.read.format("graft.sources.BucketSource")
      .option("rows", "8").option("groups", "8").load()
      .select(col("grp"), col("amt").as("dim_amt"))
    a.join(b, "grp")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("amt") + col("dim_amt")).as("total"))
      .orderBy(col("grp"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CSV round-trip with declared schema, header, and a nullable column.
    "src_csv" -> ((s, d) => {
      val path = tmp(d, "csv")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
                nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
                col("c_acctbal"))
        .write.mode("overwrite").option("header", true).csv(path)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("seg", StringType), StructField("c_acctbal", DoubleType)))
      s.read.schema(schema).option("header", true).csv(path)
        .orderBy(col("c_custkey"))
    }),

    // Newline-JSON round-trip with a nested struct field.
    "src_json" -> ((s, d) => {
      val path = tmp(d, "json")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
                struct(col("o_orderstatus").as("status"),
                       col("o_totalprice").as("price")).as("info"))
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("info", StructType(Seq(
          StructField("status", StringType), StructField("price", DoubleType))))))
      s.read.schema(schema).json(path)
        .select(col("o_orderkey"), col("info.status").as("status"),
                col("info.price").as("price"))
        .orderBy(col("o_orderkey"))
    }),

    // Partitioned columnar store + partition-pruned read-back.
    "sink_parquet_part" -> ((s, d) => {
      val path = tmp(d, "part")
      Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("yr").parquet(path)
      s.read.parquet(path)
        .where(col("yr").between(1996, 1998)) // prunes to 3 of 7 partitions
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n"), graft.ops.Det.moneySum(col("o_totalprice")).as("sum_cents"))
        .orderBy(col("yr"))
    }),

    // Malformed-feed ingest: PERMISSIVE parse quarantines corrupt records
    // into a column instead of failing the job — the disaster-feed reality.
    // Corruption is content-keyed (orderkey % 7) so the result is a pure
    // function of the table and the oracle can reproduce it.
    "src_json_corrupt" -> ((s, d) => {
      val path = tmp(d, "corrupt")
      Tables.orders(s, d)
        .select(when(col("o_orderkey") % 7 === 0,
                     substring(to_json(struct(col("o_orderkey"), col("o_orderstatus"))), 1, 10))
                  .otherwise(to_json(struct(col("o_orderkey"), col("o_orderstatus"))))
                  .as("value"))
        .write.mode("overwrite").text(path)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
        StructField("_corrupt_record", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .groupBy(coalesce(col("o_orderstatus"), lit("_corrupt")).as("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status"))
    }),

    // Schema evolution: batch 1 was written before o_orderpriority existed;
    // batch 2 carries it. mergeSchema reconciles the file-level schemas into
    // the union, padding old files with NULL — the append-only table
    // lifecycle every long-lived store goes through. (At scale prefer a
    // table format that tracks schema in metadata; the read contract is the
    // same.) Partition column `batch` keys the two eras.
    "src_schema_evolve" -> ((s, d) => {
      val path = tmp(d, "evolve")
      val base = Tables.orders(s, d).where(col("o_orderkey") < 2000)
      base.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), graft.ops.Det.cents(col("o_totalprice")).as("cents"))
        .write.mode("overwrite").parquet(s"$path/batch=1")
      base.where(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), graft.ops.Det.cents(col("o_totalprice")).as("cents"),
                col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$path/batch=2")
      s.read.option("mergeSchema", true).parquet(path)
        .select(col("batch").cast("int").as("batch"), col("o_orderkey"),
                col("cents"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // ORC round-trip: the second columnar format Spark ships a vectorized
    // reader for. Full lineitem out and back (schema travels in the file,
    // none declared), then an aggregate the oracle reproduces from the
    // parquet original — losslessness is the contract, same as CSV/JSON.
    "src_orc" -> ((s, d) => {
      val path = tmp(d, "orc")
      Tables.lineitem(s, d).write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("l_extendedprice")).as("price_cents"),
             max(col("l_shipdate")).as("last_ship"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Small-file compaction: the events feed lands as many tiny files (the
    // streaming-ingest reality); compaction rewrites to size-targeted files.
    // The file count derives from input bytes / target size — at 100 TB the
    // same arithmetic yields thousands of 128 MB files instead of millions
    // of KB-scale ones (NameNode/listing pressure, scan task startup).
    // Content must survive byte-exactly: the oracle aggregates the original
    // table. SourcesSpec asserts the before/after file counts.
    "sink_compact" -> ((s, d) => {
      val small = tmp(d, "small"); val compact = tmp(d, "compact")
      Tables.orders(s, d).repartition(64)
        .write.mode("overwrite").parquet(small)
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(small)).getLength
      val target = 8L << 20 // 8 MB test-scale stand-in for the 128 MB default
      val nFiles = math.max(1, math.ceil(bytes.toDouble / target).toInt)
      s.read.parquet(small)
        .repartitionByRange(nFiles, col("o_orderkey"))
        .write.mode("overwrite").parquet(compact)
      s.read.parquet(compact)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), graft.ops.Det.moneySum(col("o_totalprice")).as("sum_cents"))
        .orderBy(col("o_orderstatus"))
    }),

    // Sorted store layout: range-repartition + sort within partitions by the
    // dominant filter column before writing. Parquet records per-row-group
    // min/max stats; with disjoint per-file key ranges a date-bounded read
    // skips whole files/row groups instead of scanning them — the poor
    // man's clustering index every big store needs. SourcesSpec asserts the
    // per-file ranges are actually disjoint; the oracle checks the bounded
    // read returns exactly the right rows.
    "sink_sorted" -> ((s, d) => {
      val path = tmp(d, "sorted")
      Tables.orders(s, d)
        .repartitionByRange(4, col("o_orderdate"))
        .sortWithinPartitions(col("o_orderdate"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .where(col("o_orderdate") >= to_timestamp(lit("1997-06-01")) &&
               col("o_orderdate") <  to_timestamp(lit("1997-09-01")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), graft.ops.Det.moneySum(col("o_totalprice")).as("sum_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // XML round-trip (Spark 4 native "xml" source — the remaining feed
    // format of the family: CSV/JSON/ORC/text/binary/JDBC/XML). Doubles
    // survive because the writer emits Java's shortest-round-trip
    // rendering; schema is DECLARED on re-ingest like every other format.
    "src_xml" -> ((s, d) => {
      val path = tmp(d, "xml")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.mode("overwrite").option("rowTag", "order").format("xml").save(path)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType)))
      s.read.schema(schema).option("rowTag", "order").format("xml").load(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("o_totalprice")).as("cents"))
        .orderBy(col("o_orderstatus"))
    }),

    // Dynamic partition overwrite: re-land ONE partition of the store (the
    // daily/yearly re-run every ETL eventually needs) without touching its
    // siblings. Static overwrite mode would wipe the whole root; dynamic
    // mode replaces exactly the partitions present in the incoming frame.
    // The oracle proves both halves of the contract: yr=1997 carries the
    // re-landed (halved) prices, every other year's aggregate is
    // byte-identical to the original load.
    "sink_part_overwrite" -> ((s, d) => {
      val path = tmp(d, "dynpart")
      val base = Tables.orders(s, d).withColumn("yr", year(col("o_orderdate")))
      base.write.mode("overwrite").partitionBy("yr").parquet(path)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.get(key)
      s.conf.set(key, "dynamic")
      try
        // halve in INTEGER cents (cents div 2, exact), then rebase to the
        // double column: o_totalprice / 2 directly would land odd cents on
        // exact .5 boundaries, betting the gate on two engines' double
        // tie-rounding agreeing (the D1 float rule this repo bans)
        base.where(col("yr") === 1997)
          .withColumn("o_totalprice",
            expr("cast(round(o_totalprice * 100) as bigint) div 2") / 100.0)
          .write.mode("overwrite").partitionBy("yr").parquet(path)
      finally s.conf.set(key, prev)
      s.read.parquet(path)
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("o_totalprice")).as("sum_cents"))
        .orderBy(col("yr"))
    }),

    // Executable JDBC round-trip against embedded Derby. Write side: a
    // slice of orders goes THROUGH Spark's distributed JDBC sink
    // (executor-side batched inserts, one connection per partition). Read
    // side: a PARTITIONED extract — partitionColumn/lowerBound/upperBound/
    // numPartitions generate one range-predicate query per partition, so
    // the pull from any RDBMS upstream parallelizes instead of serializing
    // through a single cursor. Oracle recomputes the same aggregate from
    // the parquet source: the DB round-trip must be lossless.
    // Predicate pushdown verdict (VERDICT r4 #7, asserted in SourcesSpec
    // "src_jdbc pushdown"): catalyst filters on this relation compile into
    // the JDBC-generated WHERE clause — the executed plan's scan node
    // carries them as `PushedFilters: [*EqualTo(...), ...]` (the `*` marks
    // DB-side evaluation), ANDed with each partition's range predicate, so
    // a selective extract ships only matching rows out of the RDBMS.
    "src_jdbc" -> ((s, d) => {
      System.setProperty("derby.stream.error.file", "target/tmp/derby.log")
      val dbDir = new java.io.File(tmp(d, "derby")).getAbsolutePath
      val url = s"jdbc:derby:$dbDir;create=true"
      val driver = "org.apache.derby.jdbc.EmbeddedDriver"
      val props = new java.util.Properties()
      props.setProperty("driver", driver)
      val slice = Tables.orders(s, d)
        .where(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
                col("o_totalprice"))
      // Default StringType→CLOB mapping would make the table un-filterable
      // DB-side (Derby rejects CLOB comparisons, so any pushed predicate on
      // the column throws at execution) — declare a comparable VARCHAR.
      slice.repartition(4)
        .write.mode("overwrite")
        .option("createTableColumnTypes", "o_orderstatus VARCHAR(4)")
        .jdbc(url, "ORDERS_SLICE", props)
      // Bounds derive from the SLICE's actual key range (one tiny
      // aggregate): hard-coded bounds mis-sized vs the real domain collapse
      // the extract into one stride — a serial read wearing a
      // numPartitions=4 costume.
      val b = slice.agg(min(col("o_orderkey")), max(col("o_orderkey"))).collect()(0)
      require(!b.isNullAt(0), "src_jdbc: empty orders slice — no key bounds")
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      s.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "ORDERS_SLICE")
        .option("driver", driver)
        .option("partitionColumn", "o_orderkey")
        .option("lowerBound", lo.toString).option("upperBound", (hi + 1).toString)
        .option("numPartitions", "4")
        .load()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("o_totalprice")).as("cents"))
        .orderBy(col("o_orderstatus"))
    }),

    // CSV + JSON export of the same slice must agree with each other.
    "sink_csv_json" -> ((s, d) => {
      val slice = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
      val csvP = tmp(d, "expcsv"); val jsonP = tmp(d, "expjson")
      slice.write.mode("overwrite").option("header", true).csv(csvP)
      slice.write.mode("overwrite").json(jsonP)
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("l_returnflag", StringType), StructField("l_quantity", DoubleType)))
      val back = s.read.schema(schema).option("header", true).csv(csvP)
        .unionByName(s.read.schema(schema).json(jsonP))
      back.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n2x"), sum(col("l_quantity")).as("qty2x"))
        .orderBy(col("l_returnflag"))
    }),

    // Raw line-oriented text ingest (spark.read.text): the entry format for
    // uncurated corpora (one document per line here). Round-trip must be
    // line-exact: the re-ingested line count and per-line lengths reconcile
    // against the curated table. Newlines inside documents would break the
    // line contract — absent in this corpus (verified by count equality).
    "src_text" -> ((s, d) => {
      val path = tmp(d, "text")
      Tables.documents(s, d).select(col("text"))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .groupBy(length(col("value")).as("line_len"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("line_len"))
    }),

    // Whole-file binary ingest (format "binaryFile"): the multimodal entry
    // point — each file arrives as (path, length, content) with NO parsing,
    // the layout q_multimodal_feat/q_multimodal_frames then decode from. A
    // deterministic subset of docs is exported as one .bin per doc (file
    // NAME carries the id); sizes reconcile against the table.
    "src_binary" -> ((s, d) => {
      val dir = tmp(d, "bin")
      val docs = Tables.documents(s, d)
        .where(col("doc_id") < 24)
        .select(col("doc_id"), col("text")).collect()
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val base = new org.apache.hadoop.fs.Path(dir)
      fs.delete(base, true); fs.mkdirs(base)
      docs.foreach { r =>
        val out = fs.create(new org.apache.hadoop.fs.Path(base, f"doc_${r.getLong(0)}%05d.bin"))
        out.write(r.getString(1).getBytes("UTF-8")); out.close()
      }
      s.read.format("binaryFile").load(dir)
        .select(
          expr("cast(regexp_extract(path, 'doc_([0-9]+)\\\\.bin', 1) as bigint)").as("doc_id"),
          col("length").as("n_bytes"),
          expr("cast(octet_length(content) as bigint)").as("content_bytes"))
        .orderBy(col("doc_id"))
    }),

    // Range-CLUSTERED layout write + zone-map audit — the file-skipping
    // story sink_sorted only gestures at: buckets come from EXACT NTILE-8
    // quantiles of the value (DistRank histogram rank — no global sort, no
    // RangePartitioner SAMPLING, whose boundaries are nondeterministic and
    // would break the oracle), the layout is written `partitionBy(bucket)`,
    // and the audit reads the zone map BACK FROM THE WRITTEN LAYOUT: per
    // bucket (n, min, max) plus the disjointness flag a scan planner needs
    // for "predicate touches exactly the overlapping zones" skipping. At
    // 100 TB this is the writer side of q_scan_pushdown: disjoint zones ×
    // min/max footer stats = bounded files per range predicate.
    "sink_range_cluster" -> ((s, d) => {
      val path = tmp(d, "range_cluster")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), graft.ops.Det.cents(col("o_totalprice")).as("c"))
      val ranked = graft.ops.DistRank.withGlobalRank(
        o, col("c"), col("o_orderkey"), 10000L, "r", "n")
      ranked
        .withColumn("bucket", graft.ops.DistRank.ntileFromRank("r", "n", 8))
        .select(col("o_orderkey"), col("c"), col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
      val zones = s.read.parquet(path)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("c")).as("min_c"), max(col("c")).as("max_c"))
      // 8-row aggregate — the single-partition window sits above it
      val wz = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      zones.withColumn("prev_max", lag(col("max_c"), 1).over(wz))
        .select(col("bucket"), col("n"), col("min_c"), col("max_c"),
                (col("prev_max").isNull || col("min_c") >= col("prev_max"))
                  .as("disjoint"))
        .orderBy(col("bucket"))
    }),

    // Snapshot-versioned store + time travel: two table versions live as
    // partitions of one store root (`v=1`, `v=2` — the poor man's Delta/
    // Iceberg snapshot layout in plain parquet), v2 being v1 with a
    // deterministic CDC batch applied (status flip on keys % 97, price
    // correction on keys % 101). The reader time-travels by partition
    // predicate — `WHERE v = 1` prunes to one snapshot's files
    // (sink_parquet_part's pruning, audited there) — and THIS query reads
    // both snapshots in one scan to diff them, which is exactly the
    // snapshot-compare an auditor runs. At 100 TB each version partition
    // holds only the rewritten files; unchanged data would be shared via
    // manifests — the read-side contract (version = partition predicate)
    // is what this demonstrates.
    "sink_snapshot" -> ((s, d) => {
      val base = tmp(d, "snapshot")
      val v1 = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      v1.write.mode("overwrite").parquet(s"$base/v=1")
      v1.withColumn("o_orderstatus",
          when(pmod(col("o_orderkey"), lit(97)) === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(101)) === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .write.mode("overwrite").parquet(s"$base/v=2")
      s.read.parquet(base)
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("o_orderstatus") === "X", 1L).otherwise(0L)).as("n_flipped"),
             graft.ops.Det.moneySum(col("o_totalprice")).as("sum_cents"))
        .orderBy(col("v"))
    }),

    // Custom DataSourceV2 connector (sources/RangeSource.scala — the
    // seventh custom-Catalyst kind): a keyed generator table with REAL
    // filter pushdown (id bounds tighten the planned partition range) and
    // column pruning. The id predicate here prunes 200k declared rows to
    // the 100k actually read; the tag inequality is NOT pushable and stays
    // a post-scan filter — both paths exercised in one query. DuckDB
    // re-derives every generated row from the closed forms.
    "src_dsv2" -> ((s, d) => {
      s.read.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "200000").load()
        .where(col("id") >= 50000 && col("id") < 150000 && col("tag") =!= "d")
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("val")).as("val_cents"))
        .orderBy(col("tag"))
    }),

    // Aggregate pushdown through the same connector
    // (SupportsPushDownAggregates, partial contract): COUNT(*)/MIN/MAX
    // over a filtered range compute CLOSED-FORM inside the source — one
    // pre-aggregated row per partition slice, Spark merges finals, row
    // data never materializes (RangeSourceSpec pins the plan). The JDBC/
    // warehouse pushdown shape, demonstrated on a connector we own.
    "src_dsv2_agg" -> ((s, d) => {
      s.read.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "200000").load()
        .where(col("id") >= 50000 && col("id") < 180000)
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
             max(col("id")).as("max_id"))
    }),

    // Dynamic partition pruning INTO the custom connector
    // (SupportsRuntimeFiltering — RangeSource's third pushdown contract):
    // the dim's selective filter is only evaluable at runtime, so Spark
    // plans a dynamicpruning In-subquery on the scan and hands the realized
    // key set to Scan.filter() just before execution; the source then plans
    // ONLY the slices those keys land in (RangeSourceSpec pins the 8→3
    // narrowing and the plan node). The oracle re-derives the rows from the
    // closed forms — DPP is a perf rewrite, never semantics.
    "src_dsv2_runtime" -> ((s, d) => {
      val src = s.read.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "200000").load()
      val dim = s.range(0, 200000, 25000)
        .select(col("id").as("dim_id"))
        .where(col("dim_id") % 3 === 0) // selective, runtime-only
      src.join(broadcast(dim), col("id") === col("dim_id"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("val")).as("val_cents"),
             min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    }),

    // Custom TableCatalog (sources/GraftCatalog.scala): the connector
    // family resolved by NAME through `graft.<table>` in pure SQL — the
    // query-service deployment surface. The catalog returns the same Table
    // instances the path-based API builds, so every pushdown contract rides
    // along: GraftCatalogSpec asserts the filter still narrows the scan
    // bounds and the storage-partitioned join still plans exchange-free
    // THROUGH the SQL/catalog path. Oracle re-derives from the closed forms.
    "src_catalog" -> ((s, d) => withGraftCatalog(s) {
      s.sql("""SELECT tag, COUNT(*) AS n,
              |  CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS BIGINT) AS val_cents
              |FROM graft.range_200k
              |WHERE id >= 100000 AND id < 160000
              |GROUP BY tag ORDER BY tag""".stripMargin)
    }),

    // V2 CATALOG FUNCTION beside the catalog tables (FunctionCatalog):
    // `graft.amt(id)` resolves through the same namespace as the tables —
    // the warehouse's canonical derivations shipped WITH the store, no
    // session UDF registration. The ScalarFunction's static magic method
    // rides whole-stage codegen (GraftCatalogSpec pins resolution, arity
    // rejection, and equality with the closed form).
    "q_catalog_fn" -> ((s, d) => withGraftCatalog(s) {
      s.sql("""SELECT tag, COUNT(*) AS n,
              |  CAST(SUM(graft.amt(id)) AS BIGINT) AS amt_sum
              |FROM graft.range_200k
              |WHERE id < 50000
              |GROUP BY tag ORDER BY tag""".stripMargin)
    }),

    // V2 PREDICATE pushdown (SupportsPushDownV2Filters — the successor
    // predicate API, the FIFTEENTH custom-protocol kind): grp equality/IN
    // conjuncts prune bucket planning EXACTLY (bucket b holds only
    // grp='g'+b), so the conjunct is CONSUMED — the Filter operator
    // disappears from the executed plan, not just the I/O; a value outside
    // the bucket domain plans ZERO partitions. Flags pin all three; the
    // partitioning report shrinks with the plan (KeyGroupedPartitioning
    // must match planned partitions exactly).
    "src_dsv2_v2filter" -> ((s, d) => withGraftCatalog(s) {
      graft.sources.BucketSource.lastBucketPlan = None
      val df = s.sql("""SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS amt_sum
                       |FROM graft.bucket_fact WHERE grp IN ('g2', 'g5')
                       |GROUP BY grp""".stripMargin)
      val content = df.collect()
      val pruned = graft.sources.BucketSource.lastBucketPlan.contains((8, 2))
      val filterGone = !df.queryExecution.executedPlan.toString.contains("Filter (")
      graft.sources.BucketSource.lastBucketPlan = None
      val emptyCount = s.sql(
        "SELECT COUNT(*) FROM graft.bucket_fact WHERE grp = 'zzz'")
        .collect()(0).getLong(0)
      val emptyDomain = emptyCount == 0L &&
        graft.sources.BucketSource.lastBucketPlan.contains((8, 0))
      def flag(n: String, b: Boolean) =
        org.apache.spark.sql.Row(n, if (b) 1L else 0L, 0L)
      val rows = content.toSeq ++ Seq(
        flag("z_empty_domain_zero_parts", emptyDomain),
        flag("z_filter_gone", filterGone),
        flag("z_pruned_2_of_8", pruned))
      val schema = StructType(Seq(
        StructField("grp", StringType), StructField("n", LongType),
        StructField("amt_sum", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
    }),

    // V2 AGGREGATE FUNCTION through the catalog (AggregateFunction — the
    // FOURTEENTH custom-protocol kind, completing the FunctionCatalog
    // surface beside the scalar graft.amt): `graft.checksum(x)` is an
    // order-independent content checksum (sum of Lehmer-hashed values)
    // that Spark plans with PARTIAL aggregation — update map-side, merge
    // at the exchange — so it combines before the shuffle like any
    // built-in. The operational use is pinned, not just the arithmetic:
    // the checksum is INVARIANT under store compaction (a content-
    // preserving rewrite validated in one aggregate pass — how a
    // production migration checks a rewrite without a row diff).
    "q_catalog_agg_fn" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "catagg")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      base.repartition(16, col("k"))
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      withStorePath(s, path) {
        val q = """SELECT grp, COUNT(*) AS n,
                  |  graft.checksum(amt_cents) AS cksum
                  |FROM graft.store GROUP BY grp""".stripMargin
        val pre = s.sql(q).collect()
        val total = base.count()
        s.sql(s"CALL graft.compact('$path', ${(total + 3) / 4})").collect()
        val post = s.sql(q).collect()
        def keyed(rs: Array[org.apache.spark.sql.Row]) =
          rs.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
        val stable = keyed(pre) == keyed(post)
        val rows = pre.toSeq ++ Seq(org.apache.spark.sql.Row(
          "z_stable_under_compact", if (stable) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("cksum", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // NAMESPACE DDL through the catalog (SupportsNamespaces — the
    // THIRTEENTH custom-protocol kind): CREATE NAMESPACE / namespaced CTAS
    // / SHOW NAMESPACES / SHOW TABLES IN ns / DESC NAMESPACE properties /
    // DROP NAMESPACE, the warehouse layer between one flat table dir and a
    // metastore. A namespace is a `_namespace`-marked directory under the
    // CTAS root; tables inside are ordinary graft stores, so every
    // write/commit contract is untouched — the namespace is pure
    // resolution. Flags pin: listing sees exactly the created namespace,
    // its table listing, property round-trip through ALTER NAMESPACE,
    // RESTRICT refusing to drop a non-empty namespace, and the final drop.
    "q_catalog_ns" -> ((s, d) => withGraftCatalog(s) {
      val dir = tmp(d, "catns")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(dir), true)
      val key = GraftCatalog.CtasDirKey
      val prev = s.conf.getOption(key)
      s.conf.set(key, dir)
      try {
        s.sql("CREATE NAMESPACE graft.raw")
        s.sql("ALTER NAMESPACE graft.raw SET DBPROPERTIES ('team'='etl')")
        Tables.orders(s, d).createOrReplaceTempView("ord_ns_v")
        s.sql("""CREATE TABLE graft.raw.big AS
                |SELECT o_orderkey AS k, o_orderstatus AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
                |FROM ord_ns_v WHERE o_totalprice > 100000""".stripMargin)
        val agg = s.table("graft.raw.big").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        val nsListed = s.sql("SHOW NAMESPACES IN graft")
          .collect().map(_.getString(0)).toSeq == Seq("raw")
        val tblListed = s.sql("SHOW TABLES IN graft.raw")
          .collect().map(_.getString(1)).toSeq == Seq("big")
        val propKept = s.sql("DESC NAMESPACE EXTENDED graft.raw")
          .collect().exists(r => r.getString(1).contains("team") &&
            r.getString(1).contains("etl"))
        val dropNonEmptyLoud =
          try { s.sql("DROP NAMESPACE graft.raw"); false }
          catch { case _: Exception => true }
        s.sql("DROP TABLE graft.raw.big")
        s.sql("DROP NAMESPACE graft.raw")
        val gone = s.sql("SHOW NAMESPACES IN graft").count() == 0L
        def flag(n: String, b: Boolean) =
          org.apache.spark.sql.Row(n, if (b) 1L else 0L, 0L)
        val rows = agg.toSeq ++ Seq(
          flag("z_drop_nonempty_loud", dropNonEmptyLoud),
          flag("z_dropped", gone),
          flag("z_ns_listed", nsListed),
          flag("z_prop_kept", propKept),
          flag("z_tbl_listed", tblListed))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      } finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None    => s.conf.unset(key)
      }
    }),

    // STORAGE-PARTITIONED JOIN through the connector's reported layout
    // (sources/BucketSource.scala — SupportsReportPartitioning +
    // HasPartitionKey): both sides declare KeyGroupedPartitioning on grp,
    // so the fact⋈dim join plans with ZERO shuffle exchange on either side
    // (BucketSourceSpec pins the exchange-free subplan and the default-off
    // contrast). Conf-scoped (v2 bucketing + no size-based broadcast, the
    // state where both sides outgrow broadcast) and materialized inside the
    // scope (the q_runtime_filter rule). The DSv2 analogue of
    // q_join_bucketed: at 100 TB this deletes both full-table shuffles from
    // every join that shares the store's partitioning.
    "q_join_spj" -> ((s, d) => {
      val confs = Map(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        val res = spjJoin(s)
        s.createDataFrame(java.util.Arrays.asList(res.collect(): _*), res.schema)
      } finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    }),

    // Snapshot RETENTION (the GC half of sink_snapshot's time travel):
    // four versioned snapshots land under one root, the retention policy
    // (keep newest 2) physically deletes the expired version partitions,
    // and the audit is one read of what SURVIVED — the vacuum/expire-
    // snapshots operation every versioned store needs, as an
    // oracle-checked query (survivors + their exact contents) rather than
    // prose. Deletion is directory-granular because version IS the
    // partition key — at 100 TB, retention is O(manifests), never a data
    // rewrite; that layout choice is what this op pins.
    // DSv2 WRITE path round-trip (sources/StoreSink.scala — the custom
    // connector's transactional staging/manifest commit protocol): an
    // orders slice lands in the graft-store through TWO commits — an
    // OVERWRITE of even keys (truncate manifest swap), then an APPEND of
    // odd keys (manifest union) — and is read back through manifest-planned
    // scans and re-aggregated. The oracle recomputes from the parquet
    // source, so a lost, duplicated, or partially-visible file breaks the
    // hash; StoreSinkSpec pins the abort/atomicity/stray-file semantics the
    // happy path can't show.
    "sink_dsv2" -> ((s, d) => {
      val path = tmp(d, "dsv2store")
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
        graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      base.where(col("k") % 2 === 0)
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      base.where(col("k") % 2 === 1)
        .write.format("graft.sources.StoreSink").mode("append")
        .option("path", path).save()
      s.read.format("graft.sources.StoreSink").option("path", path).load()
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        .orderBy(col("grp"))
    }),

    // LIMIT pushdown through the connector (SupportsPushDownLimit): rows
    // generate in id order, so the first-7 of the filtered range live in
    // [50000, 50007) and the scan plans ONE slice of 7 rows — the planned
    // range shrinks from 150k rows to 7 (RangeSourceSpec pins the plan).
    // At 100 TB this is the `SELECT ... LIMIT n` preview every analyst
    // runs, costing n rows instead of a full scan.
    "src_dsv2_limit" -> ((s, d) => {
      s.read.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "200000").load()
        .where(col("id") >= 50000)
        .limit(7)
        .select(col("id"), col("tag"), graft.ops.Det.cents(col("val")).as("val_cents"))
        .orderBy(col("id"))
    }),

    // OFFSET pushdown (SupportsPushDownOffset — the pagination family's
    // third member beside LIMIT/TopN): page 2 of the filtered range plans
    // only [50010, 50017) — Spark pushes limit = offset+limit and the
    // offset separately, so the planned window is the page itself.
    "src_dsv2_offset" -> ((s, d) => {
      s.read.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "200000").load()
        .where(col("id") >= 50000)
        .offset(10).limit(7)
        .select(col("id"), col("tag"), graft.ops.Det.cents(col("val")).as("val_cents"))
        .orderBy(col("id"))
    }),

    // TABLESAMPLE pushdown (SupportsPushDownTableSample): once pushed,
    // Spark REMOVES its Sample operator (RangeSourceSpec pins the plan)
    // and the SOURCE owns the randomness — a pure 31-bit LCG of (id, seed)
    // serialized into the oracle as literals, so the oracle reproduces the
    // EXACT sampled row set, not just its size. The 10% sample of a
    // 500k-row filtered slice is decided row-by-row inside the reader with
    // no Spark-side sampling pass; at 100 TB this is how a sampling
    // EXPLAIN/profiling query avoids materializing the unsampled scan.
    // Composition guards keep the closed-form aggregate and pagination
    // pushdowns OFF a sampled scan, where their arithmetic would be wrong.
    "src_dsv2_sample" -> ((s, d) => {
      // sample FIRST: Spark pushes a Sample only when it sits directly
      // above the scan (an intervening Filter blocks the rewrite); the id
      // bounds then push beneath the sampled scan, which is equivalent for
      // a per-row deterministic keep-rule
      s.read.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "2000000").load()
        .sample(0.1, 42L)
        .where(col("id") >= 100000 && col("id") < 600000)
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("val")).as("val_cents"),
             min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .orderBy(col("tag"))
    }),

    // TopN pushdown (SupportsPushDownTopN, partial contract): ORDER BY id
    // DESC LIMIT 5 narrows the planned range to the closed-form SUFFIX
    // [149995, 150000); Spark re-sorts the 5 survivors (partitions read
    // unordered — claiming a full push would be wrong across slices).
    "src_dsv2_topn" -> ((s, d) => {
      s.read.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "200000").load()
        .where(col("id") < 150000)
        .orderBy(col("id").desc)
        .limit(5)
        .select(col("id"), col("tag"), graft.ops.Det.cents(col("val")).as("val_cents"))
    }),

    // Stats-driven broadcast over the connector (SupportsReportStatistics):
    // the scan reports POST-PUSHDOWN rows/bytes (2 000 × 24 B ≈ 48 KB ≪ the
    // 10 MB threshold), so the planner broadcasts the filtered range side
    // of this join with NO broadcast() hint — the CBO contract a catalog
    // table needs. The declared extent is 2M rows (~48 MB): without
    // pushdown-aware stats the same join would shuffle both sides.
    // RangeSourceSpec pins the BroadcastHashJoin and its flip at a smaller
    // threshold.
    "q_dsv2_stats_join" -> ((s, d) => {
      val r = s.read.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "2000000").load()
        .where(col("id") < 2000)
      Tables.lineitem(s, d)
        .join(r, col("l_orderkey") === col("id"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("l_extendedprice")).as("price_cents"),
             graft.ops.Det.moneySum(col("val")).as("val_cents"))
    }),

    // JOIN PUSHDOWN INTO THE SOURCE (SupportsPushDownJoin, the newest V2
    // pushdown surface, conf-gated by
    // spark.sql.optimizer.datasourceV2JoinPushdown): an id-equality INNER
    // join of two range scans collapses into ONE scan of the residual
    // ranges' intersection — the join operator, both exchanges, and a
    // whole second scan vanish (z_fused pins no Join node + the scan's
    // pushedJoin marker). This is the JDBC "run the join in the database"
    // contract answered closed-form; at 100 TB it is the difference
    // between shipping two tables to a shuffle and shipping the JOINED
    // result out of the source. Non-inner joins and non-id conditions
    // decline into ordinary Spark joins (spec-pinned). The conf is scoped
    // and the result materializes inside it (the conf-scoped-query rule).
    "q_join_pushdown" -> ((s, d) => {
      val key = "spark.sql.optimizer.datasourceV2JoinPushdown"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        val a = s.read.format("graft.sources.RangeSource")
          .option("start", "0").option("end", "60000").load()
        val b = s.read.format("graft.sources.RangeSource")
          .option("start", "30000").option("end", "90000").load()
        val j = a.join(b, a("id") === b("id"))
          .select(a("id").as("jid"), a("val").as("va"), b("tag").as("tb"))
        val res = j.agg(
          count(lit(1)).as("n"),
          min(col("jid")).as("min_id"), max(col("jid")).as("max_id"),
          sum(expr("cast(round(va * 100) as bigint)")).as("val_cents"),
          sum(when(col("tb") === "a", 1L).otherwise(0L)).as("n_tag_a"))
        val plan = res.queryExecution.executedPlan.toString
        // NB a bare "Join" substring test would match the scan's OWN
        // pushedJoin marker — test for actual join EXEC node names
        val joinExec = Seq("SortMergeJoin", "BroadcastHashJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
        val fused = !joinExec.exists(plan.contains) &&
          plan.contains("pushedJoin=id-intersect")
        val out = res.withColumn("z_fused", lit(if (fused) 1L else 0L))
        s.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
      } finally prev match {
        case Some(p) => s.conf.set(key, p); case None => s.conf.unset(key)
      }
    }),

    // ROW-LEVEL DELETE through the connector (SupportsDelete, resolved by
    // name through the catalog): the store seeds from orders, `DELETE FROM
    // graft.store WHERE grp = 'F' OR k < 1000` rewrites only the files
    // containing matches (copy-on-write at file granularity) and swaps the
    // manifest; the read-back aggregate must equal the source minus exactly
    // the deleted predicate — the GDPR/retention delete every keyed store
    // needs. StoreSinkSpec pins abort-atomicity and the untouched-file
    // carry-over the happy path can't show.
    "q_store_delete" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storedel")
      seedStore(s, d, path)
      withStorePath(s, path) {
        s.sql("DELETE FROM graft.store WHERE grp = 'F' OR k < 1000")
        storeSummary(s, path)
      }
    }),

    // MERGE-ON-READ delete: a selective delete (~1% of keys, an In-list —
    // the CDC/GDPR shape) must cost O(matched) metadata, not O(table)
    // bytes: every data file stays byte-identical on disk and the matched
    // rows are masked by per-file deletion-vector sidecars; the reader
    // applies the mask, live row counts track it (COUNT pushdown stays
    // exact), and a later BULK delete (grp='F', ~49% per file — above the
    // 20% threshold) rewrites copy-on-write and ABSORBS the vectors. Both
    // states and both strategy flags share one oracle. At 100 TB this is
    // Iceberg/Delta's position-delete path: deleting one row of a
    // petabyte table writes kilobytes.
    "q_store_delete_mor" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storemor")
      val (base, _) = seedStore(s, d, path)
      val root = new org.apache.hadoop.fs.Path(path)
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      def dataFiles() = fsys.listStatus(root).map(_.getPath.getName)
        .filter(n => n.startsWith("part-") && !n.contains(".dv-")).toSet
      val filesBefore = dataFiles()
      // bounded CDC key list (~1% of keys) — the scalar-election pattern
      val keys = base.where(pmod(col("k"), lit(101)) === 0)
        .select(col("k")).collect().map(_.getLong(0))
      withStorePath(s, path) {
        def aggOf(v: String) = s.table("graft.store")
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .select(lit(v).as("v"), col("grp"), col("n"), col("sum_cents"))
          .collect()
        s.sql(s"DELETE FROM graft.store WHERE k IN (${keys.mkString(",")})")
        val noRewrite = dataFiles() == filesBefore
        val nDv = graft.sources.StoreSink.readEntries(root, fsys)
          .count(_.dv.isDefined)
        val morRows = aggOf("mor")
        s.sql("DELETE FROM graft.store WHERE grp = 'F'")
        val absorbed = graft.sources.StoreSink.readEntries(root, fsys)
          .forall(_.dv.isEmpty)
        val cowRows = aggOf("cow")
        val rows = morRows.toSeq ++ cowRows ++ Seq(
          org.apache.spark.sql.Row("z_absorbed", "-", if (absorbed) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_dv", "-", if (nDv >= 1) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_no_rewrite", "-", if (noRewrite) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("v", StringType), StructField("grp", StringType),
          StructField("n", LongType), StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("v"), col("grp"))
      }
    }),

    // EQUALITY DELETES — the second merge-on-read shape (Iceberg v2's
    // equality-delete files beside q_store_delete_mor's position
    // vectors): a keyed DELETE in `equality` mode attaches zone-matched
    // KEY sidecars in one manifest swap and never opens a data file —
    // zero data reads, zero data writes (z_eq_nodata pins all three:
    // ≥1 eq sidecar, no ordinal vector, data file set unchanged). The
    // reader masks by key; COUNT/MIN/MAX pushdown declines on
    // eq-vectored entries (rows is an upper bound), so z_count's
    // post-delete COUNT(*) is a real masked scan; compaction absorbs the
    // sidecars into clean files (z_absorbed) after which both agg rows
    // must agree bit-for-bit. This is the delete shape for writers that
    // cannot afford the read — streaming retractions, GDPR-by-key
    // against cold data.
    "q_store_delete_eq" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeeq")
      val (base, _) = seedStore(s, d, path)
      val root = new org.apache.hadoop.fs.Path(path)
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      def dataFiles() = fsys.listStatus(root).map(_.getPath.getName)
        .filter(n => n.startsWith("part-") && !n.contains(".dv-") &&
                     !n.contains(".eq-")).toSet
      val filesBefore = dataFiles()
      // bounded keyed-retraction list — the scalar-election pattern
      val keys = base.where(pmod(col("k"), lit(293)) === 0)
        .select(col("k")).collect().map(_.getLong(0))
      withStorePath(s, path) {
        def aggOf(v: String) = s.table("graft.store")
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .select(lit(v).as("v"), col("grp"), col("n"), col("sum_cents"))
          .collect()
        val modeKey = "spark.graft.store.delete.mode"
        s.conf.set(modeKey, "equality")
        try s.sql(s"DELETE FROM graft.store WHERE k IN (${keys.mkString(",")})")
        finally s.conf.unset(modeKey)
        val noDataIo = dataFiles() == filesBefore
        val entries = graft.sources.StoreSink.readEntries(root, fsys)
        val nEq = entries.count(_.eq.isDefined)
        val noDv = entries.forall(_.dv.isEmpty)
        val eqRows = aggOf("eq")
        val cntAfter = s.table("graft.store").count()
        graft.sources.StoreSink.compact(s, path, 10000L)
        val absorbed = graft.sources.StoreSink.readEntries(root, fsys)
          .forall(_.eq.isEmpty)
        val compRows = aggOf("compacted")
        val rows = eqRows.toSeq ++ compRows ++ Seq(
          org.apache.spark.sql.Row("z_absorbed", "-", if (absorbed) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_count", "-", cntAfter, 0L),
          org.apache.spark.sql.Row("z_eq_nodata", "-",
            if (nEq >= 1 && noDv && noDataIo) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("v", StringType), StructField("grp", StringType),
          StructField("n", LongType), StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("v"), col("grp"))
      }
    }),

    // MERGE through the connector's DELETE+APPEND primitives: CDC
    // upsert+delete executed as the copy-on-write pair — DELETE the touched
    // keys (updates ∪ hard deletes, an In-filter the connector compiles to
    // a hash set), then APPEND the new row versions and inserts through the
    // same staging/manifest commit. The final state must equal the
    // source-with-CDC-applied, which the oracle recomputes from orders —
    // q_cdc_merge proves MERGE semantics in DataFrame space; THIS op proves
    // the connector can execute them from primitives, and
    // q_store_merge_sql proves the single-statement MERGE INTO. The
    // touched-key list is the CDC batch (bounded, ~2% of keys) —
    // collecting it is the driver-side scalar-election pattern, never
    // data-sized.
    "q_store_merge" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storemerge")
      val (base, maxK) = seedStore(s, d, path)
      val (dels, upds, ins) = storeCdc(base, maxK)
      val touched = dels.select(col("k"))
        .unionAll(upds.select(col("k")))
        .collect().map(_.getLong(0))
      withStorePath(s, path) {
        s.sql(s"DELETE FROM graft.store WHERE k IN (${touched.mkString(",")})")
        upds.unionByName(ins)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
        storeSummary(s, path)
      }
    }),

    // The SAME CDC batch as ONE `MERGE INTO` statement, executed by the
    // connector's row-level protocol (SupportsRowLevelOperations,
    // group-based): Spark rewrites the MERGE into a ReplaceData plan —
    // target read through the operation's scan, per-clause DELETE/UPDATE/
    // INSERT logic applied relationally, the replacement generation
    // committed by swapping exactly the scanned group set in the manifest.
    // Same oracle as q_store_merge: the two execution strategies
    // (primitive composition vs native MERGE) must agree bit for bit.
    // NB the ReplaceData write rows carry a leading __row_operation column
    // the LogicalWriteInfo schema does not mention (StoreSink.encode).
    "q_store_merge_sql" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storemergesql")
      val (base, maxK) = seedStore(s, d, path)
      val (dels, upds, ins) = storeCdc(base, maxK)
      val v = s"store_cdc_${java.lang.Integer.toHexString(d.hashCode)}"
      upds.select(lit("U").as("op"), col("k"), col("grp"), col("amt_cents"))
        .unionByName(dels.select(lit("D").as("op"), col("k"),
          lit(null).cast("string").as("grp"), lit(0L).as("amt_cents")))
        .unionByName(ins.select(lit("I").as("op"), col("k"), col("grp"), col("amt_cents")))
        .createOrReplaceTempView(v)
      try withStorePath(s, path) {
        s.sql(s"""MERGE INTO graft.store t USING $v s ON t.k = s.k
                 |WHEN MATCHED AND s.op = 'D' THEN DELETE
                 |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET grp = s.grp, amt_cents = s.amt_cents
                 |WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (k, grp, amt_cents) VALUES (s.k, s.grp, s.amt_cents)""".stripMargin)
        storeSummary(s, path)
      } finally s.catalog.dropTempView(v)
    }),

    // STREAMING CDC APPLY — the lakehouse upsert relay: a keyed change
    // stream lands in the store through foreachBatch + native MERGE INTO
    // (the Delta/Iceberg "apply changes" shape). Each micro-batch is one
    // atomic versioned MERGE commit; last-writer-wins per key falls out
    // of batch ORDER (wave 2's MERGE sees wave 1's state), which is the
    // closed form the oracle states. Exactly-once here rests on the
    // MERGE being IDEMPOTENT (values are functions of the key, so a
    // replayed batch re-asserts the same rows) — the append path's epoch
    // ledger does not apply to row-level commits, and a real pipeline
    // carrying non-idempotent changes would dedup on a change id first.
    // No streaming state anywhere: the stream side only batches rows;
    // all heavy lifting is the MERGE's group-filtered file-granular COW,
    // so zone maps keep each wave's rewrite to the touched files. The
    // z_incremental row pins ≥ 2 separate MERGE commits (never one
    // rescan). The batch session is the stream's CLONE: catalog + store
    // path confs are set before start() so the clone inherits both.
    "s_store_upsert" -> ((s, d) => withGraftCatalog(s) {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val path = tmp(d, "storeupsert")
      val chk = tmp(d, "storeupsert_chk")
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(chk), true)
      val (base, maxK) = seedStore(s, d, path)
      val w1 = base.where(pmod(col("k"), lit(4)) === 0)
        .select(col("k"), lit("W1").as("grp"),
                (col("k") * 3 + 1).as("amt_cents"))
        .unionByName(base.where(pmod(col("k"), lit(101)) === 0)
          .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                  (col("k") * 7).as("amt_cents")))
        .as[(Long, String, Long)].collect().toSeq
      val w2 = base.where(pmod(col("k"), lit(6)) === 0)
        .select(col("k"), lit("W2").as("grp"),
                (col("k") * 5 + 2).as("amt_cents"))
        .as[(Long, String, Long)].collect().toSeq
      @volatile var nBatches = 0
      withStorePath(s, path) {
        val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
        val q = mem.toDS().toDF("k", "grp", "amt_cents").writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.createOrReplaceTempView("graft_upsert_batch")
            b.sparkSession.sql(
              """MERGE INTO graft.store t USING graft_upsert_batch s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET grp = s.grp, amt_cents = s.amt_cents
                |WHEN NOT MATCHED THEN INSERT (k, grp, amt_cents)
                |  VALUES (s.k, s.grp, s.amt_cents)""".stripMargin)
            nBatches += 1
          }
          .option("checkpointLocation", chk)
          .start()
        try {
          mem.addData(w1); q.processAllAvailable()
          mem.addData(w2); q.processAllAvailable() // arrives mid-stream
        } finally q.stop()
        val agg = storeSummary(s, path)
        import scala.jdk.CollectionConverters._
        val rows = agg.collect().toSeq :+ org.apache.spark.sql.Row(
          "z_incremental", if (nBatches >= 2) 1L else 0L, 0L)
        s.createDataFrame(rows.asJava, agg.schema).orderBy(col("grp"))
      }
    }),

    // s_store_upsert's MERGE-ON-READ twin: the same two-wave streaming CDC
    // apply with the delta protocol scoped on (the conf is set BEFORE
    // start() so the foreachBatch clone inherits it) — every micro-batch
    // commit is equality masks + appended files, ZERO data files read back
    // or rewritten across the whole run (the z_no_rewrite flag pins every
    // seed file surviving by name with at least one mask attached).
    // Last-writer-wins still falls out of batch order: wave 2's masks
    // apply to wave 1's appended file because it is pre-existing by then.
    // At 100 TB this is the shape that makes streaming CDC into a big
    // table affordable — per-batch cost is changed ROWS, not changed
    // files; compaction absorbs the masks on its own schedule.
    "s_store_upsert_delta" -> ((s, d) => withGraftCatalog(s) {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val path = tmp(d, "storeupsertd")
      val chk = tmp(d, "storeupsertd_chk")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(chk), true)
      val (base, maxK) = seedStore(s, d, path)
      val root = new org.apache.hadoop.fs.Path(path)
      val seedNames = graft.sources.StoreSink.readEntries(root, fsys).map(_.name)
      val w1 = base.where(pmod(col("k"), lit(4)) === 0)
        .select(col("k"), lit("W1").as("grp"),
                (col("k") * 3 + 1).as("amt_cents"))
        .unionByName(base.where(pmod(col("k"), lit(101)) === 0)
          .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                  (col("k") * 7).as("amt_cents")))
        .as[(Long, String, Long)].collect().toSeq
      val w2 = base.where(pmod(col("k"), lit(6)) === 0)
        .select(col("k"), lit("W2").as("grp"),
                (col("k") * 5 + 2).as("amt_cents"))
        .as[(Long, String, Long)].collect().toSeq
      val key = "spark.graft.store.rowlevel.mode"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "delta")
      try withStorePath(s, path) {
        val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
        val q = mem.toDS().toDF("k", "grp", "amt_cents").writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.createOrReplaceTempView("graft_upsertd_batch")
            b.sparkSession.sql(
              """MERGE INTO graft.store t USING graft_upsertd_batch s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET grp = s.grp, amt_cents = s.amt_cents
                |WHEN NOT MATCHED THEN INSERT (k, grp, amt_cents)
                |  VALUES (s.k, s.grp, s.amt_cents)""".stripMargin)
            ()
          }
          .option("checkpointLocation", chk)
          .start()
        try {
          mem.addData(w1); q.processAllAvailable()
          mem.addData(w2); q.processAllAvailable()
        } finally q.stop()
        val entries = graft.sources.StoreSink.readEntries(root, fsys)
        val noRewrite = seedNames.forall(entries.map(_.name).contains) &&
          entries.exists(_.eq.isDefined)
        val agg = storeSummary(s, path)
        import scala.jdk.CollectionConverters._
        val rows = agg.collect().toSeq :+ org.apache.spark.sql.Row(
          "z_no_rewrite", if (noRewrite) 1L else 0L, 0L)
        s.createDataFrame(rows.asJava, agg.schema).orderBy(col("grp"))
      } finally prev match {
        case Some(p) => s.conf.set(key, p); case None => s.conf.unset(key)
      }
    }),

    // The SAME CDC batch a THIRD way: native MERGE INTO through the
    // SupportsDelta protocol (scoped conf `rowlevel.mode=delta`) — Spark
    // plans a WriteDelta instead of ReplaceData, handing the writer
    // per-row delete/update/insert verbs keyed by the declared row id
    // (k). Deleted/updated ids land as EQUALITY-DELETE sidecars on the
    // zone-matched pre-existing files; updated/inserted rows append as
    // new files; ZERO data files are read back or rewritten (spec-pinned)
    // — merge-on-read MERGE, the Iceberg v2 delta-write path. Shares
    // q_store_merge's oracle: the primitive composition, the group-based
    // COW MERGE, and the delta MERGE must agree bit for bit. NB the delta
    // conf also declares k NOT NULL (Spark refuses nullable row ids —
    // identifier-field semantics).
    "q_store_merge_delta" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storemergedelta")
      val (base, maxK) = seedStore(s, d, path)
      val (dels, upds, ins) = storeCdc(base, maxK)
      val v = s"store_cdc_delta_${java.lang.Integer.toHexString(d.hashCode)}"
      upds.select(lit("U").as("op"), col("k"), col("grp"), col("amt_cents"))
        .unionByName(dels.select(lit("D").as("op"), col("k"),
          lit(null).cast("string").as("grp"), lit(0L).as("amt_cents")))
        .unionByName(ins.select(lit("I").as("op"), col("k"), col("grp"), col("amt_cents")))
        .createOrReplaceTempView(v)
      val key = "spark.graft.store.rowlevel.mode"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "delta")
      try withStorePath(s, path) {
        s.sql(s"""MERGE INTO graft.store t USING $v s ON t.k = s.k
                 |WHEN MATCHED AND s.op = 'D' THEN DELETE
                 |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET grp = s.grp, amt_cents = s.amt_cents
                 |WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (k, grp, amt_cents) VALUES (s.k, s.grp, s.amt_cents)""".stripMargin)
        storeSummary(s, path)
      } finally {
        prev match { case Some(p) => s.conf.set(key, p); case None => s.conf.unset(key) }
        s.catalog.dropTempView(v)
      }
    }),

    // DELETE through the delta protocol: a predicate SupportsDelete cannot
    // translate (amt_cents % 2 = 1 — no source Filter exists for modulo)
    // falls through to the row-level rewrite, and under the scoped delta
    // conf that plans a WriteDelta whose per-row delete verbs become
    // equality masks — an arbitrary-predicate DELETE that reads the rows
    // ONCE and rewrites nothing (the flag pins every seed file surviving
    // by name). Group COW would rewrite every file holding an odd amount,
    // i.e. all of them.
    "q_store_delete_delta" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storedeldelta")
      seedStore(s, d, path)
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val root = new org.apache.hadoop.fs.Path(path)
      val seedNames = graft.sources.StoreSink.readEntries(root, fsys).map(_.name)
      val key = "spark.graft.store.rowlevel.mode"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "delta")
      try withStorePath(s, path) {
        s.sql("DELETE FROM graft.store WHERE amt_cents % 2 = 1")
        val entries = graft.sources.StoreSink.readEntries(root, fsys)
        val noRewrite = seedNames.forall(entries.map(_.name).contains) &&
          entries.exists(_.eq.isDefined)
        val agg = storeSummary(s, path)
        import scala.jdk.CollectionConverters._
        val rows = agg.collect().toSeq :+ org.apache.spark.sql.Row(
          "z_no_rewrite", if (noRewrite) 1L else 0L, 0L)
        s.createDataFrame(rows.asJava, agg.schema).orderBy(col("grp"))
      } finally prev match {
        case Some(p) => s.conf.set(key, p); case None => s.conf.unset(key)
      }
    }),

    // MIRROR-SYNC MERGE — the third MERGE clause family, `WHEN NOT
    // MATCHED BY SOURCE`: reconcile the store against a full desired
    // state in ONE statement (matched rows update, new rows insert,
    // target rows the source no longer carries DELETE — here gated so
    // 'P' rows are retained, the conditional form). This is the
    // warehouse mirror/backfill shape; group-wise the rewrite must scan
    // every target group (absence is a whole-table property — no runtime
    // group filter can narrow it), which is exactly what the oracle's
    // relational formulation states.
    "q_store_merge_sync" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storemergesync")
      val (base, maxK) = seedStore(s, d, path)
      val v = s"store_sync_${java.lang.Integer.toHexString(d.hashCode)}"
      // desired state: every k%3=0 row with a bumped amount, plus one new
      base.where(pmod(col("k"), lit(3)) === 0)
        .select(col("k"), col("grp"), (col("amt_cents") + 5).as("amt_cents"))
        .unionByName(s.range(1).select(lit(maxK + 7).as("k"),
          lit("NEW").as("grp"), lit(424242L).as("amt_cents")))
        .createOrReplaceTempView(v)
      try withStorePath(s, path) {
        s.sql(s"""MERGE INTO graft.store t USING $v s ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET amt_cents = s.amt_cents
                 |WHEN NOT MATCHED THEN INSERT (k, grp, amt_cents) VALUES (s.k, s.grp, s.amt_cents)
                 |WHEN NOT MATCHED BY SOURCE AND t.grp <> 'P' THEN DELETE""".stripMargin)
        storeSummary(s, path)
      } finally s.catalog.dropTempView(v)
    }),

    // ZONE-MAP READ through the connector: the manifest's per-file
    // (minK, maxK) stats prune FILE planning for a key-bounded read of the
    // range-clustered store — the parquet row-group-skipping shape on a
    // metadata layer we own (StoreSinkSpec pins the planned-file narrowing
    // and the DPP variant; this query pins the semantics at data scale).
    "q_store_zone_read" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storezone")
      seedStore(s, d, path)
      val res = s.read.format("graft.sources.StoreSink").option("path", path).load()
        .where(col("k").between(100, 999))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        .orderBy(col("grp"))
      s.createDataFrame(java.util.Arrays.asList(res.collect(): _*), res.schema)
    }),

    // OPTIMIZE/compaction as a transactional layout change: a fragmented,
    // hash-scattered 16-file generation (every file spans the whole key
    // range — zone maps can prune nothing) is rewritten by
    // StoreSink.compact into ~8 range-clustered files through the ordinary
    // overwrite commit — one atomic manifest swap, the fragmented
    // generation stays time-travelable, and the SAME key-range probe goes
    // from planning every file to planning the 1–2 files whose zones
    // overlap. Content is invariant (the post-compact agg and the
    // VERSION AS OF pre-compact agg share one oracle block); the flags pin
    // what compaction is FOR: fewer files, disjoint zones, restored
    // prunability. At 100 TB this is the periodic maintenance job that
    // keeps zone maps useful after many unclustered CDC appends; it
    // rewrites live bytes once and never blocks readers.
    "q_store_compact" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storecompact")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      base.repartition(16, col("k")) // hash scatter: overlapping zones
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      val root = new org.apache.hadoop.fs.Path(path)
      val bounds = base.agg(min(col("k")), max(col("k"))).collect()(0)
      val (loK, hiK) = (bounds.getLong(0), bounds.getLong(0) +
        (bounds.getLong(1) - bounds.getLong(0)) / 8)
      def plannedFor(probe: => Unit): Int = { probe; graft.sources.StoreSink.lastZonePrune.get._2 }
      def probeRange(): Unit =
        s.read.format("graft.sources.StoreSink").option("path", path).load()
          .where(col("k").between(loK, hiK)).agg(count(lit(1))).collect()
      val plannedBefore = plannedFor(probeRange())
      val filesBefore = graft.sources.StoreSink.lastZonePrune.get._1
      val total = base.count()
      graft.sources.StoreSink.compact(s, path, (total + 7) / 8)
      val plannedAfter = plannedFor(probeRange())
      val filesAfter = graft.sources.StoreSink.lastZonePrune.get._1
      val zones = graft.sources.StoreSink.readEntries(root, fsys)
        .flatMap(e => e.minK.zip(e.maxK)).sortBy(_._1)
      val disjoint = zones.zip(zones.drop(1)).forall { case ((_, a), (b, _)) => a < b }
      def aggOf(src: DataFrame, v: String) =
        src.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .select(lit(v).as("v"), col("grp"), col("n"), col("sum_cents"))
      val rows = withStorePath(s, path) {
        aggOf(s.table("graft.store"), "post").collect() ++
          aggOf(s.sql("SELECT * FROM graft.store VERSION AS OF 1"), "v1").collect()
      } ++ Seq(
          org.apache.spark.sql.Row("z_disjoint_zones", "-", if (disjoint) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_fewer_files", "-",
            if (filesAfter < filesBefore) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_prune_gain", "-",
            if (plannedAfter < plannedBefore && plannedAfter <= 2) 1L else 0L, 0L))
      val schema = StructType(Seq(
        StructField("v", StringType), StructField("grp", StringType),
        StructField("n", LongType), StructField("sum_cents", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.toSeq.asJava, schema).orderBy(col("v"), col("grp"))
    }),

    // TRIGGER-BASED COMPACTION POLICY (round-12 verdict #5 —
    // index_rebuild_if's posture for the table store): four full-range
    // appends leave every file spanning the whole key domain, so the
    // manifest's k-zone OVERLAP factor (Σ file widths / global width,
    // e4) reads ~4×10000 — `CALL graft.compact_if` sees it past the
    // 1.5× threshold and runs the compact rewrite; the second call
    // measures the healed layout (one file, overlap exactly 10000) and
    // KEEPS. Both decisions — inputs and actions — are exact manifest
    // arithmetic the oracle replays from the orders table's own key
    // bounds. At 100 TB this turns "when do we compact?" from a human
    // judgement into one manifest read on a schedule.
    "q_store_compact_policy" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storecompactif")
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k0"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      // k = 4·k0 + i: each append's zone spans the whole domain (maximal
      // overlap) while all keys stay distinct across the four appends
      (0 until 4).foreach { i =>
        base.select((col("k0") * 4 + i).as("k"), col("grp"), col("amt_cents"))
          .coalesce(1)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
      }
      val big = 1000L * 1000 * 1000 // one output bin at any test tier
      val r1 = s.sql(s"CALL graft.compact_if('$path', $big, 16, 15000)")
        .collect()(0)
      val r2 = s.sql(s"CALL graft.compact_if('$path', $big, 16, 15000)")
        .collect()(0)
      val total = s.read.format("graft.sources.StoreSink")
        .option("path", path).load().count()
      import s.implicits._
      Seq(
        ("c1", r1.getString(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)),
        ("c2", r2.getString(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)),
        ("rows", "-", total, 0L, 0L))
        .toDF("step", "action", "a", "b", "c")
        .orderBy(col("step"))
    }),

    // SNAPSHOT EXPORT (`CALL graft.export(path, dst, version)`) — the
    // interop escape hatch: one consistent pinned version materialized as
    // PLAIN PARQUET (no manifest, no sidecars — a downstream consumer
    // needs nothing but a parquet reader). The pre-delete version and the
    // head export independently; reading the exports back (as parquet!)
    // must reproduce each snapshot's content exactly, and the audit rows
    // pin row counts + effective version numbers. At 100 TB an export is
    // a full copy by design — the point is leaving the format.
    "q_store_export" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeexport")
      seedStore(s, d, path) // version 1
      withStorePath(s, path) {
        s.sql("DELETE FROM graft.store WHERE grp = 'F'") // v2 (current)
      }
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      val dst1 = tmp(d, "storeexport_v1")
      val dst2 = tmp(d, "storeexport_head")
      Seq(dst1, dst2).foreach(p =>
        fsys.delete(new org.apache.hadoop.fs.Path(p), true))
      val a1 = s.sql(s"CALL graft.export('$path', '$dst1', 1)").collect()(0)
      val a2 = s.sql(s"CALL graft.export('$path', '$dst2', 0)").collect()(0)
      def aggOf(p: String, tag: String): DataFrame =
        s.read.parquet(p).groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .select(lit(tag).as("step"), col("grp"), col("n"), col("sum_cents"))
      import s.implicits._
      aggOf(dst1, "v1").unionByName(aggOf(dst2, "head"))
        .unionByName(Seq(
          ("audit_v1", "-", a1.getLong(0), a1.getLong(1)),
          ("audit_head", "-", a2.getLong(0), a2.getLong(1)))
          .toDF("step", "grp", "n", "sum_cents"))
        .orderBy(col("step"), col("grp"))
    }),

    // METADATA COLUMNS (`_file`, `_pos` — SupportsMetadataColumns): row
    // provenance without the columns existing in the table schema (the
    // Iceberg/Delta contract). `_pos` is the PHYSICAL ordinal within the
    // file — the same ordinal space deletion vectors mask — so a
    // merge-on-read delete leaves survivors' positions UNTOUCHED: the
    // fixture deletes one interior row (picked BY its _pos, so the hole
    // is interior regardless of range-sampling boundaries) and pins
    // exactly ONE global position hole (z_holes), zero k-vs-_pos order
    // inversions in the k-sorted files (z_inversions), the 8-file
    // layout, and the surviving row count. At 100 TB _file/_pos are what
    // audits and positional-delete tooling join on.
    "q_store_meta_cols" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storemetacols")
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
        .repartitionByRange(8, col("k")).sortWithinPartitions(col("k"))
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      def t() = s.read.format("graft.sources.StoreSink")
        .option("path", path).load()
        .select(col("k"), col("_file"), col("_pos"))
      // victim BY POSITION: _pos 3 of the lexically-first file is interior
      // (positions 0..2 survive below it, the file tail above it)
      val victim = t().where(col("_pos") === 3)
        .orderBy(col("_file")).limit(1).collect()(0).getLong(0)
      withStorePath(s, path) {
        s.sql(s"DELETE FROM graft.store WHERE k = $victim")
      }
      val after = t().localCheckpoint() // bounded: 3 narrow columns
      val pf = after.groupBy(col("_file"))
        .agg(count(lit(1)).as("n"), min(col("_pos")).as("mn"),
             max(col("_pos")).as("mx"))
        .collect()
      val holes = pf.map(r => r.getLong(3) - r.getLong(2) + 1 - r.getLong(1)).sum
      val inv = after
        .withColumn("pk", lag(col("k"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("_file")).orderBy(col("_pos"))))
        .where(col("pk") > col("k")).count()
      import s.implicits._
      Seq(
        ("files", pf.length.toLong),
        ("rows", pf.map(_.getLong(1)).sum),
        ("z_holes", holes),
        ("z_inversions", inv))
        .toDF("step", "v").orderBy(col("step"))
    }),

    // CONSISTENCY CHECK (`CALL graft.fsck(path)`): the manifest's claims
    // verified against the files on disk — data files present, dv/eq
    // sidecars present and well-formed — WITHOUT reading data bytes, and
    // DETECTION-ONLY (damage counts in the audit row; an fsck that dies
    // on the problem it exists to find is useless). The fixture checks a
    // clean store (8 range-clustered files + one MoR deletion vector),
    // then deletes a data file OUT FROM UNDER the manifest and fsck
    // reports exactly one missing file. At 100 TB this is the nightly
    // integrity tick: one manifest read + one stat per file.
    "q_store_fsck" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storefsck")
      val (_, maxK) = seedStore(s, d, path) // v1: 8 range-clustered files
      withStorePath(s, path) {
        s.sql(s"DELETE FROM graft.store WHERE k = $maxK") // one dv sidecar
      }
      val total = s.read.format("graft.sources.StoreSink")
        .option("path", path).load().count()
      val r1 = s.sql(s"CALL graft.fsck('$path')").collect()(0)
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      val root = new org.apache.hadoop.fs.Path(path)
      val victim = graft.sources.StoreSink.readEntries(root, fsys)
        .filter(_.rows > 0).map(_.name).sorted.head
      fsys.delete(new org.apache.hadoop.fs.Path(root, victim), false)
      val r2 = s.sql(s"CALL graft.fsck('$path')").collect()(0)
      import s.implicits._
      Seq(
        ("clean", r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)),
        ("damaged", r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)),
        ("rows", total, 0L, 0L, 0L))
        .toDF("step", "entries", "missing", "sidecars", "bad")
        .orderBy(col("step"))
    }),

    // INCREMENTAL EXPORT (`CALL graft.export_delta(path, dst, from, to)`):
    // the CHANGE FEED between two pinned versions materialized as plain
    // parquet — the mirror-without-our-reader escape hatch. A downstream
    // system applies the ('insert'/'delete', row) delta as a MERGE and
    // stays in sync paying CHANGED bytes only (q_store_export pays the
    // full copy; this is its nightly-incremental twin). The 1→3 window
    // nets the update into its delete+insert pair; the 2→head window sees
    // only the delete; audit rows pin exact exported counts + the
    // resolved head version. At 100 TB the file diff bounds the scan to
    // files the window actually changed.
    "q_store_export_delta" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeexpdelta")
      seedStore(s, d, path) // v1: 8 range-clustered files
      withStorePath(s, path) {
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 7 " +
              "WHERE k BETWEEN 100 AND 999") // v2
        s.sql("DELETE FROM graft.store WHERE k < 50") // v3 (head)
      }
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      val dst1 = tmp(d, "storeexpdelta_13")
      val dst2 = tmp(d, "storeexpdelta_2h")
      Seq(dst1, dst2).foreach(p =>
        fsys.delete(new org.apache.hadoop.fs.Path(p), true))
      val a1 = s.sql(s"CALL graft.export_delta('$path', '$dst1', 1, 3)")
        .collect()(0)
      val a2 = s.sql(s"CALL graft.export_delta('$path', '$dst2', 2, 0)")
        .collect()(0) // to_v 0 = head, resolves to 3
      def aggOf(p: String, tag: String): DataFrame =
        s.read.parquet(p).groupBy(col("op"), col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .select(lit(tag).as("win"), col("op"), col("grp"), col("n"),
                  col("sum_cents"))
      import s.implicits._
      aggOf(dst1, "1..3").unionByName(aggOf(dst2, "2..3"))
        .unionByName(Seq(
          ("a1..3", "-", "-", a1.getLong(0), a1.getLong(2)),
          ("a2..3", "-", "-", a2.getLong(0), a2.getLong(2)))
          .toDF("win", "op", "grp", "n", "sum_cents"))
        .orderBy(col("win"), col("op"), col("grp"))
    }),

    // PROPERTY-DRIVEN AUTO-MAINTENANCE (`CALL graft.maintain(path)`): the
    // compact/expire/orphan thresholds live in the table's OWN
    // `graft.maintain.*` properties — a fleet scheduler loops over paths
    // with zero per-table arguments, the policy travels with the data
    // (the Iceberg table-option / Delta autoOptimize posture). First call
    // fires the compact trigger (4 fully-overlapping appends), runs the
    // retention and orphan sweeps inside their huge safety windows
    // (0 dropped — the audit PROVES they ran); second call reads the
    // compacted manifest as healthy and keeps everything. At 100 TB this
    // is the difference between "a human decides when to compact" and a
    // cron loop: every decision here is manifest-only until a trigger
    // actually fires.
    "q_store_maintain" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storemaintain")
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k0"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      (0 until 4).foreach { i =>
        base.select((col("k0") * 4 + i).as("k"), col("grp"), col("amt_cents"))
          .coalesce(1)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
      }
      // retention cutoffs in the REPLAYABLE explicit form (round-13
      // verdict #7): the absolute epoch-ms cutoff is part of the table
      // state, so every tick at this property state produces the same
      // audit row — cutoff 1 ≡ "keep everything" with a pinned witness
      // (the wall-clock .ms twins would re-derive now() per tick)
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store SET TBLPROPERTIES(" +
          "'graft.maintain.compact'='1000000000:16:15000'," +
          "'graft.maintain.keep.before'='1'," +
          "'graft.maintain.orphans.before'='1')")
      }
      def callRows(tag: String) =
        s.sql(s"CALL graft.maintain('$path')").collect().map { r =>
          (s"$tag:${r.getString(0)}", r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))
        }.toSeq
      val r1 = callRows("m1")
      val r2 = callRows("m2")
      val total = s.read.format("graft.sources.StoreSink")
        .option("path", path).load().count()
      import s.implicits._
      (r1 ++ r2 :+ (("rows", "-", total, 0L, 0L)))
        .toDF("step", "action", "a", "b", "c")
        .orderBy(col("step"))
    }),

    // ROW RETENTION under `CALL graft.maintain`: the
    // `graft.maintain.ttl` = '<col>:<min_keep>' property retires rows
    // below the cutoff through the ordinary row-level delete — the
    // data-retention leg of the policy loop (compact/expire/orphans
    // keep files healthy; ttl keeps the ROWS within policy). The cutoff
    // is explicit, not wall-clock (replayable audits; schedulers advance
    // the property). First tick drops exactly the sub-cutoff rows,
    // second tick is a no-op; surviving content is pinned by the
    // post-maintenance aggregate. At 100 TB this is GDPR/retention as a
    // property instead of a human-run DELETE.
    "q_store_maintain_ttl" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storemttl")
      seedStore(s, d, path)
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store SET TBLPROPERTIES(" +
          "'graft.maintain.ttl'='k:100')")
      }
      def ttlRow(tag: String) = {
        val r = s.sql(s"CALL graft.maintain('$path')").collect()
          .find(_.getString(0) == "ttl").get
        (s"$tag:ttl", r.getString(1), r.getLong(2), r.getLong(3))
      }
      val r1 = ttlRow("m1")
      val r2 = ttlRow("m2")
      val sums = s.read.format("graft.sources.StoreSink")
        .option("path", path).load()
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sc"))
        .collect()(0)
      import s.implicits._
      Seq(r1, r2,
        ("rows", "-", sums.getLong(0), 0L),
        ("sum_cents", "-", sums.getLong(1), 0L))
        .toDF("step", "action", "a", "b")
        .orderBy(col("step"))
    }),

    // OPTIMIZE ZORDER (Hilbert flavor) — 2-D clustering made observable by
    // the manifest's TWO zone columns: a hash-scattered generation prunes
    // nothing on either axis; `CALL graft.zorder` rewrites it clustered by
    // the Hilbert index over (k, amt_cents) scaled onto the order-8 grid
    // from the manifest's own global bounds, and afterwards a narrow range
    // probe on EITHER column plans at most half the files (each file covers
    // a compact 2-D region, so its k-span AND amt-span are fractions of the
    // domain — the Delta OPTIMIZE ZORDER / Iceberg hilbert sort-order
    // story, on the repo's own codegen HilbertKey kernel). Contrast
    // q_store_compact: range clustering makes the k probe plan 1-2 files
    // but leaves amt probes planning everything. Content is invariant (the
    // post-compact agg and the VERSION AS OF pre-compact agg share one
    // oracle block); at 100 TB this is the layout job that serves TWO
    // dominant predicate dimensions from one table without a second copy.
    "q_store_zorder" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storezorder")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      base.repartition(16, col("k")) // hash scatter: both axes unprunable
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      val b = base.agg(min(col("k")), max(col("k")),
        min(col("amt_cents")), max(col("amt_cents")), count(lit(1))).collect()(0)
      val (loK, hiK) = (b.getLong(0), b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 16)
      val (loA, hiA) = (b.getLong(2), b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 16)
      val total = b.getLong(4)
      def plannedFor(probe: => Unit): Int = { probe; graft.sources.StoreSink.lastZonePrune.get._2 }
      def probeK(): Unit =
        s.read.format("graft.sources.StoreSink").option("path", path).load()
          .where(col("k").between(loK, hiK)).agg(count(lit(1))).collect()
      def probeA(): Unit =
        s.read.format("graft.sources.StoreSink").option("path", path).load()
          .where(col("amt_cents").between(loA, hiA)).agg(count(lit(1))).collect()
      val plannedABefore = plannedFor(probeA())
      s.sql(s"CALL graft.zorder('$path', ${(total + 15) / 16})").collect()
      val plannedKAfter = plannedFor(probeK())
      val filesAfter = graft.sources.StoreSink.lastZonePrune.get._1
      val plannedAAfter = plannedFor(probeA())
      def aggOf(src: DataFrame, v: String) =
        src.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .select(lit(v).as("v"), col("grp"), col("n"), col("sum_cents"))
      val rows = withStorePath(s, path) {
        aggOf(s.table("graft.store"), "post").collect() ++
          aggOf(s.sql("SELECT * FROM graft.store VERSION AS OF 1"), "v1").collect()
      } ++ Seq(
          org.apache.spark.sql.Row("z_amt_prune_2d", "-",
            if (plannedAAfter * 2 <= filesAfter) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_amt_prune_gain", "-",
            if (plannedAAfter < plannedABefore) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_k_prune_2d", "-",
            if (plannedKAfter * 2 <= filesAfter) 1L else 0L, 0L))
      val schema = StructType(Seq(
        StructField("v", StringType), StructField("grp", StringType),
        StructField("n", LongType), StructField("sum_cents", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.toSeq.asJava, schema).orderBy(col("v"), col("grp"))
    }),

    // CHANGE DATA FEED reconstructed from version manifests: after an
    // UPDATE touching one key range (v2) and a metadata-path DELETE (v3),
    // StoreSink.changes(fromV, toV) diffs the two manifests' FILE sets,
    // reads only the files that differ, and nets out the rows a
    // copy-on-write rewrite carried over unchanged (exceptAll both ways) —
    // an update surfaces as its delete+insert pair, untouched rows never
    // appear, and the scan is bounded by changed bytes, not table size
    // (the flag pins that the v1→v2 rewrite replaced a strict subset of
    // files). Two windows prove version arithmetic: 1..current sees
    // update + delete, 2..3 sees only the delete. The oracle applies both
    // statements relationally and diffs the snapshots. */
    "q_store_cdf" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storecdf")
      seedStore(s, d, path) // v1: 8 range-clustered files
      withStorePath(s, path) {
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 7 " +
              "WHERE k BETWEEN 100 AND 999") // v2
        s.sql("DELETE FROM graft.store WHERE k < 50") // v3 (metadata path)
        val root = new org.apache.hadoop.fs.Path(path)
        val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        def names(v: Int) = graft.sources.StoreSink
          .readVersionLines(root, fsys, v).filterNot(_.startsWith("#"))
          .map(graft.sources.StoreSink.parseEntry(_).name)
        val replaced = names(1).diff(names(2)).size
        def aggOf(win: String, df: DataFrame) =
          df.groupBy(col("op"), col("grp"))
            .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
            .select(lit(win).as("win"), col("op"), col("grp"), col("n"), col("sum_cents"))
        val rows =
          aggOf("1..3", graft.sources.StoreSink.changes(s, path, 1)).collect() ++
          aggOf("2..3", graft.sources.StoreSink.changes(s, path, 2, Some(3))).collect() :+
          org.apache.spark.sql.Row("flag", "z_subset_rewrite", "-",
            if (replaced > 0 && replaced < names(1).size) 1L else 0L, 0L)
        val schema = StructType(Seq(
          StructField("win", StringType), StructField("op", StringType),
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.toSeq.asJava, schema)
          .orderBy(col("win"), col("op"), col("grp"))
      }
    }),

    // ROLLBACK as a forward commit (the Iceberg contract): restoring v1
    // after a bad delete publishes v1's CONTENT as a new version — undo
    // without history rewrite, so the bad generation stays
    // time-travelable for the postmortem while every current reader sees
    // the restored data. Metadata-only (content-addressed segments are
    // reused byte-for-byte); at 100 TB "undo the bad load" costs one
    // manifest swap, not a restore job.
    "q_store_rollback" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storerb")
      seedStore(s, d, path) // v1
      withStorePath(s, path) {
        s.sql("DELETE FROM graft.store WHERE grp = 'F'") // v2: the bad commit
        val rb = s.sql(s"CALL graft.rollback('$path', 1)").collect()(0)
        val rolled = rb.getLong(0) == 1L && rb.getLong(1) == 3L
        // the bad generation is still auditable; current state is v1's
        val v2F = s.sql("SELECT COUNT(*) AS n FROM graft.store VERSION AS OF 2 " +
            "WHERE grp = 'F'").collect()(0).getLong(0)
        val nVersions = graft.sources.StoreSink.history(path).size.toLong
        val agg = s.table("graft.store").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_bad_gen_kept",
            if (v2F == 0L && nVersions == 3L) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_rolled", if (rolled) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // CHERRY-PICK — rollback's selective-redo companion (the Iceberg
    // cherrypick_snapshot shape): a good load (v2) and a bad load (v3)
    // land, the day rolls back to v1, and `CALL graft.cherry_pick(2)`
    // re-applies JUST the good load's file delta onto head as a new
    // commit — metadata-only (the promoted files are reused, one list
    // swap), append-only enforced (a commit that removed lines refuses),
    // and re-picking the same commit conflicts loudly because its files
    // already sit at head. The oracle pins the final content = base + the
    // good load, bit for bit.
    "q_store_cherry" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storecherry")
      val (_, maxK) = seedStore(s, d, path) // v1
      withStorePath(s, path) {
        val fmtS = "graft.sources.StoreSink"
        s.range(1, 51).select((col("id") + maxK).as("k"), lit("A").as("grp"),
            (col("id") * 3).as("amt_cents"))
          .coalesce(1).write.format(fmtS).mode("append")
          .option("path", path).save() // v2: the good load
        s.range(1, 21).select((col("id") + maxK + 50).as("k"),
            lit("BAD").as("grp"), lit(-1L).as("amt_cents"))
          .coalesce(1).write.format(fmtS).mode("append")
          .option("path", path).save() // v3: the bad load
        s.sql(s"CALL graft.rollback('$path', 1)").collect() // v4 = v1
        val cp = s.sql(s"CALL graft.cherry_pick('$path', 2)").collect()(0)
        val picked = cp.getLong(0) == 1L && cp.getLong(1) == 5L
        val refused =
          try { s.sql(s"CALL graft.cherry_pick('$path', 2)").collect(); false }
          catch { case e: Throwable =>
            Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
              .exists(t => t.getMessage != null &&
                t.getMessage.contains("cherry-pick conflict")) }
        val agg = s.table("graft.store").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_picked", if (picked) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_repick_refused", if (refused) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // WRITE-AUDIT-PUBLISH branches (the Iceberg/Nessie WAP pattern): an
    // ingest job appends onto a BRANCH — its files commit to a side
    // manifest and stay INVISIBLE to main readers (visibility is manifest
    // membership, so isolation is free) — an audit reads the branch view
    // (main ∪ staged) and validates, then `CALL graft.publish` folds the
    // entries into main in one versioned metadata swap. A bad batch is
    // `CALL graft.abandon`-ed WITHOUT ever having been visible, and
    // vacuum GCs its orphaned files. At 100 TB this is how production
    // pipelines gate data quality: the audit runs against real committed
    // bytes, publish costs one manifest write, and rollback is "don't
    // publish".
    "q_store_wap" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storewap")
      val (base, maxK) = seedStore(s, d, path)
      withStorePath(s, path) {
        val fmtS = "graft.sources.StoreSink"
        // a bad batch staged on its own branch, then abandoned: never visible
        import s.implicits._
        Seq((maxK * 2 + 100, "BAD", -1L)).toDF("k", "grp", "amt_cents")
          .coalesce(1).write.format(fmtS).mode("append")
          .option("path", path).option("branch", "bad").save()
        val abandoned = s.sql(s"CALL graft.abandon('$path', 'bad')")
          .collect()(0).getLong(0)
        // the real ingest batch, staged on branch 'ingest'
        base.where(pmod(col("k"), lit(101)) === 0)
          .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                  (col("k") * 10).as("amt_cents"))
          .write.format(fmtS).mode("append")
          .option("path", path).option("branch", "ingest").save()
        val seedN = base.count()
        val stagedN = base.where(pmod(col("k"), lit(101)) === 0).count()
        // WRITE is invisible to main; AUDIT sees main ∪ staged and validates
        val invisible = s.table("graft.store").count() == seedN
        val branchView = s.read.format(fmtS).option("path", path)
          .option("branch", "ingest").load()
        val auditSees = branchView.count() == seedN + stagedN
        val auditClean = branchView.where(col("amt_cents") < 0).count() == 0
        s.sql(s"CALL graft.publish('$path', 'ingest')")
        // the abandoned batch's files GC with the next vacuum; afterwards
        // every on-disk data file is manifest-referenced
        graft.sources.StoreSink.vacuum(path, 999)
        val root = new org.apache.hadoop.fs.Path(path)
        val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        val gcClean = graft.sources.StoreSink.listDataFiles(root, fsys).toSet ==
          graft.sources.StoreSink.readEntries(root, fsys)
            .flatMap(e => e.name +: e.dv.toSeq).toSet
        val agg = s.table("graft.store").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_abandon_gc",
            if (abandoned == 1L && gcClean) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_audit",
            if (auditSees && auditClean) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_invisible", if (invisible) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // BRANCH READS BY NAME: `VERSION AS OF '<branch>'` resolves a live WAP
    // branch as its AUDIT view (main ∪ staged) through the same named-ref
    // namespace tags use — the validation job reads staged data in plain
    // SQL, no manual union, no connector options. The flags pin: main
    // stays untouched, vacuum treats the live branch as a reference root
    // (staged files survive), and after publish the name no longer
    // resolves (loud — refs never silently fall through to stale data).
    "q_store_wap_read" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storewapread")
      val (base, maxK) = seedStore(s, d, path) // v1
      withStorePath(s, path) {
        val fmtS = "graft.sources.StoreSink"
        base.where(pmod(col("k"), lit(101)) === 0)
          .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                  (col("k") * 10).as("amt_cents"))
          .write.format(fmtS).mode("append")
          .option("path", path).option("branch", "audit").save()
        val seedN = base.count()
        val stagedN = base.where(pmod(col("k"), lit(101)) === 0).count()
        val agg = s.sql("SELECT * FROM graft.store VERSION AS OF 'audit'")
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        val mainUntouched = s.table("graft.store").count() == seedN
        // vacuum with the branch LIVE: staged files are reference roots
        graft.sources.StoreSink.vacuum(path, 1)
        val vacuumPins = s.sql(
          "SELECT COUNT(*) AS c FROM graft.store VERSION AS OF 'audit'")
          .collect()(0).getLong(0) == seedN + stagedN
        s.sql(s"CALL graft.publish('$path', 'audit')")
        val goneLoud =
          try { s.sql("SELECT * FROM graft.store VERSION AS OF 'audit'")
                  .collect(); 0L }
          catch { case _: Exception => 1L }
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_gone_after_publish", goneLoud, 0L),
          org.apache.spark.sql.Row("z_main_untouched",
            if (mainUntouched) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_vacuum_pins",
            if (vacuumPins) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // INCREMENTAL VIEW MAINTENANCE over the change feed — what CDF is
    // FOR: a downstream aggregate (the materialized view) is advanced
    // from v1 to the current state by folding in the NET row deltas
    // (inserts add, deletes subtract; an update's delete+insert pair
    // nets to its measure change), then checked bit-for-bit against a
    // direct recompute. Cost of the refresh is changes()'s bounded
    // CHANGED-files read + a delta-sized aggregate — at 100 TB the MV
    // refresh never rescans the table, which is the entire economics of
    // maintaining downstream marts off a CDC-ing store.
    "q_store_ivm" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeivm")
      val (_, maxK) = seedStore(s, d, path) // v1
      withStorePath(s, path) {
        def aggOf(df: DataFrame) = df.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        // the materialized view at v1 (bounded: one row per grp)
        val mv0 = aggOf(s.table("graft.store")).localCheckpoint()
        // CDC against the store: delete, update, insert
        s.sql("DELETE FROM graft.store WHERE k % 89 = 0")
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 100 WHERE k % 97 = 0")
        s.sql(s"INSERT INTO graft.store VALUES (${maxK + 1}, 'NEW', 111), " +
              s"(${maxK + 2}, 'NEW', 222)")
        // refresh: fold the net deltas since v1 into the view
        val delta = graft.sources.StoreSink.changes(s, path, 1)
          .groupBy(col("grp"))
          .agg(sum(when(col("op") === "insert", 1L).otherwise(-1L)).as("dn"),
               sum(when(col("op") === "insert", col("amt_cents"))
                 .otherwise(-col("amt_cents"))).as("dsum"))
        val ivm = mv0.join(delta, Seq("grp"), "full_outer")
          .select(col("grp"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("sum_cents"), lit(0L)) +
              coalesce(col("dsum"), lit(0L))).as("sum_cents"))
          .where(col("n") > 0)
        val direct = aggOf(s.table("graft.store"))
        val matches = ivm.exceptAll(direct).isEmpty && direct.exceptAll(ivm).isEmpty
        val rows = direct.collect().toSeq :+
          org.apache.spark.sql.Row("z_ivm_match", if (matches) 1L else 0L, 0L)
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // IVM ACROSS A REPLACE (the schema-change case q_store_ivm can't hit):
    // the change feed is SCHEMA-AWARE — each side of the diff reads under
    // the schema its generation was committed with (the snapshot-scoped
    // `_schema.v<V>` archive) and projects by name onto the destination
    // schema — so a materialized view rides through an RTAS that reshaped
    // the trailing columns instead of re-bootstrapping: the replace
    // surfaces as delete-all-old + insert-all-new in the NEW shape, and
    // the fold still lands bit-for-bit on the direct recompute. At 100 TB
    // this is the difference between an MV refresh surviving a quarterly
    // re-materialization and every downstream mart rebuilding from
    // scratch.
    "q_store_ivm_replace" -> ((s, d) => withGraftCatalog(s) {
      val ctasDir = tmp(d, "storeivmr")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(ctasDir), true)
      val prev = s.conf.getOption(GraftCatalog.CtasDirKey)
      s.conf.set(GraftCatalog.CtasDirKey, ctasDir)
      try {
        Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                  graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
          .createOrReplaceTempView("ivm_src_orders")
        s.sql("CREATE TABLE graft.mvsrc AS " +
              "SELECT k, grp, amt_cents FROM ivm_src_orders") // v1
        val path = s"$ctasDir/mvsrc"
        def aggOf(df: DataFrame) = df.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        val mv0 = aggOf(s.table("graft.mvsrc")).localCheckpoint()
        s.sql("INSERT INTO graft.mvsrc VALUES (9000001, 'ZZ', 111)") // v2
        // the RTAS reshapes content AND trailing schema in one commit
        s.sql("REPLACE TABLE graft.mvsrc AS " +
              "SELECT k, grp, amt_cents * 3 AS amt_cents, k % 5 AS b5 " +
              "FROM ivm_src_orders WHERE k % 2 = 0") // v3
        val delta = graft.sources.StoreSink.changes(s, path, 1)
        val shapeOk = delta.columns.toSeq ==
          Seq("op", "k", "grp", "amt_cents", "b5")
        val folded = delta.groupBy(col("grp"))
          .agg(sum(when(col("op") === "insert", 1L).otherwise(-1L)).as("dn"),
               sum(when(col("op") === "insert", col("amt_cents"))
                 .otherwise(-col("amt_cents"))).as("dsum"))
        val ivm = mv0.join(folded, Seq("grp"), "full_outer")
          .select(col("grp"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("sum_cents"), lit(0L)) +
              coalesce(col("dsum"), lit(0L))).as("sum_cents"))
          .where(col("n") > 0)
        val direct = aggOf(s.table("graft.mvsrc"))
        val matches = ivm.exceptAll(direct).isEmpty &&
          direct.exceptAll(ivm).isEmpty
        val rows = direct.collect().toSeq ++ Seq(
          org.apache.spark.sql.Row("z_cdf_shape", if (shapeOk) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_ivm_match", if (matches) 1L else 0L, 0L))
        s.sql("DROP TABLE graft.mvsrc")
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      } finally prev match {
        case Some(p) => s.conf.set(GraftCatalog.CtasDirKey, p)
        case None    => s.conf.unset(GraftCatalog.CtasDirKey)
      }
    }),

    // RUNTIME BLOOM-FILTER JOIN PRUNING: a selective fact⋈dim equi-join on
    // `grp` — the UNORDERED dimension column zones can't help with —
    // realizes the dim side's values at runtime (SupportsRuntimeFiltering)
    // and skips every file whose per-file bloom says "cannot contain any
    // of them". The dim side is derived by an AGGREGATE (rare statuses),
    // so no static `grp = 'P'` constant can be inferred at compile time —
    // the pruning observed is genuinely runtime. File skipping from a
    // JOIN on a non-partition, non-zone column is the last pruning
    // dimension the store lacked; at 100 TB it turns "dim-filtered fact
    // scan" from a full-table read into a bloom-hit subset.
    "q_store_bloom_join" -> ((s, d) => {
      val path = tmp(d, "storebloomjoin")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
        .repartitionByRange(8, col("grp"), col("k")) // grp-homogeneous files
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      val store = s.read.format("graft.sources.StoreSink")
        .option("path", path).load()
      // the dim side carries a SELECTIVE but non-foldable predicate (an
      // md5-threshold on the value — DPP's injection heuristic needs a
      // filter, and no static `grp = 'P'` constant can be inferred from
      // it), so the pruning observed can only be the runtime-realized join
      // values hitting the blooms
      val dim = Tables.orders(s, d)
        .select(col("o_orderstatus").as("dgrp")).distinct()
        .where(conv(substring(md5(col("dgrp")), 1, 2), 16, 10) < 100)
      graft.sources.StoreSink.lastZonePrune = None
      val joined = store.join(broadcast(dim), col("grp") === col("dgrp"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        .collect()
      val (total, planned) = graft.sources.StoreSink.lastZonePrune.get
      val rows = joined.toSeq :+
        org.apache.spark.sql.Row("z_bloom_join_pruned",
          if (planned < total && planned >= 1) 1L else 0L, 0L)
      val schema = StructType(Seq(
        StructField("grp", StringType), StructField("n", LongType),
        StructField("sum_cents", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
    }),

    // Per-file GRP BLOOM pruning — the zone maps' sibling for the
    // unordered dimension column: a (grp, k) range-clustered layout makes
    // files grp-homogeneous, the manifest's 64-bit per-file bloom records
    // each file's grp membership, and a `grp = 'P'` point read plans ONLY
    // the file(s) whose bloom may contain 'P' (the rare 4% status — 1 of 8
    // files) while `grp = 'NEW'` (absent everywhere) plans ZERO files.
    // Every filter stays a post-scan residual: blooms skip files, never
    // rows, and saturation (a file with many grps) only costs pruning.
    // At 100 TB the 64-bit word becomes a KB-sized bloom sidecar per file;
    // the planning contract is identical.
    "q_store_bloom_read" -> ((s, d) => {
      val path = tmp(d, "storebloom")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
        .repartitionByRange(8, col("grp"), col("k")) // grp-homogeneous files
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      def store = s.read.format("graft.sources.StoreSink").option("path", path).load()
      val p = store.where(col("grp") === "P")
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
        .collect()
      val (totalP, plannedP) = graft.sources.StoreSink.lastZonePrune.get
      val nAbsent = store.where(col("grp") === "NEW").count()
      val (_, plannedAbsent) = graft.sources.StoreSink.lastZonePrune.get
      val root = new org.apache.hadoop.fs.Path(path)
      val bloomed = graft.sources.StoreSink.readEntries(root, fsys)
        .forall(_.bloom.isDefined)
      val rows = p.toSeq ++ Seq(
        org.apache.spark.sql.Row("z_absent_rows", nAbsent, plannedAbsent.toLong),
        org.apache.spark.sql.Row("z_bloom_present", if (bloomed) 1L else 0L, 0L),
        org.apache.spark.sql.Row("z_bloom_pruned",
          if (plannedP < totalP && plannedP >= 1) 1L else 0L, 0L))
      val schema = StructType(Seq(
        StructField("grp", StringType), StructField("n", LongType),
        StructField("sum_cents", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
    }),

    // SCHEMA EVOLUTION through the catalog: `ALTER TABLE graft.store ADD
    // COLUMN note STRING` records the new trailing column in the `_schema`
    // sidecar and NO file is rewritten — the seed generation's files stay
    // 3-wide on disk and decode as NULL in the new column (the
    // Iceberg/Delta add-only contract). The append then writes 4-wide
    // files through the same connector, and the row-level UPDATE keyed on
    // the NEW column (`WHERE note IS NOT NULL`) rides the runtime group
    // filter: its matched keys live only in the appended files, so every
    // pre-evolution file carries over BY NAME, still 3-wide (spec-pinned).
    // At 100 TB this is why evolution must be metadata-only: an
    // ALTER that rewrote files would be a full-table write.
    // SCHEMA MERGE ON WRITE (`option("mergeSchema","true")` — Delta's
    // auto-evolution knob under this store's add-TRAILING discipline): a
    // WIDER append registers its extra trailing columns as new id'd slots
    // itself — no separate ALTER — then stages rows under the merged
    // layout; a second identically-shaped merge write is a metadata
    // no-op. Old files never rewrite (short rows decode the new columns
    // as NULL), so at 100 TB auto-evolution costs one sidecar write
    // under the commit lock, never a data pass. The analyzer's arity
    // check stands down only for the opted-in write (ACCEPT_ANY_SCHEMA
    // granted per-resolution), and the builder re-validates the prefix
    // positionally — stricter than what it replaced.
    "q_store_schema_merge" -> ((s, d) => {
      val path = tmp(d, "storeschmerge")
      val (base, maxK) = seedStore(s, d, path) // v1: 3-column generation
      base.where(pmod(col("k"), lit(101)) === 0)
        .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                (col("k") * 10).as("amt_cents"),
                concat(lit("m"), col("k").cast("string")).as("note"),
                pmod(col("k"), lit(7)).as("score"))
        .write.format("graft.sources.StoreSink").mode("append")
        .option("path", path).option("mergeSchema", "true").save()
      // same SHAPE again on different keys: the merge is a metadata
      // no-op and the rows append under the already-merged layout
      base.where(pmod(col("k"), lit(103)) === 0)
        .select((col("k") + 2 * (maxK + 1)).as("k"), lit("NEW2").as("grp"),
                (col("k") * 11).as("amt_cents"),
                concat(lit("p"), col("k").cast("string")).as("note"),
                pmod(col("k"), lit(5)).as("score"))
        .write.format("graft.sources.StoreSink").mode("append")
        .option("path", path).option("mergeSchema", "true").save()
      s.read.format("graft.sources.StoreSink").option("path", path).load()
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"),
             count(col("note")).as("n_note"), max(col("note")).as("max_note"),
             sum(col("score")).as("sum_score"))
        .orderBy(col("grp"))
    }),

    "q_store_evolve" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeevolve")
      val (base, maxK) = seedStore(s, d, path) // v1: 3-column generation
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD COLUMN note STRING")
        base.where(pmod(col("k"), lit(101)) === 0)
          .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                  (col("k") * 10).as("amt_cents"),
                  concat(lit("n"), col("k").cast("string")).as("note"))
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 5 " +
              "WHERE note IS NOT NULL")
        val res = s.table("graft.store")
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"),
               count(col("note")).as("n_note"), max(col("note")).as("max_note"))
          .orderBy(col("grp"))
        s.createDataFrame(java.util.Arrays.asList(res.collect(): _*), res.schema)
      }
    }),

    // GENERALIZED PER-COLUMN ZONE STATS (the Iceberg lower/upper-bounds
    // map in miniature): `graft.stats.cols` declares which trailing bigint
    // columns get per-file min/max in the manifest's 12th field; a range
    // predicate on ANY declared column then prunes file planning — not
    // just the built-in (k, amt_cents) pair — and an unfiltered MIN/MAX on
    // it answers from metadata with ZERO files planned. The query declares
    // `fee`, writes a fee-range-clustered generation, and pins (a) the
    // filtered read planning a strict subset of files, (b) the MIN/MAX
    // metadata answer, (c) exact content under both. At 100 TB declared
    // stats are what make a third, fourth, nth predicate column skippable
    // — without them every query on a non-zone column reads the table.
    "q_store_zone_multi" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storezonemulti")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD COLUMN fee BIGINT")
        s.sql("ALTER TABLE graft.store SET TBLPROPERTIES " +
              "('graft.stats.cols' = 'fee')")
        Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                  graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"),
                  pmod(col("o_orderkey"), lit(1000)).as("fee"))
          .repartitionByRange(8, col("fee")) // fee-disjoint files
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).save()
        def store = s.read.format("graft.sources.StoreSink")
          .option("path", path).load()
        val filt = store.where(col("fee") < 125)
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("fee")).as("fee_sum"))
          .select(concat(lit("grp:"), col("grp")).as("step"), col("n"),
                  col("fee_sum"))
          .collect()
        val (total, planned) = graft.sources.StoreSink.lastZonePrune.get
        graft.sources.StoreSink.lastAggPush = None
        val mm = store.agg(min(col("fee")).as("a"), max(col("fee")).as("b"))
          .collect()(0)
        val pushed = graft.sources.StoreSink.lastAggPush
          .contains(Seq("min_s:fee", "max_s:fee"))
        val rows = filt.toSeq ++ Seq(
          org.apache.spark.sql.Row("minmax", mm.getLong(0), mm.getLong(1)),
          org.apache.spark.sql.Row("z_agg_pushed", if (pushed) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_stat_pruned",
            if (planned < total && planned >= 1) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("step", StringType), StructField("n", LongType),
          StructField("fee_sum", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
      }
    }),

    // ANALYZE — the declared-stats LIFECYCLE closer: data written BEFORE
    // the stats declaration carries no bounds (q_store_zone_multi's
    // "stat-less files never prune" conservatism), and `CALL
    // graft.analyze(path)` backfills them — one read pass over exactly
    // the stat-less files, then a METADATA-ONLY commit, so pruning and
    // metadata MIN/MAX switch on retroactively with zero data bytes
    // written. At 100 TB this is the Iceberg/Delta ANALYZE/compute-stats
    // job: declaring a new skipping column on a petabyte table must not
    // mean rewriting it.
    "q_store_analyze" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeanalyze")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD COLUMN fee BIGINT")
        // fee-clustered generation written with NO stats declaration
        Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                  graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"),
                  pmod(col("o_orderkey"), lit(1000)).as("fee"))
          .repartitionByRange(8, col("fee"))
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).save()
        def store = s.read.format("graft.sources.StoreSink")
          .option("path", path).load()
        store.where(col("fee") < 125).count()
        val (t0, p0) = graft.sources.StoreSink.lastZonePrune.get
        val noPruneBefore = t0 == p0 // stat-less: nothing prunes
        s.sql("ALTER TABLE graft.store SET TBLPROPERTIES " +
              "('graft.stats.cols' = 'fee')")
        val audit = s.sql(s"CALL graft.analyze('$path')").collect()(0)
        val filesBefore = graft.sources.StoreSink
          .readManifest(new org.apache.hadoop.fs.Path(path), fsys)
        val filt = store.where(col("fee") < 125)
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("fee")).as("fee_sum"))
          .select(concat(lit("grp:"), col("grp")).as("step"), col("n"),
                  col("fee_sum"))
          .collect()
        val (t1, p1) = graft.sources.StoreSink.lastZonePrune.get
        // NDV sketches (verdict r9 #4): analyze also persisted per-column
        // HLL distinct counts — exact at tiny cardinalities (grp has 3
        // statuses), within HLL++ error at large ones (k is unique per row)
        val ndv = graft.sources.StoreSink
          .readProps(new org.apache.hadoop.fs.Path(path),
            org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration))
          .find(_._1 == graft.sources.StoreSink.NdvProp).map(_._2).getOrElse("")
          .split(';').filter(_.nonEmpty).map { kv =>
            val i = kv.lastIndexOf(':')
            (kv.substring(0, i), kv.substring(i + 1).toLong)
          }.toMap
        val nRows = store.count()
        // HLL++ at the default 5% rsd: gate at 2 sigma
        val kClose = math.abs(ndv.getOrElse("k", 0L) - nRows) <= nRows / 10
        val rows = filt.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_analyze_audit",
            audit.getLong(0), audit.getLong(1)),
          org.apache.spark.sql.Row("z_ndv_grp", ndv.getOrElse("grp", -1L), 0L),
          org.apache.spark.sql.Row("z_ndv_k_close", if (kClose) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_no_rewrite",
            if (graft.sources.StoreSink.readManifest(
                  new org.apache.hadoop.fs.Path(path), fsys) == filesBefore) 1L
            else 0L, 0L),
          org.apache.spark.sql.Row("z_prunes_after",
            if (noPruneBefore && p1 < t1 && p1 >= 1) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("step", StringType), StructField("n", LongType),
          StructField("fee_sum", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
      }
    }),

    // FIELD-ID RENAME (`ALTER TABLE ... RENAME COLUMN`): the column's
    // stable field id keeps decoding the same physical slot, so a rename is
    // pure metadata — files written under the OLD name read under the new
    // one with zero rewrites, files written AFTER the rename land in the
    // same slot, and time travel to a pre-rename version resolves the
    // archived schema and shows the OLD name (the Iceberg
    // schema-per-snapshot contract). At 100 TB: a rename that rewrote
    // files — or misread them by current-schema ordinal — would be a
    // full-table operation; by-id resolution makes it free.
    "q_store_evolve_rename" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storerename")
      val (base, maxK) = seedStore(s, d, path) // v1: 3-wide files
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD COLUMN note STRING")
        base.where(pmod(col("k"), lit(101)) === 0) // v2: written as "note"
          .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                  (col("k") * 10).as("amt_cents"),
                  concat(lit("n"), col("k").cast("string")).as("note"))
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
        s.sql("ALTER TABLE graft.store RENAME COLUMN note TO memo")
        base.where(pmod(col("k"), lit(103)) === 0) // v3: written as "memo"
          .select((col("k") + 2 * (maxK + 1)).as("k"), lit("NEW2").as("grp"),
                  (col("k") * 11).as("amt_cents"),
                  concat(lit("m"), col("k").cast("string")).as("memo"))
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
        val head = s.table("graft.store")
        val agg = head.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), count(col("memo")).as("n_memo"),
               max(col("memo")).as("max_memo"))
          .select(concat(lit("grp:"), col("grp")).as("step"), col("n"),
                  col("n_memo"), col("max_memo"))
          .collect()
        val headOk = head.schema.fieldNames.toSeq ==
          Seq("k", "grp", "amt_cents", "memo")
        // pre-rename snapshot: archived schema, OLD name, same values
        val v2 = s.sql("SELECT * FROM graft.store VERSION AS OF 2")
        val travelOk = v2.schema.fieldNames.toSeq ==
          Seq("k", "grp", "amt_cents", "note")
        val v2Notes = v2.agg(count(col("note"))).collect()(0).getLong(0)
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_head_renamed",
            if (headOk) 1L else 0L, 0L, "-"),
          org.apache.spark.sql.Row("z_travel_old_name",
            if (travelOk) 1L else 0L, 0L, "-"),
          org.apache.spark.sql.Row("z_travel_notes", v2Notes, 0L, "-"))
        val schema = StructType(Seq(
          StructField("step", StringType), StructField("n", LongType),
          StructField("n_memo", LongType), StructField("max_memo", StringType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
      }
    }),

    // FIELD-ID DROP (`ALTER TABLE ... DROP COLUMN`): the dropped column's
    // slot is TOMBSTONED, never reclaimed — a later column keeps its own
    // slot, so a file written while both existed still reads every
    // surviving column correctly by id (current-schema ordinal decode
    // would read the dead note strings as fee — the exact misread the
    // round-16 RTAS probe caught). Re-adding the same NAME mints a fresh
    // id: the old values never resurrect. Time travel to a pre-drop
    // version resolves the archived schema and shows the column. The
    // post-drop UPDATE pins the row-level rewrite under a tombstoned
    // layout. No file is rewritten by the DDL itself.
    "q_store_evolve_drop" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storedropcol")
      val (base, maxK) = seedStore(s, d, path) // v1: 3-wide files
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD COLUMN note STRING")
        s.sql("ALTER TABLE graft.store ADD COLUMN fee BIGINT")
        base.where(pmod(col("k"), lit(101)) === 0) // v2: 5-wide, both live
          .select((col("k") + maxK + 1).as("k"), lit("NEW").as("grp"),
                  (col("k") * 10).as("amt_cents"),
                  concat(lit("n"), col("k").cast("string")).as("note"),
                  pmod(col("k"), lit(7)).as("fee"))
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
        s.sql("ALTER TABLE graft.store DROP COLUMN note")
        base.where(pmod(col("k"), lit(103)) === 0) // v3: dead slot padded
          .select((col("k") + 2 * (maxK + 1)).as("k"), lit("NEW2").as("grp"),
                  (col("k") * 11).as("amt_cents"),
                  pmod(col("k"), lit(5)).as("fee"))
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
        // re-ADD under the dropped name: a FRESH id/slot
        s.sql("ALTER TABLE graft.store ADD COLUMN note STRING")
        // row-level rewrite under the tombstoned layout (v4)
        s.sql("UPDATE graft.store SET fee = fee + 1 WHERE grp = 'NEW2'")
        val head = s.table("graft.store")
        val agg = head.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("fee")).as("fee_sum"),
               count(col("note")).as("n_note"))
          .select(concat(lit("grp:"), col("grp")).as("step"), col("n"),
                  col("fee_sum"), col("n_note"))
          .collect()
        val headOk = head.schema.fieldNames.toSeq ==
          Seq("k", "grp", "amt_cents", "fee", "note")
        val v2 = s.sql("SELECT * FROM graft.store VERSION AS OF 2")
        val travelOk = v2.schema.fieldNames.toSeq ==
          Seq("k", "grp", "amt_cents", "note", "fee")
        val v2Notes = v2.agg(count(col("note"))).collect()(0).getLong(0)
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_head_schema",
            if (headOk) 1L else 0L, 0L, 0L),
          org.apache.spark.sql.Row("z_travel_schema",
            if (travelOk) 1L else 0L, 0L, 0L),
          org.apache.spark.sql.Row("z_travel_notes", v2Notes, 0L, 0L))
        val schema = StructType(Seq(
          StructField("step", StringType), StructField("n", LongType),
          StructField("fee_sum", LongType), StructField("n_note", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
      }
    }),

    // STORED PROCEDURES (ProcedureCatalog): the store's maintenance ops at
    // the SQL surface — `CALL graft.compact(path, target_rows)` and
    // `CALL graft.vacuum(path, keep_versions)` — returning their audit
    // rows as query results (the Iceberg CALL idiom). The query seeds a
    // 16-file hash-scattered generation, compacts it to the closed-form 4
    // range-clustered files (target = total/4), vacuums to one archived
    // version + 4 live files, and pins BOTH audit rows AND the content's
    // invariance under the whole maintenance cycle in one oracle. At
    // 100 TB this is the operator interface: maintenance is a scheduled
    // SQL statement with an auditable result, not a side-effecting script.
    "q_store_call" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storecall")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      base.repartition(16, col("k"))
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      val total = base.count()
      val compact = s.sql(s"CALL graft.compact('$path', ${(total + 3) / 4})").collect()(0)
      val vacuum = s.sql(s"CALL graft.vacuum('$path', 1)").collect()(0)
      val content = s.read.format("graft.sources.StoreSink").option("path", path).load()
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("a"), sum(col("amt_cents")).as("b"))
        .select(concat(lit("grp:"), col("grp")).as("step"), col("a"), col("b"))
        .collect()
      val rows = content.toSeq ++ Seq(
        org.apache.spark.sql.Row("compact", compact.getLong(0), compact.getLong(1)),
        org.apache.spark.sql.Row("vacuum", vacuum.getLong(0), vacuum.getLong(1)))
      val schema = StructType(Seq(
        StructField("step", StringType), StructField("a", LongType),
        StructField("b", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
    }),

    // MANIFEST TREE: the store's metadata path at 100 TB scale. The list
    // file holds POINTERS to immutable content-addressed segment files
    // (16 entries each), so a 64-file seed commits as 4 sealed segments;
    // a key-range point read plans by SEGMENT range first and READS 1 of
    // the 4 segments (driver work O(list + matched segments), not
    // O(files)); an append carries every sealed segment over BY POINTER
    // (the commit rewrites the small list + one loose line — never
    // O(files) metadata bytes). Content is pinned relationally; the flags
    // pin the tree contracts the content can't show. This is the
    // manifest-list/checkpoint idea that keeps commits and planning
    // sublinear in file count — the one driver-side O(files) cost left in
    // the store before this round.
    "q_store_meta" -> ((s, d) => {
      val path = tmp(d, "storemeta")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      base.repartitionByRange(64, col("k"))
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).save()
      val root = new org.apache.hadoop.fs.Path(path)
      def listLines() = graft.sources.StoreSink.readListLines(root, fsys)
      def segsOf(ls: Seq[String]) = ls.filter(_.startsWith("@seg|"))
      val segsBefore = segsOf(listLines())
      def store = s.read.format("graft.sources.StoreSink").option("path", path).load()
      def aggOf(src: DataFrame, v: String) =
        src.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .select(lit(v).as("v"), col("grp"), col("n"), col("sum_cents"))
      val rangeRows = aggOf(store.where(col("k").between(100, 999)), "range").collect()
      val (segsTotal, segsRead) = graft.sources.StoreSink.lastSegPlan.get
      val maxK = base.agg(max(col("k"))).collect()(0).getLong(0)
      s.range(1, 6)
        .select((col("id") + maxK).as("k"), lit("NEW").as("grp"),
                (col("id") * 10).as("amt_cents"))
        .repartition(1).write.format("graft.sources.StoreSink").mode("append")
        .option("path", path).save()
      val after = listLines()
      val loose = after.filterNot(l => l.startsWith("@seg|") || l.startsWith("#"))
      val rows = rangeRows.toSeq ++ aggOf(store, "all").collect() ++ Seq(
        org.apache.spark.sql.Row("z_append_reuse", "-",
          if (segsOf(after) == segsBefore) 1L else 0L, 0L),
        org.apache.spark.sql.Row("z_loose_tail", "-",
          if (loose.size == 1) 1L else 0L, 0L),
        org.apache.spark.sql.Row("z_point_plan", "-",
          if (segsTotal == 4 && segsRead == 1) 1L else 0L, 0L),
        org.apache.spark.sql.Row("z_sealed", "-",
          if (segsBefore.size == 4) 1L else 0L, 0L))
      val schema = StructType(Seq(
        StructField("v", StringType), StructField("grp", StringType),
        StructField("n", LongType), StructField("sum_cents", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("v"), col("grp"))
    }),

    // AGGREGATE PUSHDOWN on the store scan: an unfiltered COUNT(*) /
    // MIN(k) / MAX(k) is already summed in the manifest (per-file live row
    // counts + key zones), so the scan answers from METADATA — zero data
    // files planned or opened (StoreSinkSpec pins the plan node). The
    // filtered twin must DECLINE (the residual filter makes metadata
    // unsafe) and fall back to the row scan with identical semantics —
    // both shapes share one oracle block. At 100 TB this is the
    // difference between a catalog lookup and a full table scan for the
    // row-count probes every pipeline health check runs.
    "q_store_agg_push" -> ((s, d) => {
      val path = tmp(d, "storeaggpush")
      seedStore(s, d, path)
      def store = s.read.format("graft.sources.StoreSink").option("path", path).load()
      graft.sources.StoreSink.lastAggPush = None
      val all = store.agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
                          max(col("k")).as("max_k")).collect()(0)
      val pushed = graft.sources.StoreSink.lastAggPush.contains(Seq("count", "min", "max"))
      graft.sources.StoreSink.lastAggPush = None
      val filt = store.where(col("grp") === "F")
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
             max(col("k")).as("max_k")).collect()(0)
      val declined = graft.sources.StoreSink.lastAggPush.isEmpty
      val rows = Seq(
        org.apache.spark.sql.Row("all", all.getLong(0), all.getLong(1), all.getLong(2)),
        org.apache.spark.sql.Row("filtered", filt.getLong(0), filt.getLong(1), filt.getLong(2)),
        org.apache.spark.sql.Row("z_filtered_declined", if (declined) 1L else 0L, 0L, 0L),
        org.apache.spark.sql.Row("z_pushed", if (pushed) 1L else 0L, 0L, 0L))
      val schema = StructType(Seq(
        StructField("v", StringType), StructField("n", LongType),
        StructField("min_k", LongType), StructField("max_k", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("v"))
    }),

    // NAMED REFS (tags): `CALL graft.tag(path, 'baseline', 1)` pins an
    // archived version under a human name — `VERSION AS OF 'baseline'`
    // resolves the tag (a non-integer version IS the tag namespace), and
    // vacuum REFUSES to expire a tagged version while untagged history
    // ages out: a tag is a retention pin, which is the operational point
    // of naming a snapshot (the Iceberg refs idea). The query pins the
    // tag audit row, the baseline read-back after two mutations AND a
    // vacuum, the untagged v2's loud expiry, and the current state — one
    // oracle block covers all four.
    "q_store_tag" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storetag")
      seedStore(s, d, path) // v1
      withStorePath(s, path) {
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 7 WHERE grp = 'P'") // v2
        s.sql("DELETE FROM graft.store WHERE grp = 'F'") // v3 (current)
        val audit = s.sql(s"CALL graft.tag('$path', 'baseline', 1)").collect()(0)
        // versions [1,2,3]; keep 1 → v3 by age, v1 by PIN, v2 expires
        graft.sources.StoreSink.vacuum(path, 1)
        def aggOf(src: DataFrame, v: String) =
          src.groupBy(col("grp"))
            .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
            .select(lit(v).as("v"), col("grp"), col("n"), col("sum_cents"))
        val rows =
          aggOf(s.sql("SELECT * FROM graft.store VERSION AS OF 'baseline'"), "baseline").collect() ++
          aggOf(s.table("graft.store"), "current").collect() ++
          Seq(
            org.apache.spark.sql.Row("z_tag_audit", "-", audit.getLong(0), audit.getLong(1)),
            org.apache.spark.sql.Row("z_v2_expired", "-",
              (try { s.sql("SELECT * FROM graft.store VERSION AS OF 2").collect(); 0L }
               catch { case _: Exception => 1L }), 0L),
            org.apache.spark.sql.Row("z_unknown_tag_loud", "-",
              (try { s.sql("SELECT * FROM graft.store VERSION AS OF 'nope'").collect(); 0L }
               catch { case _: Exception => 1L }), 0L))
        val schema = StructType(Seq(
          StructField("v", StringType), StructField("grp", StringType),
          StructField("n", LongType), StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.toSeq.asJava, schema).orderBy(col("v"), col("grp"))
      }
    }),

    // ATOMIC CTAS through the StagingTableCatalog protocol: CREATE TABLE
    // graft.<name> AS SELECT writes through the store's two-phase commit
    // into the session's CTAS directory, and the manifest swap IS the
    // registration — so the failing CTAS (ANSI division by zero mid-write)
    // leaves NO table behind (the flag probes it), not the half-registered
    // husk the non-staged path can. The created table carries a trailing
    // evolved column (pri STRING) persisted via the _schema sidecar, and
    // DROP TABLE removes it. Without StagingTableCatalog, Spark's CTAS
    // registers first and best-effort-drops on failure — the exact window
    // the staged protocol removes.
    // DECLARED PARTITIONING + STORAGE-PARTITIONED JOIN: two stores created
    // `PARTITIONED BY (bucket(8, k))` route their files into bucket
    // directories with the partition value in the manifest; joining them on
    // k plans ZERO shuffle exchanges (KeyGroupedPartitioning +
    // HasPartitionKey, the catalog's `bucket` V2 function resolving the
    // transform), and a bucket-pure IN predicate prunes file planning to
    // one bucket. At 100 TB this deletes BOTH full-table exchanges from
    // every co-bucketed fact⋈fact join — the reason bucketed layouts
    // exist — while partition pruning bounds point lookups by bucket, not
    // table. Flags pin the plan shape; the data agrees with the relational
    // oracle exactly.
    "q_store_part" -> ((s, d) => withGraftCatalog(s) {
      val dir = tmp(d, "storepart")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(dir), true)
      val confs = Seq(
        GraftCatalog.CtasDirKey -> dir,
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        Tables.orders(s, d).createOrReplaceTempView("ord_part_v")
        s.sql("""CREATE TABLE graft.part_fact PARTITIONED BY (bucket(8, k)) AS
                |SELECT o_orderkey AS k, o_orderstatus AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
                |FROM ord_part_v""".stripMargin)
        s.sql("""CREATE TABLE graft.part_dim PARTITIONED BY (bucket(8, k)) AS
                |SELECT o_orderkey AS k, 'D' AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) * 2 AS amt_cents
                |FROM ord_part_v WHERE o_orderkey % 3 = 0""".stripMargin)
        val j = s.table("graft.part_fact").as("f")
          .join(s.table("graft.part_dim").as("dm"), "k")
          .select(col("f.grp").as("grp"), col("f.amt_cents").as("x"),
                  col("dm.amt_cents").as("y"))
        val noExchange =
          if (j.queryExecution.executedPlan.toString.contains("Exchange")) 0L else 1L
        val agg = j.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("x") + col("y")).as("sum_cents"))
          .collect()
        // bucket-pure IN probe: keys ≡ 1 (mod 8) — partition pruning must
        // plan ONLY bucket 1's files, regardless of zones
        val probeKeys = (0 until 100).map(i => 8L * i + 1)
        graft.sources.StoreSink.lastPartPrune = None
        s.table("graft.part_fact").where(col("k").isin(probeKeys: _*)).count()
        val root = new org.apache.hadoop.fs.Path(s"$dir/part_fact")
        val bucket1 = graft.sources.StoreSink.readEntries(root, fsys)
          .count(_.part.contains("1"))
        val pruned = graft.sources.StoreSink.lastPartPrune match {
          case Some((cand, kept)) if kept == bucket1 && kept < cand => 1L
          case _ => 0L
        }
        val dirsOk = if ((0 to 7).forall(b =>
          fsys.exists(new org.apache.hadoop.fs.Path(root, s"k_bucket=$b")))) 1L else 0L
        s.sql("DROP TABLE graft.part_fact")
        s.sql("DROP TABLE graft.part_dim")
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_bucket_dirs", dirsOk, 0L),
          org.apache.spark.sql.Row("z_no_exchange", noExchange, 0L),
          org.apache.spark.sql.Row("z_part_prune", pruned, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      } finally prev.foreach {
        case (k, Some(p)) => s.conf.set(k, p)
        case (k, None)    => s.conf.unset(k)
      }
    }),

    // PARTITION DDL (SupportsPartitionManagement): SHOW PARTITIONS lists
    // the manifest's distinct partition values (no directory listing),
    // ALTER TABLE DROP PARTITION removes a partition's entries in ONE
    // manifest swap with zero data bytes touched (archived versions keep
    // the files until vacuum — the retention story of every date/bucket
    // layout: dropping 1 TB of expired data costs a list rewrite), and
    // TRUNCATE PARTITION is the same metadata op because partitions are
    // value-derived. Flags pin the metadata-only contract; the surviving
    // data agrees with the relational oracle.
    "q_store_partmgmt" -> ((s, d) => withGraftCatalog(s) {
      val dir = tmp(d, "storepm")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(dir), true)
      val key = GraftCatalog.CtasDirKey
      val prev = s.conf.getOption(key)
      s.conf.set(key, dir)
      try {
        Tables.orders(s, d).createOrReplaceTempView("ord_pm_v")
        s.sql("""CREATE TABLE graft.pmq PARTITIONED BY (grp) AS
                |SELECT o_orderkey AS k, o_orderstatus AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
                |FROM ord_pm_v""".stripMargin)
        val nParts = s.sql("SHOW PARTITIONS graft.pmq").count()
        val showOne = s.sql("SHOW PARTITIONS graft.pmq PARTITION (grp='F')")
          .collect().map(_.getString(0)).toSeq == Seq("grp=F")
        val root = new org.apache.hadoop.fs.Path(s"$dir/pmq")
        val filesBefore = graft.sources.StoreSink.readEntries(root, fsys).map(_.name)
        s.sql("ALTER TABLE graft.pmq DROP PARTITION (grp='F')")
        val filesKept = filesBefore.forall(f =>
          fsys.exists(new org.apache.hadoop.fs.Path(root, f)))
        val agg = s.table("graft.pmq").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        s.sql("TRUNCATE TABLE graft.pmq PARTITION (grp='O')")
        val afterTrunc = s.table("graft.pmq").count()
        s.sql("DROP TABLE graft.pmq")
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_after_trunc", afterTrunc, 0L),
          org.apache.spark.sql.Row("z_files_kept", if (filesKept) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_parts", nParts, 0L),
          org.apache.spark.sql.Row("z_show_one", if (showOne) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      } finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None    => s.conf.unset(key)
      }
    }),

    // DYNAMIC PARTITION OVERWRITE (SupportsDynamicOverwrite, under
    // spark.sql.sources.partitionOverwriteMode=dynamic): the daily-reload
    // primitive — INSERT OVERWRITE replaces exactly the partitions the
    // incoming rows land in, and every other partition's files survive BY
    // NAME (flag-pinned), so re-loading one date of a 5-year table costs
    // that date's bytes + one manifest swap, never a table rewrite. The
    // replaced partition's old entries leave the manifest (their files
    // stay archived for time travel until vacuum).
    "q_store_dyn_overwrite" -> ((s, d) => withGraftCatalog(s) {
      val dir = tmp(d, "storedyn")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(dir), true)
      val ctasKey = GraftCatalog.CtasDirKey
      val modeKey = "spark.sql.sources.partitionOverwriteMode"
      val prev = Seq(ctasKey, modeKey).map(k => k -> s.conf.getOption(k)).toMap
      s.conf.set(ctasKey, dir)
      try {
        Tables.orders(s, d).createOrReplaceTempView("ord_dyn_v")
        s.sql("""CREATE TABLE graft.pdyn PARTITIONED BY (grp) AS
                |SELECT o_orderkey AS k, o_orderstatus AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
                |FROM ord_dyn_v""".stripMargin)
        val root = new org.apache.hadoop.fs.Path(s"$dir/pdyn")
        val before = graft.sources.StoreSink.readEntries(root, fsys)
        val keepNames = before.filterNot(_.part.contains("F")).map(_.name).toSet
        val oldF = before.filter(_.part.contains("F")).map(_.name).toSet
        s.conf.set(modeKey, "dynamic")
        // the reload: partition F re-derived with a corrected amount
        s.sql("""INSERT OVERWRITE graft.pdyn
                |SELECT o_orderkey AS k, o_orderstatus AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) + 11 AS amt_cents
                |FROM ord_dyn_v WHERE o_orderstatus = 'F'""".stripMargin)
        val after = graft.sources.StoreSink.readEntries(root, fsys)
        val untouched = after.filterNot(_.part.contains("F")).map(_.name).toSet == keepNames
        val replaced = after.filter(_.part.contains("F")).map(_.name).toSet
          .intersect(oldF).isEmpty
        val agg = s.table("graft.pdyn").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        s.sql("DROP TABLE graft.pdyn")
        def flag(n: String, b: Boolean) =
          org.apache.spark.sql.Row(n, if (b) 1L else 0L, 0L)
        val rows = agg.toSeq ++ Seq(
          flag("z_replaced_fresh", replaced),
          flag("z_untouched_by_name", untouched))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      } finally prev.foreach {
        case (k, Some(p)) => s.conf.set(k, p)
        case (k, None)    => s.conf.unset(k)
      }
    }),

    "q_store_ctas" -> ((s, d) => withGraftCatalog(s) {
      val dir = tmp(d, "storectas")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(dir), true)
      val key = GraftCatalog.CtasDirKey
      val prev = s.conf.getOption(key)
      s.conf.set(key, dir)
      try {
        Tables.orders(s, d).createOrReplaceTempView("ord_ctas_v")
        s.sql("""CREATE TABLE graft.big_orders AS
                |SELECT o_orderkey AS k, o_orderstatus AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents,
                |       CONCAT('p', o_orderpriority) AS pri
                |FROM ord_ctas_v WHERE o_totalprice > 150000""".stripMargin)
        val agg = s.table("graft.big_orders")
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"),
               count(col("pri")).as("n_pri"))
          .collect()
        // atomicity probe: a CTAS that fails mid-write must leave no table
        val failed =
          try {
            s.sql("""CREATE TABLE graft.boom AS
                    |SELECT o_orderkey AS k, o_orderstatus AS grp,
                    |       1L DIV (o_orderkey - o_orderkey) AS amt_cents
                    |FROM ord_ctas_v""".stripMargin)
            0L
          } catch { case _: Exception => 1L }
        val boomGone =
          try { s.table("graft.boom").collect(); 0L }
          catch { case _: Exception => 1L }
        s.sql("DROP TABLE graft.big_orders")
        val dropped =
          try { s.table("graft.big_orders").collect(); 0L }
          catch { case _: Exception => 1L }
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_ctas_failed_loudly", failed, 0L, 0L),
          org.apache.spark.sql.Row("z_ctas_atomic", boomGone, 0L, 0L),
          org.apache.spark.sql.Row("z_dropped", dropped, 0L, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType), StructField("n_pri", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      } finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None    => s.conf.unset(key)
      }
    }),

    // LIMIT pushdown into the store scan (SupportsPushDownLimit, PARTIAL):
    // `LIMIT n` directly over the store plans only a PREFIX of files whose
    // exact live-row counts cover n — at a million files, `LIMIT 10` opens
    // ONE file. Spark keeps its own Limit (partial contract), so results
    // are exact; the cut falls back to the full plan whenever a candidate
    // entry's live count is not exact (legacy lines, equality masks) or a
    // runtime filter narrowed the scan. Flags pin the prefix cut, the
    // exact counts, and the covers-everything case.
    "q_store_limit_push" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storelim")
      seedStore(s, d, path) // 8 range-clustered files
      withStorePath(s, path) {
        graft.sources.StoreSink.lastLimitPlan = None
        val limited = s.sql(
          "SELECT COUNT(*) AS n FROM (SELECT * FROM graft.store LIMIT 100)")
          .collect()(0).getLong(0)
        val cut = graft.sources.StoreSink.lastLimitPlan
        val prefixCut = cut.exists { case (cand, planned) =>
          planned < cand && planned >= 1 }
        graft.sources.StoreSink.lastLimitPlan = None
        val total = s.sql(
          "SELECT COUNT(*) AS n FROM (SELECT * FROM graft.store LIMIT 2000000000)")
          .collect()(0).getLong(0)
        val fullWhenOver = graft.sources.StoreSink.lastLimitPlan
          .exists { case (cand, planned) => planned == cand }
        val rows = Seq(
          org.apache.spark.sql.Row("n_limited", limited),
          org.apache.spark.sql.Row("n_total", total),
          org.apache.spark.sql.Row("z_full_when_over", if (fullWhenOver) 1L else 0L),
          org.apache.spark.sql.Row("z_prefix_cut", if (prefixCut) 1L else 0L))
        val schema = StructType(Seq(
          StructField("item", StringType), StructField("v", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("item"))
      }
    }),

    // ATOMIC RTAS (`REPLACE TABLE ... AS SELECT`, StagingTableCatalog
    // stageReplace): the staged write commits through the store's ordinary
    // TRUNCATE protocol, so ONE manifest swap is both the data replacement
    // and the publish — a reader sees old or new, never a mix, and a
    // FAILED replace leaves the old table intact (sidecars restored, the
    // staged files never entered the manifest). The replaced generation
    // stays archived: `VERSION AS OF 1` still reads the pre-replace
    // content. The schema may change shape across the replace (here the
    // trailing column set changes) — REPLACE resets the trailing schema,
    // exactly what ADD COLUMN alone cannot express.
    "q_store_rtas" -> ((s, d) => withGraftCatalog(s) {
      val dir = tmp(d, "storertas")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(dir), true)
      val key = GraftCatalog.CtasDirKey
      val prev = s.conf.getOption(key)
      s.conf.set(key, dir)
      try {
        Tables.orders(s, d).createOrReplaceTempView("ord_rtas_v")
        s.sql("""CREATE TABLE graft.rt AS
                |SELECT o_orderkey AS k, o_orderstatus AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents,
                |       CONCAT('p', o_orderpriority) AS pri
                |FROM ord_rtas_v""".stripMargin)
        val v1Sum = s.table("graft.rt").agg(sum(col("amt_cents"))).collect()(0).getLong(0)
        // the replace: different filter, different trailing column
        s.sql("""REPLACE TABLE graft.rt AS
                |SELECT o_orderkey AS k, o_orderstatus AS grp,
                |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents,
                |       CAST(o_orderkey % 7 AS BIGINT) AS bucket7
                |FROM ord_rtas_v WHERE o_totalprice > 120000""".stripMargin)
        val agg = s.table("graft.rt").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"),
               sum(col("bucket7")).as("sum_b7"))
          .collect()
        // a failed replace must leave the (replaced) table intact
        val failedLoud =
          try {
            s.sql("""REPLACE TABLE graft.rt AS
                    |SELECT o_orderkey AS k, o_orderstatus AS grp,
                    |       1L DIV (o_orderkey - o_orderkey) AS amt_cents
                    |FROM ord_rtas_v""".stripMargin)
            false
          } catch { case _: Exception => true }
        val intactAfterFail = s.table("graft.rt").count() ==
          agg.map(_.getLong(1)).sum
        // the pre-replace generation is still one VERSION AS OF away
        val v1Readable = s.sql("SELECT SUM(amt_cents) FROM graft.rt VERSION AS OF 1")
          .collect()(0).getLong(0) == v1Sum
        // REPLACE of a missing table refuses; CREATE OR REPLACE creates it
        val missingLoud =
          try { s.sql("REPLACE TABLE graft.nope AS SELECT 1L AS k, 'x' AS grp, 2L AS amt_cents"); false }
          catch { case _: Exception => true }
        s.sql("CREATE OR REPLACE TABLE graft.cor AS SELECT 1L AS k, 'x' AS grp, 2L AS amt_cents")
        val corCreated = s.table("graft.cor").count() == 1L
        s.sql("DROP TABLE graft.cor")
        s.sql("DROP TABLE graft.rt")
        def flag(n: String, b: Boolean) =
          org.apache.spark.sql.Row(n, if (b) 1L else 0L, 0L, 0L)
        val rows = agg.toSeq ++ Seq(
          flag("z_cor_created", corCreated),
          flag("z_failed_loud", failedLoud),
          flag("z_intact_after_fail", intactAfterFail),
          flag("z_missing_loud", missingLoud),
          flag("z_v1_readable", v1Readable))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType), StructField("sum_b7", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      } finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None    => s.conf.unset(key)
      }
    }),

    // PREDICATE OVERWRITE (`INSERT INTO ... REPLACE WHERE cond SELECT ...`
    // — the Delta replaceWhere shape, SupportsOverwrite with a REAL
    // predicate): delete-matching + append-new lands as ONE manifest swap,
    // so a reader sees the old state or the fully-replaced one, never the
    // deleted-but-not-inserted middle. The deletion half reuses the
    // DELETE WHERE machinery: files whose key zone misses the predicate
    // carry over UNREAD and BY NAME (flag-pinned — the reload of one key
    // range costs that range's bytes, not the table); the commit is
    // version +1 exactly (flag-pinned atomicity).
    "q_store_replace_where" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storerw")
      val (_, maxK) = seedStore(s, d, path)
      val cut = maxK / 2
      withStorePath(s, path) {
        val root = new org.apache.hadoop.fs.Path(path)
        val fsys = graft.sources.StoreSink.fs(root)
        val before = graft.sources.StoreSink.readEntries(root, fsys)
        val outside = before.filter(_.minK.exists(_ >= cut)).map(_.name).toSet
        val versionsBefore = graft.sources.StoreSink.listVersions(root, fsys).size
        Tables.orders(s, d).createOrReplaceTempView("ord_rw_v")
        s.sql(s"""INSERT INTO graft.store REPLACE WHERE k < $cut
                 |SELECT o_orderkey, o_orderstatus,
                 |       CAST(ROUND(o_totalprice * 100) AS BIGINT) + 17
                 |FROM ord_rw_v WHERE o_orderkey < $cut""".stripMargin)
        val after = graft.sources.StoreSink.readEntries(root, fsys)
        val untouched = outside.subsetOf(after.map(_.name).toSet)
        val oneCommit = graft.sources.StoreSink.listVersions(root, fsys).size ==
          versionsBefore + 1
        val agg = s.table("graft.store").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        def flag(n: String, b: Boolean) =
          org.apache.spark.sql.Row(n, if (b) 1L else 0L, 0L)
        val rows = agg.toSeq ++ Seq(
          flag("z_one_commit", oneCommit),
          flag("z_untouched_by_name", untouched))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // ORPHAN-FILE CLEANUP (`CALL graft.remove_orphans(path, older_ms)` —
    // the Iceberg remove_orphan_files procedure): a crashed writer leaves
    // promoted-but-never-published data files and dead staging files that
    // no manifest references — invisible to readers, never GC'd by vacuum
    // (which only sweeps after version expiry), silently accumulating
    // storage. The sweep deletes unreferenced data-shaped files OLDER than
    // the cutoff; the age margin is what makes it safe to run while
    // writers run (a live writer's staged files are always younger).
    // Flags pin: a conservative cutoff keeps young orphans, the real
    // sweep removes exactly the planted leftovers, committed data
    // untouched.
    "q_store_orphans" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeorph")
      seedStore(s, d, path)
      withStorePath(s, path) {
        val root = new org.apache.hadoop.fs.Path(path)
        val fsys = graft.sources.StoreSink.fs(root)
        def plant(rel: String): Unit = {
          val out = fsys.create(new org.apache.hadoop.fs.Path(root, rel), true)
          try out.write("9|x|1".getBytes("UTF-8")) finally out.close()
        }
        plant("part-orphan-dead") // promoted, never published
        fsys.mkdirs(new org.apache.hadoop.fs.Path(root, "_staging"))
        plant("_staging/part-dead-stage") // crashed writer's staged file
        val now = System.currentTimeMillis()
        val young = s.sql(s"CALL graft.remove_orphans('$path', ${now - 60000})")
          .collect()(0)
        val youngKept = young.getLong(0) == 0L &&
          fsys.exists(new org.apache.hadoop.fs.Path(root, "part-orphan-dead"))
        val swept = s.sql(s"CALL graft.remove_orphans('$path', ${now + 3600000})")
          .collect()(0)
        val orphansGone = swept.getLong(0) == 2L &&
          !fsys.exists(new org.apache.hadoop.fs.Path(root, "part-orphan-dead")) &&
          !fsys.exists(new org.apache.hadoop.fs.Path(root, "_staging/part-dead-stage"))
        val agg = s.table("graft.store").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        def flag(n: String, b: Boolean) =
          org.apache.spark.sql.Row(n, if (b) 1L else 0L, 0L)
        val rows = agg.toSeq ++ Seq(
          flag("z_orphans_gone", orphansGone),
          flag("z_young_kept", youngKept))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // TIMESTAMP-BASED RETENTION (`CALL graft.expire(path, before_ms)` —
    // the Iceberg expire_snapshots(older_than) form): expire archived
    // versions whose COMMIT-LEDGER instant predates the cutoff; the
    // newest version always survives, and a TAG is a retention pin
    // exactly as under count-based vacuum. This is the retention policy
    // operators actually write ("drop history older than 7 days"), and it
    // reads the same monotone `#ts=` ledger TIMESTAMP AS OF resolves —
    // one metadata sweep, never a data rewrite.
    "q_store_expire" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeexp")
      seedStore(s, d, path) // v1
      withStorePath(s, path) {
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 3 WHERE grp = 'O'") // v2
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 3 WHERE grp = 'O'") // v3
        s.sql(s"CALL graft.tag('$path', 'keepme', 2)").collect() // pin v2
        val cutoff = graft.sources.StoreSink.history(path)
          .find(_._1 == 3).get._2 // v3's commit instant
        val audit = s.sql(s"CALL graft.expire('$path', $cutoff)").collect()(0)
        // v1 expired (ts < cutoff, unpinned); v2 pinned by tag; v3 newest
        val auditOk = audit.getLong(0) == 1L && audit.getLong(1) == 2L
        val v1Gone =
          try { s.sql("SELECT * FROM graft.store VERSION AS OF 1").collect(); false }
          catch { case _: Exception => true }
        val tagAlive = s.sql("SELECT COUNT(*) FROM graft.store VERSION AS OF 'keepme'")
          .collect()(0).getLong(0) > 0L
        val agg = s.table("graft.store").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        def flag(n: String, b: Boolean) =
          org.apache.spark.sql.Row(n, if (b) 1L else 0L, 0L)
        val rows = agg.toSeq ++ Seq(
          flag("z_audit", auditOk),
          flag("z_tag_pinned", tagAlive),
          flag("z_v1_expired", v1Gone))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // TABLE PROPERTIES (`ALTER TABLE ... SET/UNSET TBLPROPERTIES`, SHOW
    // TBLPROPERTIES): free-form metadata in a `_props` sidecar surfaced
    // through Table.properties() — and OPERATIONAL: `graft.vacuum.keep`
    // is the retention policy `CALL graft.vacuum(path, 0)` resolves when
    // no explicit count is passed, so retention travels WITH the table
    // (the Delta retention-property shape), not with whoever runs the
    // maintenance job. The query sets keep=1 on a 3-generation store,
    // vacuums with the policy unresolved at the call site, and pins that
    // exactly one archived version survived (v1 loudly expired, current
    // content untouched); UNSET removes only the named key.
    "q_store_props" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeprops")
      seedStore(s, d, path) // v1
      withStorePath(s, path) {
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 5 WHERE grp = 'P'") // v2
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 5 WHERE grp = 'P'") // v3
        s.sql("""ALTER TABLE graft.store SET TBLPROPERTIES
                |('graft.vacuum.keep'='1', 'note'='round16')""".stripMargin)
        val shown = s.sql("SHOW TBLPROPERTIES graft.store").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
        val propsShown = shown(("graft.vacuum.keep", "1")) && shown(("note", "round16"))
        s.sql(s"CALL graft.vacuum('$path', 0)").collect() // resolves keep=1
        val root = new org.apache.hadoop.fs.Path(path)
        val fsys = graft.sources.StoreSink.fs(root)
        val keptOne = graft.sources.StoreSink.listVersions(root, fsys).size == 1
        val v1Expired =
          try { s.sql("SELECT * FROM graft.store VERSION AS OF 1").collect(); false }
          catch { case _: Exception => true }
        s.sql("ALTER TABLE graft.store UNSET TBLPROPERTIES ('note')")
        val afterUnset = s.sql("SHOW TBLPROPERTIES graft.store").collect()
          .map(_.getString(0)).toSet
        val unsetOk = !afterUnset("note") && afterUnset("graft.vacuum.keep")
        val agg = s.table("graft.store").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        def flag(n: String, b: Boolean) =
          org.apache.spark.sql.Row(n, if (b) 1L else 0L, 0L)
        val rows = agg.toSeq ++ Seq(
          flag("z_props_shown", propsShown),
          flag("z_unset_selective", unsetOk),
          flag("z_v1_expired", v1Expired),
          flag("z_vacuum_used_prop", keptOne))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // TIME TRAVEL + RETENTION through the connector: every manifest swap
    // archives an immutable `_manifest.v<N>`, `VERSION AS OF n` resolves a
    // read-only snapshot through the catalog, and retention is an explicit
    // vacuum (expire old versions, then delete files no retained manifest
    // references) — the Iceberg snapshot/expire lifecycle on a store we
    // own. The query reads three committed generations (seed → UPDATE →
    // DELETE), vacuums to the newest two, proves v1 is then LOUDLY expired
    // (marker row) while the current state is untouched. Writes against a
    // pinned snapshot are refused (StoreSinkSpec). At 100 TB: a version is
    // one manifest file, vacuum is O(manifests) + unreferenced deletes —
    // never a data rewrite (the sink_retention posture, now transactional).
    "q_store_time_travel" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storett")
      seedStore(s, d, path) // version 1
      withStorePath(s, path) {
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 7 WHERE grp = 'P'") // v2
        s.sql("DELETE FROM graft.store WHERE grp = 'F'") // v3 (current)
        def aggOf(src: DataFrame, v: String): DataFrame =
          src.groupBy(col("grp"))
            .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
            .select(lit(v).as("v"), col("grp"), col("n"), col("sum_cents"))
        val pre = aggOf(s.sql("SELECT * FROM graft.store VERSION AS OF 1"), "v1")
          .unionByName(aggOf(s.sql("SELECT * FROM graft.store VERSION AS OF 2"), "v2"))
          .unionByName(aggOf(s.table("graft.store"), "v3"))
          .collect()
        graft.sources.StoreSink.vacuum(path, 2)
        val v1Expired =
          try { s.sql("SELECT * FROM graft.store VERSION AS OF 1").collect(); 0L }
          catch { case _: Exception => 1L }
        val post = aggOf(s.table("graft.store"), "v4_post_vacuum").collect()
        val marker = org.apache.spark.sql.Row("v1_expired", "-", v1Expired, 0L)
        val res = (pre ++ post :+ marker).toSeq
        val schema = StructType(Seq(
          StructField("v", StringType), StructField("grp", StringType),
          StructField("n", LongType), StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(res.asJava, schema).orderBy(col("v"), col("grp"))
      }
    }),

    // TIMESTAMP AS OF — the time-travel form users actually write. Every
    // manifest swap stamps a strictly-monotone commit instant as the
    // physical list's `#ts=` ledger line (NOT file mtime — regenerated
    // data must not move history); `CALL graft.history(path)` surfaces
    // (version, ts, files, rows) from list metadata alone, and
    // `TIMESTAMP AS OF t` resolves the latest version committed ≤ t
    // through the catalog. The query reads all three generations BY THEIR
    // LEDGER INSTANTS (values never surface — content is deterministic),
    // pins that an instant predating the table fails loudly, and that
    // after a vacuum an expired generation's instant also fails loudly
    // instead of silently resolving to a later state.
    "q_store_travel_ts" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storetravelts")
      seedStore(s, d, path) // v1
      withStorePath(s, path) {
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 7 WHERE grp = 'P'") // v2
        s.sql("DELETE FROM graft.store WHERE grp = 'F'") // v3 (current)
        val hist = s.sql(s"CALL graft.history('$path')").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        val tsOf = hist.map(h => h._1 -> h._2).toMap
        def tsLit(ms: Long): String =
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
            .withZone(java.time.ZoneOffset.UTC)
            .format(java.time.Instant.ofEpochMilli(ms))
        def aggAt(ms: Long, v: String) =
          s.sql(s"SELECT * FROM graft.store TIMESTAMP AS OF '${tsLit(ms)}'")
            .groupBy(col("grp"))
            .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
            .select(lit(v).as("v"), col("grp"), col("n"), col("sum_cents"))
            .collect()
        val content = aggAt(tsOf(1), "t1") ++ aggAt(tsOf(2), "t2") ++
          aggAt(tsOf(3), "t3")
        val byV = hist.sortBy(_._1).toSeq
        val monotone = byV.zip(byV.drop(1)).forall { case (a, b) => a._2 < b._2 }
        val histOk = hist.map(_._1).toSeq.sorted == Seq(1L, 2L, 3L) &&
          monotone && hist.find(_._1 == 3L).get._3 < hist.find(_._1 == 1L).get._3
        val preLoud =
          try { s.sql(s"SELECT * FROM graft.store TIMESTAMP AS OF " +
                  s"'${tsLit(tsOf(1) - 1)}'").collect(); 0L }
          catch { case _: Exception => 1L }
        graft.sources.StoreSink.vacuum(path, 2) // v1 expires (untagged)
        val expiredLoud =
          try { s.sql(s"SELECT * FROM graft.store TIMESTAMP AS OF " +
                  s"'${tsLit(tsOf(1))}'").collect(); 0L }
          catch { case _: Exception => 1L }
        val rows = content.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_expired_loud", "-", expiredLoud, 0L),
          org.apache.spark.sql.Row("z_hist", "-", if (histOk) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_pre_epoch_loud", "-", preLoud, 0L))
        val schema = StructType(Seq(
          StructField("v", StringType), StructField("grp", StringType),
          StructField("n", LongType), StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("v"), col("grp"))
      }
    }),

    // COLUMN DEFAULTS in schema evolution (the Iceberg initial-default
    // contract): `ALTER TABLE ... ADD COLUMN x BIGINT DEFAULT 25` makes
    // every pre-ALTER row READ the default — no rewrite, the reader pads
    // short rows with the declared value instead of NULL — while an
    // explicit NULL written after the ALTER stays NULL, and an INSERT
    // that omits the column gets it filled by the analyzer
    // (CURRENT_DEFAULT metadata + the catalog's
    // SUPPORT_COLUMN_DEFAULT_VALUE capability). At 100 TB this is what
    // makes adding a populated-looking column to a petabyte table a
    // metadata operation.
    "q_store_evolve_default" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storedflt")
      val (_, maxK) = seedStore(s, d, path)
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD COLUMN fee_cents BIGINT DEFAULT 25")
        s.sql("ALTER TABLE graft.store ADD COLUMN tier STRING DEFAULT 'std'")
        // analyzer fills the omitted defaulted columns
        s.sql(s"INSERT INTO graft.store (k, grp, amt_cents) VALUES (${maxK + 1}, 'NEW', 1000)")
        // explicit values win; explicit NULL stays NULL (not the default)
        s.sql(s"INSERT INTO graft.store VALUES (${maxK + 2}, 'NEW', 2000, 99, 'gold')")
        s.sql(s"INSERT INTO graft.store VALUES (${maxK + 3}, 'NEW', 3000, NULL, NULL)")
        val res = s.table("graft.store")
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"),
               sum(col("fee_cents")).as("fee_sum"),
               sum(when(col("tier") === "std", 1L).otherwise(0L)).as("n_std"),
               sum(when(col("tier").isNull, 1L).otherwise(0L)).as("n_null"))
          .orderBy(col("grp")).collect()
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("fee_sum", LongType), StructField("n_std", LongType),
          StructField("n_null", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(java.util.Arrays.asList(res: _*), schema)
          .orderBy(col("grp"))
      }
    }),

    // METADATA INSPECTION TABLES (the Iceberg t.files/t.partitions/
    // t.history surface): manifest facts as ordinary relations —
    // `SELECT ... FROM graft.`store$partitions`` composes with joins and
    // aggregates, is served from the manifest tree only (zero data
    // reads), and is how an operator audits layout (rows per partition,
    // file counts, version history) without any bespoke tooling. Flags
    // pin cross-table consistency: files, partitions, and the table
    // itself must agree on row totals.
    "q_store_inspect" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeinspect")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", path).option("partitionedBy", "identity:grp").save()
      withStorePath(s, path) {
        val parts = s.sql(
          "SELECT part, n_rows FROM graft.`store$partitions` ORDER BY part")
          .collect()
        val files = s.sql(
          "SELECT COUNT(*) AS nf, SUM(rows) AS nr FROM graft.`store$files`")
          .collect()(0)
        val tableRows = s.table("graft.store").count()
        val partRows = parts.map(_.getLong(1)).sum
        val consistent =
          if (files.getLong(1) == tableRows && partRows == tableRows) 1L else 0L
        val nVersions = s.sql("SELECT COUNT(*) FROM graft.`store$history`")
          .collect()(0).getLong(0)
        val rows = parts.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_consistent", consistent),
          org.apache.spark.sql.Row("z_files_cover", if (files.getLong(0) >= 3) 1L else 0L),
          org.apache.spark.sql.Row("z_versions", nVersions))
        val schema = StructType(Seq(
          StructField("part", StringType), StructField("n_rows", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("part"))
      }
    }),

    // CHECK CONSTRAINTS as table metadata (the Delta contract): ALTER
    // TABLE ADD CONSTRAINT first VALIDATES existing data (a declaration
    // the table violates is refused — Spark's AddCheckConstraintExec
    // scans), then every write against the table carries the predicate —
    // a violating INSERT fails with nothing committed (two-phase commit
    // means a rejected batch leaves the manifest untouched). DROP
    // CONSTRAINT lifts the gate. Data quality enforced AT the storage
    // boundary instead of hoped-for in every producer job — at 100 TB
    // with dozens of writers, the table is the only choke point they all
    // share.
    "q_store_constraint" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storecons")
      val (_, maxK) = seedStore(s, d, path)
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD CONSTRAINT amt_nonneg CHECK (amt_cents >= 0)")
        val badAddLoud =
          try { s.sql("ALTER TABLE graft.store ADD CONSTRAINT impossible " +
                  "CHECK (k > 900000000)"); 0L }
          catch { case _: Exception => 1L }
        val badInsLoud =
          try { s.sql(s"INSERT INTO graft.store VALUES (${maxK + 1}, 'NEW', -5)"); 0L }
          catch { case _: Exception => 1L }
        s.sql(s"INSERT INTO graft.store VALUES (${maxK + 2}, 'NEW', 500)")
        s.sql("ALTER TABLE graft.store DROP CONSTRAINT amt_nonneg")
        s.sql(s"INSERT INTO graft.store VALUES (${maxK + 3}, 'NEG', -7)")
        val agg = s.table("graft.store").groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("sum_cents"))
          .collect()
        val rows = agg.toSeq ++ Seq(
          org.apache.spark.sql.Row("z_bad_add_loud", badAddLoud, 0L),
          org.apache.spark.sql.Row("z_bad_insert_loud", badInsLoud, 0L))
        val schema = StructType(Seq(
          StructField("grp", StringType), StructField("n", LongType),
          StructField("sum_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("grp"))
      }
    }),

    // Row-level UPDATE through the same protocol: one SQL statement, the
    // connector rewrites the affected generation copy-on-write. The oracle
    // applies the SET arithmetic relationally.
    "q_store_update" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeupd")
      seedStore(s, d, path)
      withStorePath(s, path) {
        s.sql("UPDATE graft.store SET amt_cents = amt_cents + 7 WHERE grp = 'P'")
        storeSummary(s, path)
      }
    }),

    "sink_retention" -> ((s, d) => {
      val base = tmp(d, "retention")
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
      (1 to 4).foreach { k =>
        orders.where(pmod(col("o_orderkey"), lit(5)) < k)
          .write.mode("overwrite").parquet(s"$base/v=$k")
      }
      val keep = 2
      val versions = fs.listStatus(new org.apache.hadoop.fs.Path(base))
        .map(_.getPath.getName).filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toInt).sorted
      versions.dropRight(keep).foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$base/v=$v"), true)
      }
      s.read.parquet(base)
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n"),
             graft.ops.Det.moneySum(col("o_totalprice")).as("sum_cents"))
        .orderBy(col("v"))
    }),

    // TOP-N PUSHDOWN + NULL-COUNT STATS: `ORDER BY k LIMIT n` plans only
    // the files whose zones could hold the top n keys — zone-edge-ordered
    // EXACT non-null coverage (rows − nullK, the new per-file null counts,
    // Iceberg's null_value_counts) widened to every overlapping zone; the
    // sort's null placement is honored (NULLS FIRST covers null-bearing
    // files first). IS [NOT] NULL on the key prunes from the same counts.
    // At 100 TB: "latest 100 by key" on a clustered table opens a couple
    // of files, not a million — and the null arithmetic is what keeps the
    // prefix SOUND instead of merely usually-right.
    "q_store_topn" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storetopn")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      withStorePath(s, path) {
        Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                  graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
          .repartitionByRange(8, col("k"))
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).save()
        s.range(101, 106) // five null-key rows, distinct amts: NULLS FIRST bait
          .select(lit(null).cast("long").as("k"), lit("z").as("grp"),
                  col("id").as("amt_cents"))
          .coalesce(1)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save()
        def store = s.table("graft.store")
        def plannedOf(v: => Unit): (Int, Int) = {
          graft.sources.StoreSink.lastTopNPlan = None
          v
          graft.sources.StoreSink.lastTopNPlan.getOrElse((-1, -1))
        }
        var ascRows: Seq[org.apache.spark.sql.Row] = Nil
        val (ta, pa) = plannedOf {
          ascRows = store.orderBy(col("k").asc).limit(12)
            .select(lit("asc").as("tag"), col("k"), col("amt_cents")).collect().toSeq
        }
        var descRows: Seq[org.apache.spark.sql.Row] = Nil
        val (td, pd) = plannedOf {
          descRows = store.orderBy(col("k").desc).limit(12)
            .select(lit("desc").as("tag"), col("k"), col("amt_cents")).collect().toSeq
        }
        graft.sources.StoreSink.lastZonePrune = None
        val nNull = store.where(col("k").isNull).count()
        val (tn, pn) = graft.sources.StoreSink.lastZonePrune.get
        val rows = ascRows ++ descRows ++ Seq(
          org.apache.spark.sql.Row("z_asc_pruned",
            if (pa < ta && pa >= 1) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_desc_pruned",
            if (pd < td && pd >= 1) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_isnull_pruned",
            if (pn == 1 && tn > 1) 1L else 0L, nNull))
        val schema = StructType(Seq(
          StructField("tag", StringType), StructField("k", LongType),
          StructField("amt_cents", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema)
          .orderBy(col("tag"), col("k").asc_nulls_first, col("amt_cents"))
      }
    }),

    // OFFSET PUSHDOWN — the pagination triple's third member on the store
    // (LIMIT prefix cut, TopN zone coverage, now OFFSET): the source drops
    // whole leading files in manifest order plus a row-skip in the boundary
    // file, so page N of a million-file table opens the page's files only.
    // OFFSET without ORDER BY picks an arbitrary row subset by SQL
    // semantics, so the oracle pins what IS deterministic: exactly m rows
    // gone, all survivors distinct (COUNT(DISTINCT k) proves no row was
    // dropped twice or duplicated), and LIMIT composition (Spark pushes
    // limit = offset + limit, then the offset).
    "q_store_offset" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storeoffset")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      withStorePath(s, path) {
        Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                  graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
          .repartitionByRange(8, col("k"))
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).save()
        def store = s.table("graft.store")
        graft.sources.StoreSink.lastOffsetPlan = None
        val a = store.offset(37)
          .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("nd"))
          .collect()(0)
        val plan37 = graft.sources.StoreSink.lastOffsetPlan
        graft.sources.StoreSink.lastOffsetPlan = None
        val b = store.offset(5000)
          .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("nd"))
          .collect()(0)
        val planBig = graft.sources.StoreSink.lastOffsetPlan
        val c = store.offset(37).limit(100).count()
        val pushed = plan37.exists { case (t, p) => p <= t && p >= 1 } &&
          planBig.exists { case (t, p) => p <= t && p >= 1 }
        val rows = Seq(
          org.apache.spark.sql.Row("off37", a.getLong(0), a.getLong(1)),
          org.apache.spark.sql.Row("off5000", b.getLong(0), b.getLong(1)),
          org.apache.spark.sql.Row("off37_lim100", c, 0L),
          org.apache.spark.sql.Row("z_off_pushed", if (pushed) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("step", StringType), StructField("n", LongType),
          StructField("n_distinct", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
      }
    }),

    // CATALOG SNAPSHOT POINTER — multi-table READ atomicity (round-11
    // verdict #2b, the publish_all upgrade path): a `_catalog` pointer
    // file pins (table → version); readers resolve the whole map in ONE
    // read and read each table AT its pinned version, so a reader racing
    // publish_all's APPLY phase sees all-old or all-new, NEVER a torn
    // pair. The query drives the worst window deterministically: the
    // onTxnSwapped hook fires between the two manifest swaps — a DIRECT
    // head read there IS torn (z_torn_direct, the Iceberg-on-HMS limit),
    // while the catalog-pinned read still returns the all-old snapshot
    // (mid_* rows == pre-publish content, oracle-pinned). publish_all's
    // last act advances the pointer, flipping catalog readers to all-new
    // in one atomic write (fin_* rows). At 100 TB this is the catalog
    // commit every lakehouse ends at: version data immutably, publish by
    // swapping one pointer.
    "q_store_txn_read" -> ((s, d) => withGraftCatalog(s) {
      val pa = tmp(d, "txnr_a"); val pb = tmp(d, "txnr_b")
      val cat = tmp(d, "txnr_cat")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      Seq(pa, pb, cat).foreach(p =>
        fsys.delete(new org.apache.hadoop.fs.Path(p), true))
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      def seed(path: String, even: Boolean): Unit = {
        val side = base.where(pmod(col("k"), lit(2)) === (if (even) 0 else 1))
        side.where(pmod(col("k"), lit(5)) =!= 0).repartition(2)
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).save()
        side.where(pmod(col("k"), lit(5)) === 0).coalesce(1)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).option("branch", "staged").save()
      }
      seed(pa, even = true); seed(pb, even = false)
      graft.sources.StoreSink.catalogSync(cat, Seq(pa, pb)) // pin v1+v1
      def catRead(): Seq[(String, Long, Long)] = {
        // ONE pointer read, then versioned reads — the snapshot contract
        val snap = graft.sources.StoreSink.readCatalogSnapshot(cat)
        Seq(("a", pa), ("b", pb)).map { case (t, p) =>
          val r = s.read.format("graft.sources.StoreSink").option("path", p)
            .option("atVersion", snap(p).toString).load()
            .agg(count(lit(1)), sum(col("amt_cents"))).collect()(0)
          (t, r.getLong(0), r.getLong(1))
        }
      }
      def headCount(p: String): Long =
        s.read.format("graft.sources.StoreSink").option("path", p).load().count()
      val headBefore = (headCount(pa), headCount(pb))
      var mid: Seq[(String, Long, Long)] = Nil
      var tornDirect = false
      graft.sources.StoreSink.onTxnSwapped = _ => {
        if (mid.isEmpty) { // after the FIRST swap only
          mid = catRead()
          tornDirect = (headCount(pa), headCount(pb)) != headBefore &&
            (headCount(pa) == headBefore._1 || headCount(pb) == headBefore._2)
        }
      }
      try s.sql(s"CALL graft.publish_all('$pa,$pb', 'staged,staged', '$cat')")
      finally graft.sources.StoreSink.onTxnSwapped = _ => ()
      val fin = catRead()
      val ptrAdvanced = graft.sources.StoreSink.readCatalogSnapshot(cat)
        .values.forall(_ >= 2)
      val rows = mid.map { case (t, n, a) =>
          org.apache.spark.sql.Row(s"mid_$t", n, a) } ++
        fin.map { case (t, n, a) =>
          org.apache.spark.sql.Row(s"fin_$t", n, a) } ++ Seq(
        org.apache.spark.sql.Row("z_ptr_advanced", if (ptrAdvanced) 1L else 0L, 0L),
        org.apache.spark.sql.Row("z_torn_direct", if (tornDirect) 1L else 0L, 0L))
      val schema = StructType(Seq(
        StructField("step", StringType), StructField("n", LongType),
        StructField("amt_sum", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
    }),

    // CATALOG-PINNED READS FROM PLAIN SQL (round-12 verdict #3): the same
    // torn-window scenario as q_store_txn_read, but the reader is an
    // ordinary SQL session — with `spark.sql.graft.store.catalog` set,
    // `graft.store` loads resolve AT the `_catalog`-pinned version, so
    // the mid-publish reads see the all-old snapshot; the UNPINNED SQL
    // read in the same window observes the tear (z_torn_sql) — exactly
    // the gap the conf closes. At 100 TB this is snapshot isolation for
    // every BI tool that only speaks SQL.
    "q_store_txn_read_sql" -> ((s, d) => withGraftCatalog(s) {
      val pa = tmp(d, "txnrsql_a"); val pb = tmp(d, "txnrsql_b")
      val cat = tmp(d, "txnrsql_cat")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      Seq(pa, pb, cat).foreach(p =>
        fsys.delete(new org.apache.hadoop.fs.Path(p), true))
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      def seed(path: String, even: Boolean): Unit = {
        val side = base.where(pmod(col("k"), lit(2)) === (if (even) 0 else 1))
        side.where(pmod(col("k"), lit(5)) =!= 0).repartition(2)
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).save()
        side.where(pmod(col("k"), lit(5)) === 0).coalesce(1)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).option("branch", "staged").save()
      }
      seed(pa, even = true); seed(pb, even = false)
      graft.sources.StoreSink.catalogSync(cat, Seq(pa, pb)) // pin v1+v1
      // SQL reads through graft.store; `pin` scopes the catalog conf —
      // materialized inside the scope, restored in finally (the
      // conf-scoped-query discipline)
      def sqlRead(pin: Boolean): Seq[(String, Long, Long)] = {
        if (pin) s.conf.set(GraftCatalog.CatalogPinKey, cat)
        try Seq(("a", pa), ("b", pb)).map { case (t, p) =>
          withStorePath(s, p) {
            val r = s.table("graft.store")
              .agg(count(lit(1)), sum(col("amt_cents"))).collect()(0)
            (t, r.getLong(0), r.getLong(1))
          }
        } finally if (pin) s.conf.unset(GraftCatalog.CatalogPinKey)
      }
      val headBefore = sqlRead(pin = false)
      var mid: Seq[(String, Long, Long)] = Nil
      var tornSql = false
      graft.sources.StoreSink.onTxnSwapped = _ => {
        if (mid.isEmpty) { // after the FIRST swap only
          mid = sqlRead(pin = true) // pinned: still the all-old snapshot
          val un = sqlRead(pin = false) // unpinned SQL: the tear
          tornSql = un != headBefore &&
            (un(0) == headBefore(0) || un(1) == headBefore(1))
        }
      }
      try s.sql(s"CALL graft.publish_all('$pa,$pb', 'staged,staged', '$cat')")
      finally graft.sources.StoreSink.onTxnSwapped = _ => ()
      val fin = sqlRead(pin = true) // pointer advanced: the all-new snapshot
      val rows = mid.map { case (t, n, a) =>
          org.apache.spark.sql.Row(s"mid_$t", n, a) } ++
        fin.map { case (t, n, a) =>
          org.apache.spark.sql.Row(s"fin_$t", n, a) } ++ Seq(
        org.apache.spark.sql.Row("z_torn_sql", if (tornSql) 1L else 0L, 0L))
      val schema = StructType(Seq(
        StructField("step", StringType), StructField("n", LongType),
        StructField("amt_sum", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
    }),

    // MULTI-TABLE ATOMIC PUBLISH (verdict r9 #8): two stores stage WAP
    // branches, `CALL graft.publish_all` folds both in ONE transaction —
    // 2PC with a coordinator decision marker. The query INJECTS a crash
    // between the two swaps (the worst window), observes the torn
    // intermediate, then `CALL graft.txn_recover` rolls the committed
    // transaction FORWARD: the final state is byte-identical to a clean
    // publish, which is the whole contract — a multi-table pipeline's
    // fact+dim go live together or not at all, even across a dead driver.
    "q_store_txn" -> ((s, d) => withGraftCatalog(s) {
      val pa = tmp(d, "txn_a"); val pb = tmp(d, "txn_b")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(pa), true)
      fsys.delete(new org.apache.hadoop.fs.Path(pb), true)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
      def seed(path: String, even: Boolean): Unit = {
        val side = base.where(pmod(col("k"), lit(2)) === (if (even) 0 else 1))
        side.where(pmod(col("k"), lit(5)) =!= 0).repartition(2)
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).save()
        side.where(pmod(col("k"), lit(5)) === 0).coalesce(1)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).option("branch", "staged").save()
      }
      seed(pa, even = true); seed(pb, even = false)
      def liveN(p: String): Long =
        s.read.format("graft.sources.StoreSink").option("path", p).load().count()
      val mainOnly = (liveN(pa), liveN(pb))
      // crash between the swaps: the decision is durable, the outcome fixed
      graft.sources.StoreSink.onTxnSwapped =
        _ => throw new RuntimeException("injected crash between swaps")
      val crashed =
        try { s.sql(s"CALL graft.publish_all('$pa,$pb', 'staged,staged')"); false }
        catch { case _: Exception => true }
        finally graft.sources.StoreSink.onTxnSwapped = _ => ()
      val first = Seq(pa, pb).min; val second = Seq(pa, pb).max
      val torn = liveN(first) > mainOnly._1.min(mainOnly._2) &&
        liveN(second) == (if (second == pa) mainOnly._1 else mainOnly._2)
      val rec = s.sql(s"CALL graft.txn_recover('$second')").collect()(0)
      s.sql(s"CALL graft.txn_recover('$first')").collect()
      val aggA = s.read.format("graft.sources.StoreSink").option("path", pa).load()
        .agg(count(lit(1)), sum(col("amt_cents"))).collect()(0)
      val aggB = s.read.format("graft.sources.StoreSink").option("path", pb).load()
        .agg(count(lit(1)), sum(col("amt_cents"))).collect()(0)
      val rows = Seq(
        org.apache.spark.sql.Row("a_rows", aggA.getLong(0), aggA.getLong(1)),
        org.apache.spark.sql.Row("b_rows", aggB.getLong(0), aggB.getLong(1)),
        org.apache.spark.sql.Row("z_crash_observed", if (crashed) 1L else 0L, 0L),
        org.apache.spark.sql.Row("z_torn_window", if (torn) 1L else 0L, 0L),
        org.apache.spark.sql.Row("z_recover_audit", rec.getLong(0), rec.getLong(1)))
      val schema = StructType(Seq(
        StructField("step", StringType), StructField("n", LongType),
        StructField("amt_sum", LongType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
    }),

    // STRING ZONE STATS (verdict r9 #5): declared trailing STRING columns
    // get truncated-prefix min/max bounds in the manifest (16-char lower
    // prefix as-is, upper prefix incremented — the Iceberg truncate
    // transform), recorded inline by the writer and compared conservatively,
    // so equality, range, AND `LIKE 'prefix%'` predicates prune FILE
    // planning on a name-clustered layout. ASCII-only by guard (Java string
    // order == UTF-8 binary order there; a non-ASCII value just makes that
    // file never prune). At 100 TB this is what cuts `WHERE url LIKE
    // 'https://a...'`-class scans over real corpora from the whole table to
    // a few files.
    "q_store_zone_str" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storezonestr")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD COLUMN name STRING")
        s.sql("ALTER TABLE graft.store SET TBLPROPERTIES " +
              "('graft.stats.cols' = 'name')")
        Tables.customer(s, d)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("grp"),
                  graft.ops.Det.cents(col("c_acctbal")).as("amt_cents"),
                  col("c_name").as("name"))
          .repartitionByRange(8, col("name")) // name-clustered: zones bite
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).save()
        def store = s.table("graft.store")
        def probe(dfq: org.apache.spark.sql.DataFrame,
                  step: String): (org.apache.spark.sql.Row, (Int, Int)) = {
          graft.sources.StoreSink.lastZonePrune = None
          val r = dfq.agg(count(lit(1)).as("n"),
            coalesce(sum(col("k")), lit(0L)).as("k_sum")).collect()(0)
          (org.apache.spark.sql.Row(step, r.getLong(0), r.getLong(1)),
            graft.sources.StoreSink.lastZonePrune.get)
        }
        val (eqRow, (t1, p1)) =
          probe(store.where(col("name") === "Customer#000000321"), "eq")
        val (likeRow, (t2, p2)) =
          probe(store.where(col("name").startsWith("Customer#00000004")), "like")
        val (ltRow, (t3, p3)) =
          probe(store.where(col("name") < "Customer#0000001"), "lt")
        val pruned = Seq((t1, p1), (t2, p2), (t3, p3))
          .forall { case (t, p) => p < t && p >= 1 }
        val allStats = graft.sources.StoreSink
          .readEntries(new org.apache.hadoop.fs.Path(path), fsys)
          .forall(_.sstats.exists(_._1 == "name"))
        val rows = Seq(eqRow, likeRow, ltRow,
          org.apache.spark.sql.Row("z_pruned", if (pruned) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_stats_inline", if (allStats) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("step", StringType), StructField("n", LongType),
          StructField("k_sum", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
      }
    }),

    // PARTITION SPEC EVOLUTION (verdict r9 #3): `CALL graft.repartition_spec`
    // registers a new spec generation — zero data bytes move. Files keep the
    // spec they were written with (`<id>~<value>` manifest tags), so a
    // mixed-generation table still PRUNES each file under its own spec
    // (bucket files answer point-key predicates, identity files answer grp
    // predicates), partition DDL refuses until a rewrite unifies, and every
    // read stays exact. At 100 TB this is Iceberg spec evolution: moving a
    // petabyte table from bucket(4) to identity partitioning must not mean
    // rewriting it — new data lands right, old data is planned right, and
    // compaction converges the layout over time.
    "q_store_part_evolve" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storepartevo")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      withStorePath(s, path) {
        val base = Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                  graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
        base.where(pmod(col("k"), lit(2)) === 0)
          .write.format("graft.sources.StoreSink").mode("overwrite")
          .option("path", path).option("partitionedBy", "bucket:4:k").save()
        val audit = s.sql(
          s"CALL graft.repartition_spec('$path', 'identity:grp')").collect()(0)
        base.where(pmod(col("k"), lit(2)) === 1)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save() // routes under the NEW spec
        def store = s.table("graft.store")
        graft.sources.StoreSink.lastZonePrune = None
        val k6 = store.where(col("k") === 6).count()
        val (t0, p0) = graft.sources.StoreSink.lastZonePrune.get
        val ddlRefused =
          try { s.sql("ALTER TABLE graft.store DROP PARTITION (grp='O')"); false }
          catch { case _: Exception => true }
        val agg = store.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("amt_cents")).as("amt_sum"))
          .select(concat(lit("grp:"), col("grp")).as("step"), col("n"),
                  col("amt_sum"))
          .collect().toSeq
        val rows = agg ++ Seq(
          org.apache.spark.sql.Row("z_k6", k6, 0L),
          org.apache.spark.sql.Row("z_prunes_mixed",
            if (p0 < t0 && p0 >= 1) 1L else 0L, 0L),
          org.apache.spark.sql.Row("z_spec_audit",
            audit.getLong(0), audit.getLong(1)),
          org.apache.spark.sql.Row("z_ddl_refused", if (ddlRefused) 1L else 0L, 0L))
        val schema = StructType(Seq(
          StructField("step", StringType), StructField("n", LongType),
          StructField("amt_sum", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
      }
    }),

    // TYPE WIDENING on a stable field id (verdict r9 #2): `ALTER COLUMN fee
    // TYPE BIGINT` promotes an int slot in place — same field id, zero file
    // rewrites (the line encoding is text: old digits parse wider), new
    // writes land 64-bit values no int could hold, and ONE read resolves
    // both generations under the widened type. Time travel still reads the
    // pre-widen generation as int (the ALTER archives the outgoing schema),
    // and narrowing back is refused — the lossy direction never exists. At
    // 100 TB this is the second-most-common ALTER in practice: an id column
    // outgrowing int must not mean rewriting a petabyte.
    "q_store_evolve_widen" -> ((s, d) => withGraftCatalog(s) {
      val path = tmp(d, "storewiden")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path), true)
      withStorePath(s, path) {
        s.sql("ALTER TABLE graft.store ADD COLUMN fee INT")
        val base = Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("grp"),
                  graft.ops.Det.cents(col("o_totalprice")).as("amt_cents"))
        base.where(pmod(col("k"), lit(2)) === 0)
          .withColumn("fee", pmod(col("k"), lit(1000)).cast("int"))
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save() // v1: int generation
        val filesBefore = graft.sources.StoreSink
          .readManifest(new org.apache.hadoop.fs.Path(path), fsys)
        s.sql("ALTER TABLE graft.store ALTER COLUMN fee TYPE BIGINT")
        val noRewrite = graft.sources.StoreSink
          .readManifest(new org.apache.hadoop.fs.Path(path), fsys) == filesBefore
        base.where(pmod(col("k"), lit(2)) === 1)
          .withColumn("fee", col("k") + lit(5000000000L)) // needs 64 bits
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", path).save() // v2: bigint generation
        val narrowRefused =
          try { s.sql("ALTER TABLE graft.store ALTER COLUMN fee TYPE INT"); false }
          catch { case _: Exception => true }
        val v1 = s.sql("SELECT * FROM graft.store VERSION AS OF 1")
        val travelInt = v1.schema.fields(3).dataType ==
          org.apache.spark.sql.types.IntegerType
        val travelSum = v1.agg(sum(col("fee").cast("long"))).collect()(0).getLong(0)
        val agg = s.table("graft.store")
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("fee")).as("fee_sum"),
               max(col("fee")).as("fee_max"))
          .select(concat(lit("grp:"), col("grp")).as("step"), col("n"),
                  col("fee_sum"), col("fee_max"))
          .collect().toSeq
        val rows = agg ++ Seq(
          org.apache.spark.sql.Row("z_no_rewrite", if (noRewrite) 1L else 0L, 0L, 0L),
          org.apache.spark.sql.Row("z_narrow_refused", if (narrowRefused) 1L else 0L, 0L, 0L),
          org.apache.spark.sql.Row("z_travel_int",
            if (travelInt) 1L else 0L, travelSum, 0L))
        val schema = StructType(Seq(
          StructField("step", StringType), StructField("n", LongType),
          StructField("fee_sum", LongType), StructField("fee_max", LongType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
      }
    }),

    // PERSISTED-INDEX INCREMENTAL MAINTENANCE (verdict r9 #1, the IVM leg):
    // the corpus is a STORE, the IVF index is built FROM it recording
    // (path, version), and after a DELETE + an append the index REFRESHES by
    // folding the corpus's own change feed under the FROZEN codebook —
    // deletes drop their posting rows, inserts assign against the persisted
    // centroids, only touched posting lists rewrite. At 100 TB this is the
    // difference between "rebuild the index nightly over the corpus" and
    // "pay for the delta": refresh cost tracks changed rows. The oracle
    // replays training on the INITIAL corpus and assignment over the FINAL
    // one — exactly what build-then-refresh must equal — so the hash gate
    // pins the whole maintenance fold, not just row counts.
    "q_store_index_refresh" -> ((s, d) => withGraftCatalog(s) {
      val corpus = tmp(d, "idxcorpus")
      val idx = tmp(d, "idxmaint")
      val fsys = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(corpus), true)
      fsys.delete(new org.apache.hadoop.fs.Path(idx), true)
      withStorePath(s, corpus) {
        s.sql("ALTER TABLE graft.store ADD COLUMN emb STRING")
        val all = Tables.embeddings(s, d).select(col("vec_id").as("k"),
            lit("e").as("grp"), lit(0L).as("amt_cents"),
            expr("array_join(transform(embedding, x -> cast(x as string)), ',')").as("emb"))
        all.where(pmod(col("k"), lit(89)) =!= 0)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", corpus).save() // v1: the initial corpus
        s.sql(s"CALL graft.index_build('$corpus', '$idx')").collect()
        def cbRows = s.read.format("graft.sources.StoreSink")
          .option("path", graft.sources.AnnIndex.codebookPath(idx)).load()
          .collect().map(_.toSeq).toSet
        val cbBefore = cbRows
        s.sql("DELETE FROM graft.store WHERE k < 25") // v2: corpus shrinks
        all.where(pmod(col("k"), lit(89)) === 0)
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", corpus).save() // v3: corpus grows
        val refreshed = s.sql(s"CALL graft.index_refresh('$idx')").collect()(0)
        val (changed, parts) = (refreshed.getLong(0), refreshed.getLong(1))
        val queries = graft.ops.TrainingOps.nzEmbeddings(s, d)
          .where(col("vec_id") < 10)
        val top = graft.sources.AnnIndex.probe(s, queries, idx)
          .select(lit("t").as("tag"), col("q_id"), col("n_id"),
                  col("score_e4"), col("rn")).collect().toSeq
        val deadLeft = s.read.format("graft.sources.StoreSink")
          .option("path", graft.sources.AnnIndex.postingsPath(idx)).load()
          .where(col("k") < 25 && col("k") =!= 0).count() // 0 re-enters via %89
        def flag(tagName: String, v: Boolean) = org.apache.spark.sql.Row(
          tagName, -1L, -1L, if (v) 1 else 0, 0)
        val rows = top ++ Seq(
          flag("z_codebook_frozen", cbRows == cbBefore),
          flag("z_delete_applied", deadLeft == 0L),
          flag("z_incremental", changed > 0 && parts >= 1))
        val schema = StructType(Seq(
          StructField("tag", StringType), StructField("q_id", LongType),
          StructField("n_id", LongType), StructField("score_e4", IntegerType),
          StructField("rn", IntegerType)))
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema)
          .orderBy(col("tag"), col("q_id"), col("rn"))
      }
    }),
  )

  override def oracles: Map[String, String] = Map(
    // exactly m rows gone, survivors distinct, limit composes
    "q_store_offset" ->
      """WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders)
        |SELECT step, n, n_distinct FROM (
        |  SELECT 'off37' AS step, n - 37 AS n, n - 37 AS n_distinct FROM t
        |  UNION ALL SELECT 'off5000', n - 5000, n - 5000 FROM t
        |  UNION ALL SELECT 'off37_lim100', 100, 0 FROM t
        |  UNION ALL SELECT 'z_off_pushed', 1, 0 FROM t) u
        |ORDER BY step""".stripMargin,

    // top-n sets are exact (keys unique; the 5 nulls all make the asc cut)
    "q_store_topn" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |nulls AS (SELECT CAST(NULL AS BIGINT) AS k, CAST(v AS BIGINT) AS amt
        |          FROM (VALUES (101),(102),(103),(104),(105)) t(v)),
        |ar AS (SELECT * FROM o UNION ALL SELECT * FROM nulls),
        |a AS (SELECT 'asc' AS tag, k, amt AS amt_cents FROM ar
        |      ORDER BY k ASC NULLS FIRST LIMIT 12),
        |d AS (SELECT 'desc' AS tag, k, amt AS amt_cents FROM ar
        |      ORDER BY k DESC NULLS LAST LIMIT 12)
        |SELECT tag, k, amt_cents FROM (
        |  SELECT * FROM a UNION ALL SELECT * FROM d
        |  UNION ALL SELECT 'z_asc_pruned', 1, 0
        |  UNION ALL SELECT 'z_desc_pruned', 1, 0
        |  UNION ALL SELECT 'z_isnull_pruned', 1, 5) u
        |ORDER BY tag, k NULLS FIRST, amt_cents""".stripMargin,

    // crash-then-recover == clean publish: full per-store totals
    // the catalog snapshot contract stated relationally: the mid-APPLY
    // catalog read is the all-old pair (main-only content), the post-
    // publish read the all-new one; the direct head read in between is
    // torn (flag) — exactly what the pointer exists to hide
    "q_store_txn_read" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT step, n, amt_sum FROM (
        |  SELECT 'mid_a' AS step, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(amt) AS BIGINT) AS amt_sum
        |  FROM o WHERE k % 2 = 0 AND k % 5 <> 0
        |  UNION ALL SELECT 'mid_b', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(amt) AS BIGINT) FROM o WHERE k % 2 = 1 AND k % 5 <> 0
        |  UNION ALL SELECT 'fin_a', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(amt) AS BIGINT) FROM o WHERE k % 2 = 0
        |  UNION ALL SELECT 'fin_b', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(amt) AS BIGINT) FROM o WHERE k % 2 = 1
        |  UNION ALL SELECT 'z_ptr_advanced', 1, 0
        |  UNION ALL SELECT 'z_torn_direct', 1, 0) t
        |ORDER BY step""".stripMargin,

    // pinned mid-reads see v1 (the 5-divisible staged rows absent), the
    // post-publish pinned reads see v2; the torn unpinned read is the flag
    "q_store_txn_read_sql" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT step, n, amt_sum FROM (
        |  SELECT 'mid_a' AS step, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(amt) AS BIGINT) AS amt_sum
        |  FROM o WHERE k % 2 = 0 AND k % 5 <> 0
        |  UNION ALL SELECT 'mid_b', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(amt) AS BIGINT) FROM o WHERE k % 2 = 1 AND k % 5 <> 0
        |  UNION ALL SELECT 'fin_a', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(amt) AS BIGINT) FROM o WHERE k % 2 = 0
        |  UNION ALL SELECT 'fin_b', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(amt) AS BIGINT) FROM o WHERE k % 2 = 1
        |  UNION ALL SELECT 'z_torn_sql', 1, 0) t
        |ORDER BY step""".stripMargin,

    "q_store_txn" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT step, n, amt_sum FROM (
        |  SELECT 'a_rows' AS step, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(amt) AS BIGINT) AS amt_sum FROM o WHERE k % 2 = 0
        |  UNION ALL SELECT 'b_rows', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(amt) AS BIGINT) FROM o WHERE k % 2 = 1
        |  UNION ALL SELECT 'z_crash_observed', 1, 0
        |  UNION ALL SELECT 'z_torn_window', 1, 0
        |  UNION ALL SELECT 'z_recover_audit', 1, 0) t
        |ORDER BY step""".stripMargin,

    // string predicates answered exactly; prune flags are structural
    "q_store_zone_str" ->
      """WITH c AS (SELECT c_custkey AS k, c_name AS name FROM customer)
        |SELECT step, n, k_sum FROM (
        |  SELECT 'eq' AS step, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(k), 0) AS BIGINT) AS k_sum
        |  FROM c WHERE name = 'Customer#000000321'
        |  UNION ALL SELECT 'like', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(k), 0) AS BIGINT)
        |  FROM c WHERE name LIKE 'Customer#00000004%'
        |  UNION ALL SELECT 'lt', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(k), 0) AS BIGINT)
        |  FROM c WHERE name < 'Customer#0000001'
        |  UNION ALL SELECT 'z_pruned', 1, 0
        |  UNION ALL SELECT 'z_stats_inline', 1, 0) t
        |ORDER BY step""".stripMargin,

    // mixed spec generations answer exactly; flags are structural
    "q_store_part_evolve" ->
      """WITH rows_all AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
        |  FROM orders),
        |agg AS (SELECT 'grp:' || grp AS step, CAST(COUNT(*) AS BIGINT) AS n,
        |          CAST(SUM(amt_cents) AS BIGINT) AS amt_sum
        |        FROM rows_all GROUP BY grp)
        |SELECT step, n, amt_sum FROM agg
        |UNION ALL SELECT 'z_k6', (SELECT COUNT(*) FROM rows_all WHERE k = 6), 0
        |UNION ALL SELECT 'z_prunes_mixed', 1, 0
        |UNION ALL SELECT 'z_spec_audit', 1, 2
        |UNION ALL SELECT 'z_ddl_refused', 1, 0
        |ORDER BY step""".stripMargin,

    // both generations under the widened type; the flags are structural
    "q_store_evolve_widen" ->
      """WITH rows_all AS (
        |  SELECT o_orderstatus AS grp,
        |    CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey % 1000
        |         ELSE o_orderkey + 5000000000 END AS fee,
        |    o_orderkey % 2 AS gen
        |  FROM orders),
        |agg AS (SELECT 'grp:' || grp AS step, CAST(COUNT(*) AS BIGINT) AS n,
        |          CAST(SUM(fee) AS BIGINT) AS fee_sum,
        |          CAST(MAX(fee) AS BIGINT) AS fee_max
        |        FROM rows_all GROUP BY grp),
        |v1sum AS (SELECT CAST(SUM(fee) AS BIGINT) AS s FROM rows_all WHERE gen = 0)
        |SELECT step, n, fee_sum, fee_max FROM agg
        |UNION ALL SELECT 'z_no_rewrite', 1, 0, 0
        |UNION ALL SELECT 'z_narrow_refused', 1, 0, 0
        |UNION ALL SELECT 'z_travel_int', 1, (SELECT s FROM v1sum), 0
        |ORDER BY step""".stripMargin,

    // build-then-refresh == train on the INITIAL corpus, assign the FINAL
    // one: the replay pins the frozen-codebook maintenance fold exactly
    "q_store_index_refresh" -> {
      import graft.ops.TrainingOps.duckCos
      val cosES = duckCos("e.embedding", "sd.c_emb")
      val cosFC1 = duckCos("f.embedding", "c1.c_emb")
      val cosQC1 = duckCos("q.q_emb", "c1.c_emb")
      val cosQN = duckCos("pr.q_emb", "asg.n_emb")
      s"""WITH e_all AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE LIST_SUM(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) > 0),
         |e AS (SELECT vec_id, embedding FROM e_all WHERE vec_id % 89 <> 0),
         |sd AS (SELECT vec_id AS c_id, embedding AS c_emb FROM e
         |       WHERE vec_id % ${graft.ops.TrainingOps.strideSql("e")} = 0),
         |a1 AS (SELECT n_id, n_emb, bucket FROM (
         |    SELECT e.vec_id AS n_id, e.embedding AS n_emb, sd.c_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY $cosES DESC, sd.c_id) AS arn
         |    FROM e CROSS JOIN sd) t WHERE arn = 1),
         |dims AS (SELECT bucket, generate_subscripts(n_emb, 1) AS idx,
         |                UNNEST(n_emb) AS v FROM a1),
         |upd AS (SELECT bucket, idx,
         |          CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS sv,
         |          COUNT(*) AS n
         |        FROM dims GROUP BY bucket, idx),
         |c1 AS (SELECT bucket AS c_id,
         |          LIST(CAST((sv / 1048576.0) / n AS REAL) ORDER BY idx) AS c_emb
         |       FROM upd GROUP BY bucket),
         |fin AS (SELECT vec_id, embedding FROM e WHERE vec_id >= 25
         |        UNION ALL SELECT vec_id, embedding FROM e_all WHERE vec_id % 89 = 0),
         |asg AS (SELECT n_id, n_emb, bucket FROM (
         |    SELECT f.vec_id AS n_id, f.embedding AS n_emb, c1.c_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY f.vec_id
         |        ORDER BY $cosFC1 DESC, c1.c_id) AS arn
         |    FROM fin f CROSS JOIN c1) t WHERE arn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e_all WHERE vec_id < 10),
         |pr AS (SELECT q_id, q_emb, bucket FROM (
         |    SELECT q.q_id, q.q_emb, c1.c_id AS bucket,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY $cosQC1 DESC, c1.c_id) AS prn
         |    FROM q CROSS JOIN c1) t WHERE prn <= 2)
         |SELECT tag, q_id, n_id, score_e4, rn FROM (
         |  SELECT 't' AS tag, q_id, n_id,
         |    CAST(ROUND(score * 10000) AS INTEGER) AS score_e4, rn FROM (
         |    SELECT pr.q_id, asg.n_id, $cosQN AS score,
         |      CAST(ROW_NUMBER() OVER (PARTITION BY pr.q_id
         |        ORDER BY $cosQN DESC, asg.n_id) AS INTEGER) AS rn
         |    FROM asg JOIN pr ON asg.bucket = pr.bucket) t WHERE rn <= 5
         |  UNION ALL SELECT 'z_codebook_frozen', -1, -1, 1, 0
         |  UNION ALL SELECT 'z_delete_applied', -1, -1, 1, 0
         |  UNION ALL SELECT 'z_incremental', -1, -1, 1, 0) u
         |ORDER BY tag, q_id, rn""".stripMargin
    },

    // first 7 rows of the filtered range, closed forms
    "src_dsv2_limit" ->
      """SELECT r.range AS id,
        |  SUBSTR('abcd', CAST(r.range % 4 AS INT) + 1, 1) AS tag,
        |  CAST(r.range * 7919 % 100000 AS BIGINT) AS val_cents
        |FROM RANGE(50000, 50007) r ORDER BY id""".stripMargin,

    // page 2: rows 10..16 of the filtered range
    "src_dsv2_offset" ->
      """SELECT r.range AS id,
        |  SUBSTR('abcd', CAST(r.range % 4 AS INT) + 1, 1) AS tag,
        |  CAST(r.range * 7919 % 100000 AS BIGINT) AS val_cents
        |FROM RANGE(50010, 50017) r ORDER BY id""".stripMargin,

    // top-5 by id desc of the bounded range
    "src_dsv2_topn" ->
      """SELECT r.range AS id,
        |  SUBSTR('abcd', CAST(r.range % 4 AS INT) + 1, 1) AS tag,
        |  CAST(r.range * 7919 % 100000 AS BIGINT) AS val_cents
        |FROM RANGE(149995, 150000) r ORDER BY id DESC""".stripMargin,

    // stats change the PLAN, never the result: plain filtered join
    "q_dsv2_stats_join" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |  CAST(SUM(l_orderkey * 7919 % 100000) AS BIGINT) AS val_cents
        |FROM lineitem WHERE l_orderkey < 2000""".stripMargin,

    // the delete predicate, inverted
    "q_store_delete" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' OR o_orderkey < 1000)
        |GROUP BY o_orderstatus ORDER BY grp""".stripMargin,

    // vector-masked and rewrite-based deletes must agree with the
    // relational form exactly; flags pin the strategy choice
    "q_store_delete_mor" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT 'mor' AS v, grp, COUNT(*) AS n,
        |  CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM base WHERE k % 101 <> 0 GROUP BY grp
        |UNION ALL
        |SELECT 'cow', grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |FROM base WHERE k % 101 <> 0 AND grp <> 'F' GROUP BY grp
        |UNION ALL SELECT 'z_absorbed', '-', 1, 0
        |UNION ALL SELECT 'z_dv', '-', 1, 0
        |UNION ALL SELECT 'z_no_rewrite', '-', 1, 0
        |ORDER BY v, grp""".stripMargin,

    // the keyed retraction applied relationally; both generations agree
    "q_store_delete_eq" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |live AS (SELECT * FROM base WHERE k % 293 <> 0),
        |agg AS (SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |        FROM live GROUP BY grp)
        |SELECT 'eq' AS v, grp, n, sum_cents FROM agg
        |UNION ALL SELECT 'compacted', grp, n, sum_cents FROM agg
        |UNION ALL SELECT 'z_absorbed', '-', 1, 0
        |UNION ALL SELECT 'z_count', '-', (SELECT COUNT(*) FROM live), 0
        |UNION ALL SELECT 'z_eq_nodata', '-', 1, 0
        |ORDER BY v, grp""".stripMargin,

    // mirror-sync applied relationally: k%3=0 rows keep their grp with
    // the bumped amount, the new key inserts, non-P rows absent from the
    // source are gone, P survivors keep their original amounts
    "q_store_merge_sync" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |fin AS (
        |  SELECT grp, amt + 5 AS amt FROM base WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT grp, amt FROM base WHERE k % 3 <> 0 AND grp = 'P'
        |  UNION ALL SELECT 'NEW', 424242)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM fin GROUP BY grp ORDER BY grp""".stripMargin,

    // zone pruning is a planning rewrite, never semantics
    "q_store_zone_read" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 999
        |GROUP BY o_orderstatus ORDER BY grp""".stripMargin,

    // compaction is a pure layout change: one content block serves both the
    // post-compact state and the pre-compact snapshot; flags are contracts
    "q_store_compact" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |a AS (SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |      FROM base GROUP BY grp)
        |SELECT 'post' AS v, grp, n, sum_cents FROM a
        |UNION ALL SELECT 'v1', grp, n, sum_cents FROM a
        |UNION ALL SELECT 'z_disjoint_zones', '-', 1, 0
        |UNION ALL SELECT 'z_fewer_files', '-', 1, 0
        |UNION ALL SELECT 'z_prune_gain', '-', 1, 0
        |ORDER BY v, grp""".stripMargin,

    // decision arithmetic replayed from the orders key bounds: file i of
    // the 4 appends spans [4·mn+i, 4·mx+i] (width 4D+1, D = mx-mn), the
    // global zone is 4D+4 wide, so overlap_e4 = (16D+4)·10000 // (4D+4);
    // post-compact the single file IS the global zone — exactly 10000
    "q_store_compact_policy" ->
      """WITH mm AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
        |                   CAST(COUNT(*) AS BIGINT) AS n FROM orders),
        |ov AS (SELECT CAST(16 * (mx - mn) + 4 AS BIGINT) * 10000
        |         // CAST(4 * (mx - mn) + 4 AS BIGINT) AS o FROM mm)
        |SELECT step, action, a, b, c FROM (
        |  SELECT 'c1' AS step, 'compact' AS action, CAST(4 AS BIGINT) AS a,
        |         (SELECT o FROM ov) AS b, CAST(1 AS BIGINT) AS c
        |  UNION ALL SELECT 'c2', 'keep', 1, 10000, 1
        |  UNION ALL SELECT 'rows', '-', (SELECT 4 * n FROM mm), 0, 0) t
        |ORDER BY step""".stripMargin,

    // both exports applied relationally; audits carry exact row counts
    // and the effective version numbers (1 = archived, head = 2)
    "q_store_export" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |v1 AS (SELECT * FROM base),
        |head AS (SELECT * FROM base WHERE grp <> 'F')
        |SELECT 'v1' AS step, grp, COUNT(*) AS n,
        |  CAST(SUM(amt) AS BIGINT) AS sum_cents FROM v1 GROUP BY grp
        |UNION ALL SELECT 'head', grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |FROM head GROUP BY grp
        |UNION ALL SELECT 'audit_v1', '-', (SELECT COUNT(*) FROM v1), 1
        |UNION ALL SELECT 'audit_head', '-', (SELECT COUNT(*) FROM head), 2
        |ORDER BY step, grp""".stripMargin,

    // layout constants + the surviving count; the hole and inversion
    // flags pin physical-ordinal semantics under merge-on-read
    "q_store_meta_cols" ->
      """SELECT step, v FROM (
        |  SELECT 'files' AS step, CAST(8 AS BIGINT) AS v
        |  UNION ALL SELECT 'rows', (SELECT COUNT(*) - 1 FROM orders)
        |  UNION ALL SELECT 'z_holes', 1
        |  UNION ALL SELECT 'z_inversions', 0) t
        |ORDER BY step""".stripMargin,

    // the audit rows are structural constants (8 seeded files, one dv
    // from the single-key delete, one missing after the damage); rows =
    // the store's live count
    "q_store_fsck" ->
      """SELECT step, entries, missing, sidecars, bad FROM (
        |  SELECT 'clean' AS step, CAST(8 AS BIGINT) AS entries,
        |         CAST(0 AS BIGINT) AS missing, CAST(1 AS BIGINT) AS sidecars,
        |         CAST(0 AS BIGINT) AS bad
        |  UNION ALL SELECT 'damaged', 8, 1, 1, 0
        |  UNION ALL SELECT 'rows',
        |    (SELECT COUNT(*) - 1 FROM orders), 0, 0, 0) t
        |ORDER BY step""".stripMargin,

    // both delta windows applied relationally (the q_store_cdf closed
    // form); audits carry exact exported row counts + the resolved head
    // version (3). 1..3 rows = update pairs (2× the updated keys' inserts
    // ... the deletes side also carries the k<50 removals)
    "q_store_export_delta" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT '1..3' AS win, 'insert' AS op, grp, COUNT(*) AS n,
        |  CAST(SUM(amt + 7) AS BIGINT) AS sum_cents
        |FROM base WHERE k BETWEEN 100 AND 999 GROUP BY grp
        |UNION ALL
        |SELECT '1..3', 'delete', grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |FROM base WHERE k < 50 OR k BETWEEN 100 AND 999 GROUP BY grp
        |UNION ALL
        |SELECT '2..3', 'delete', grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |FROM base WHERE k < 50 GROUP BY grp
        |UNION ALL SELECT 'a1..3', '-', '-',
        |  2 * (SELECT COUNT(*) FROM base WHERE k BETWEEN 100 AND 999)
        |    + (SELECT COUNT(*) FROM base WHERE k < 50), 3
        |UNION ALL SELECT 'a2..3', '-', '-',
        |  (SELECT COUNT(*) FROM base WHERE k < 50), 3
        |ORDER BY win, op, grp""".stripMargin,

    // the policy replay: compact decision arithmetic from the orders key
    // bounds (the compact_if closed form), retention/orphans audited as
    // ran-but-kept inside their century windows; versions = 4 appends +
    // the policy compact, data files = 4 archived + 1 compacted
    "q_store_maintain" ->
      """WITH mm AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
        |                   CAST(COUNT(*) AS BIGINT) AS n FROM orders),
        |ov AS (SELECT CAST(16 * (mx - mn) + 4 AS BIGINT) * 10000
        |         // CAST(4 * (mx - mn) + 4 AS BIGINT) AS o FROM mm)
        |SELECT step, action, a, b, c FROM (
        |  SELECT 'm1:compact' AS step, 'compact' AS action,
        |         CAST(4 AS BIGINT) AS a, (SELECT o FROM ov) AS b,
        |         CAST(1 AS BIGINT) AS c
        |  UNION ALL SELECT 'm1:expire', 'ok', 0, 5, 0
        |  UNION ALL SELECT 'm1:orphans', 'ok', 0, 5, 0
        |  UNION ALL SELECT 'm2:compact', 'keep', 1, 10000, 1
        |  UNION ALL SELECT 'm2:expire', 'ok', 0, 5, 0
        |  UNION ALL SELECT 'm2:orphans', 'ok', 0, 5, 0
        |  UNION ALL SELECT 'rows', '-', (SELECT 4 * n FROM mm), 0, 0) t
        |ORDER BY step""".stripMargin,

    // the retention decision replayed from the orders key distribution:
    // first tick drops k < 100, second drops nothing, the surviving
    // count/sum pin the content
    "q_store_maintain_ttl" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |stat AS (SELECT
        |    CAST(COUNT(*) FILTER (WHERE k < 100) AS BIGINT) AS dropped,
        |    CAST(COUNT(*) FILTER (WHERE k >= 100) AS BIGINT) AS kept,
        |    CAST(SUM(amt) FILTER (WHERE k >= 100) AS BIGINT) AS sc
        |  FROM base)
        |SELECT step, action, a, b FROM (
        |  SELECT 'm1:ttl' AS step, 'ok' AS action,
        |         (SELECT dropped FROM stat) AS a, (SELECT kept FROM stat) AS b
        |  UNION ALL SELECT 'm2:ttl', 'ok', 0, (SELECT kept FROM stat)
        |  UNION ALL SELECT 'rows', '-', (SELECT kept FROM stat), 0
        |  UNION ALL SELECT 'sum_cents', '-', (SELECT sc FROM stat), 0) t
        |ORDER BY step""".stripMargin,

    // content invariant under the 2-D rewrite; the three flags pin what
    // z-ordering is FOR (both axes prunable, amt strictly better than the
    // scattered layout)
    "q_store_zorder" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |a AS (SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |      FROM base GROUP BY grp)
        |SELECT 'post' AS v, grp, n, sum_cents FROM a
        |UNION ALL SELECT 'v1', grp, n, sum_cents FROM a
        |UNION ALL SELECT 'z_amt_prune_2d', '-', 1, 0
        |UNION ALL SELECT 'z_amt_prune_gain', '-', 1, 0
        |UNION ALL SELECT 'z_k_prune_2d', '-', 1, 0
        |ORDER BY v, grp""".stripMargin,

    // both statements applied relationally, then snapshot-diffed: an update
    // is its delete+insert pair, untouched rows never enter the feed
    "q_store_cdf" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT '1..3' AS win, 'insert' AS op, grp, COUNT(*) AS n,
        |  CAST(SUM(amt + 7) AS BIGINT) AS sum_cents
        |FROM base WHERE k BETWEEN 100 AND 999 GROUP BY grp
        |UNION ALL
        |SELECT '1..3', 'delete', grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |FROM base WHERE k < 50 OR k BETWEEN 100 AND 999 GROUP BY grp
        |UNION ALL
        |SELECT '2..3', 'delete', grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |FROM base WHERE k < 50 GROUP BY grp
        |UNION ALL SELECT 'flag', 'z_subset_rewrite', '-', 1, 0
        |ORDER BY win, op, grp""".stripMargin,

    // metadata-answered and row-scan aggregates must agree exactly; the
    // flags pin pushed-vs-declined
    "q_store_agg_push" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp FROM orders)
        |SELECT 'all' AS v, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM base
        |UNION ALL
        |SELECT 'filtered', COUNT(*), MIN(k), MAX(k) FROM base WHERE grp = 'F'
        |UNION ALL SELECT 'z_filtered_declined', 1, 0, 0
        |UNION ALL SELECT 'z_pushed', 1, 0, 0
        |ORDER BY v""".stripMargin,

    // the tree is a metadata layout change, never semantics: range and
    // full-table content are relational; flags pin the segment contracts
    // (appended rows: k in maxK+1..maxK+5, amt 10..50 → n=5, sum=150)
    "q_store_meta" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT 'range' AS v, grp, COUNT(*) AS n,
        |  CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM base WHERE k BETWEEN 100 AND 999 GROUP BY grp
        |UNION ALL
        |SELECT 'all', grp, COUNT(*), CAST(SUM(amt) AS BIGINT)
        |FROM base GROUP BY grp
        |UNION ALL SELECT 'all', 'NEW', 5, 150
        |UNION ALL SELECT 'z_append_reuse', '-', 1, 0
        |UNION ALL SELECT 'z_loose_tail', '-', 1, 0
        |UNION ALL SELECT 'z_point_plan', '-', 1, 0
        |UNION ALL SELECT 'z_sealed', '-', 1, 0
        |ORDER BY v, grp""".stripMargin,

    // tag pins v1 through the vacuum; untagged v2 expires loudly; current
    // state = both mutations applied; audit = (version 1, 1 tag)
    "q_store_tag" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT 'baseline' AS v, grp, COUNT(*) AS n,
        |  CAST(SUM(amt) AS BIGINT) AS sum_cents FROM base GROUP BY grp
        |UNION ALL
        |SELECT 'current', grp, COUNT(*),
        |  CAST(SUM(amt + CASE WHEN grp = 'P' THEN 7 ELSE 0 END) AS BIGINT)
        |FROM base WHERE grp <> 'F' GROUP BY grp
        |UNION ALL SELECT 'z_tag_audit', '-', 1, 1
        |UNION ALL SELECT 'z_unknown_tag_loud', '-', 1, 0
        |UNION ALL SELECT 'z_v2_expired', '-', 1, 0
        |ORDER BY v, grp""".stripMargin,

    // audit rows are closed forms (16 hash files → ceil(n/(n/4)) = 4
    // range files; one archived version + 4 live files after vacuum);
    // content is invariant under the maintenance cycle
    "q_store_call" ->
      """SELECT 'grp:' || o_orderstatus AS step, COUNT(*) AS a,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS b
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'compact', 16, 4
        |UNION ALL SELECT 'vacuum', 1, 4
        |ORDER BY step""".stripMargin,

    // the SPJ layout is a physical plan property; the join's DATA must be
    // exactly the relational join — flags pin the exchange-free plan,
    // bucket dirs, and bucket pruning
    "q_store_part" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders)
        |SELECT b.grp, COUNT(*) AS n,
        |  CAST(SUM(b.amt + d.amt * 2) AS BIGINT) AS sum_cents
        |FROM base b JOIN (SELECT k, amt FROM base WHERE k % 3 = 0) d USING (k)
        |GROUP BY b.grp
        |UNION ALL SELECT 'z_bucket_dirs', 1, 0
        |UNION ALL SELECT 'z_no_exchange', 1, 0
        |UNION ALL SELECT 'z_part_prune', 1, 0
        |ORDER BY grp""".stripMargin,

    // dropping a partition == dropping its rows relationally; flags pin
    // the metadata-only mechanics (files kept, partition listing)
    "q_store_partmgmt" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_after_trunc', COUNT(*), 0 FROM orders WHERE o_orderstatus = 'P'
        |UNION ALL SELECT 'z_files_kept', 1, 0
        |UNION ALL SELECT 'z_parts', 3, 0
        |UNION ALL SELECT 'z_show_one', 1, 0
        |ORDER BY grp""".stripMargin,

    // F reloaded with the corrected amount, O/P original; flags pin the
    // by-name survival of untouched partitions and the fresh replacement
    "q_store_dyn_overwrite" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |    + CASE WHEN o_orderstatus = 'F' THEN 11 ELSE 0 END) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_replaced_fresh', 1, 0
        |UNION ALL SELECT 'z_untouched_by_name', 1, 0
        |ORDER BY grp""".stripMargin,

    // the created table's content relationally; flags are contracts
    "q_store_ctas" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  COUNT(*) AS n_pri
        |FROM orders WHERE o_totalprice > 150000 GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_ctas_failed_loudly', 1, 0, 0
        |UNION ALL SELECT 'z_ctas_atomic', 1, 0, 0
        |UNION ALL SELECT 'z_dropped', 1, 0, 0
        |ORDER BY grp""".stripMargin,

    // the limited count is exact (Spark's Limit still runs above the
    // prefix plan); flags pin the file-prefix planning contract
    "q_store_limit_push" ->
      """SELECT 'n_limited' AS item, CAST(LEAST(100, COUNT(*)) AS BIGINT) AS v FROM orders
        |UNION ALL SELECT 'n_total', COUNT(*) FROM orders
        |UNION ALL SELECT 'z_full_when_over', 1
        |UNION ALL SELECT 'z_prefix_cut', 1
        |ORDER BY item""".stripMargin,

    // the replaced table's content relationally; flags pin atomicity
    // (failed replace leaves the table), the archived pre-replace
    // generation, and the missing-table refusal
    "q_store_rtas" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(SUM(o_orderkey % 7) AS BIGINT) AS sum_b7
        |FROM orders WHERE o_totalprice > 120000 GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_cor_created', 1, 0, 0
        |UNION ALL SELECT 'z_failed_loud', 1, 0, 0
        |UNION ALL SELECT 'z_intact_after_fail', 1, 0, 0
        |UNION ALL SELECT 'z_missing_loud', 1, 0, 0
        |UNION ALL SELECT 'z_v1_readable', 1, 0, 0
        |ORDER BY grp""".stripMargin,

    // the reloaded half carries the corrected amount, the other half is
    // original; flags pin by-name survival and single-commit atomicity
    "q_store_replace_where" ->
      """WITH cut AS (SELECT MAX(o_orderkey) // 2 AS c FROM orders)
        |SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |    + CASE WHEN o_orderkey < cut.c THEN 17 ELSE 0 END) AS BIGINT) AS sum_cents
        |FROM orders, cut GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_one_commit', 1, 0
        |UNION ALL SELECT 'z_untouched_by_name', 1, 0
        |ORDER BY grp""".stripMargin,

    // committed content untouched by the sweep; flags pin the age margin
    // and the exact orphan removal
    "q_store_orphans" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_orphans_gone', 1, 0
        |UNION ALL SELECT 'z_young_kept', 1, 0
        |ORDER BY grp""".stripMargin,

    // current content = base with grp O bumped twice; flags pin the
    // ledger-cutoff expiry, the tag pin, and the audit counts
    "q_store_expire" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |    + CASE WHEN o_orderstatus = 'O' THEN 6 ELSE 0 END) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_audit', 1, 0
        |UNION ALL SELECT 'z_tag_pinned', 1, 0
        |UNION ALL SELECT 'z_v1_expired', 1, 0
        |ORDER BY grp""".stripMargin,

    // current content = base with grp P bumped twice; flags pin the
    // property round-trip and the property-resolved retention
    "q_store_props" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |    + CASE WHEN o_orderstatus = 'P' THEN 10 ELSE 0 END) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_props_shown', 1, 0
        |UNION ALL SELECT 'z_unset_selective', 1, 0
        |UNION ALL SELECT 'z_v1_expired', 1, 0
        |UNION ALL SELECT 'z_vacuum_used_prop', 1, 0
        |ORDER BY grp""".stripMargin,

    // rollback restores v1's content exactly; flags pin the preserved
    // bad generation and the forward-commit version numbers
    "q_store_rollback" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_bad_gen_kept', 1, 0
        |UNION ALL SELECT 'z_rolled', 1, 0
        |ORDER BY grp""".stripMargin,

    // final content = base ∪ the cherry-picked good load (ids 1..50,
    // amt = 3·id → Σ = 3825); the bad load never resurfaces
    "q_store_cherry" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'A', 50, 3825
        |UNION ALL SELECT 'z_picked', 1, 0
        |UNION ALL SELECT 'z_repick_refused', 1, 0
        |ORDER BY grp""".stripMargin,

    // final state = seed ∪ published batch; the abandoned batch never
    // surfaces; flags pin isolation, audit, and GC
    "q_store_wap" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |ins AS (SELECT 'NEW' AS grp, k * 10 AS amt FROM base WHERE k % 101 = 0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM (SELECT grp, amt FROM base UNION ALL SELECT grp, amt FROM ins)
        |GROUP BY grp
        |UNION ALL SELECT 'z_abandon_gc', 1, 0
        |UNION ALL SELECT 'z_audit', 1, 0
        |UNION ALL SELECT 'z_invisible', 1, 0
        |ORDER BY grp""".stripMargin,

    // the refreshed view must equal the direct recompute of the
    // post-CDC state — expressed relationally
    "q_store_ivm" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |kept AS (SELECT grp,
        |    amt + CASE WHEN k % 97 = 0 THEN 100 ELSE 0 END AS amt
        |  FROM base WHERE k % 89 <> 0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM kept GROUP BY grp
        |UNION ALL SELECT 'NEW', 2, 333
        |UNION ALL SELECT 'z_ivm_match', 1, 0
        |ORDER BY grp""".stripMargin,

    // partitions-table rows = per-status counts; consistency flags pin
    // that files/partitions/table agree
    "q_store_inspect" ->
      """SELECT o_orderstatus AS part, COUNT(*) AS n_rows
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_consistent', 1
        |UNION ALL SELECT 'z_files_cover', 1
        |UNION ALL SELECT 'z_versions', 1
        |ORDER BY part""".stripMargin,

    // the gate's effect relationally: the violating insert never lands,
    // the valid one and the post-drop negative one do
    "q_store_constraint" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL SELECT 'NEG', 1, -7
        |UNION ALL SELECT 'NEW', 1, 500
        |UNION ALL SELECT 'z_bad_add_loud', 1, 0
        |UNION ALL SELECT 'z_bad_insert_loud', 1, 0
        |ORDER BY grp""".stripMargin,

    // defaults applied relationally: every seeded row carries the
    // declared default; the three inserts carry (default, explicit,
    // explicit-NULL) respectively
    "q_store_evolve_default" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS grp, 25 AS fee, 'std' AS tier FROM orders
        |  UNION ALL SELECT 'NEW', 25, 'std'
        |  UNION ALL SELECT 'NEW', 99, 'gold'
        |  UNION ALL SELECT 'NEW', NULL, NULL)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(fee) AS BIGINT) AS fee_sum,
        |  CAST(SUM(CASE WHEN tier = 'std' THEN 1 ELSE 0 END) AS BIGINT) AS n_std,
        |  CAST(SUM(CASE WHEN tier IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM base GROUP BY grp ORDER BY grp""".stripMargin,

    // evolution applied relationally: old rows read NULL in the new
    // column; the UPDATE's +5 reaches exactly the note-carrying rows
    // auto-evolved trailing columns applied relationally: seed rows read
    // the merged columns as NULL, both merge batches carry them
    "q_store_schema_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |ins1 AS (SELECT k + mx.maxk + 1 AS k, 'NEW' AS grp, k * 10 AS amt,
        |          'm' || CAST(k AS VARCHAR) AS note, k % 7 AS score
        |        FROM base, mx WHERE k % 101 = 0),
        |ins2 AS (SELECT k + 2 * (mx.maxk + 1) AS k, 'NEW2' AS grp,
        |          k * 11 AS amt, 'p' || CAST(k AS VARCHAR) AS note,
        |          k % 5 AS score
        |        FROM base, mx WHERE k % 103 = 0),
        |allr AS (
        |  SELECT k, grp, amt, CAST(NULL AS VARCHAR) AS note,
        |    CAST(NULL AS BIGINT) AS score FROM base
        |  UNION ALL SELECT k, grp, amt, note, score FROM ins1
        |  UNION ALL SELECT k, grp, amt, note, score FROM ins2)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents,
        |  COUNT(note) AS n_note, MAX(note) AS max_note,
        |  CAST(SUM(score) AS BIGINT) AS sum_score
        |FROM allr GROUP BY grp ORDER BY grp""".stripMargin,

    "q_store_evolve" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |ins AS (SELECT k + mx.maxk + 1 AS k, 'NEW' AS grp,
        |          k * 10 + 5 AS amt, 'n' || CAST(k AS VARCHAR) AS note
        |        FROM base, mx WHERE k % 101 = 0),
        |allr AS (
        |  SELECT k, grp, amt, CAST(NULL AS VARCHAR) AS note FROM base
        |  UNION ALL SELECT k, grp, amt, note FROM ins)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents,
        |  COUNT(note) AS n_note, MAX(note) AS max_note
        |FROM allr GROUP BY grp ORDER BY grp""".stripMargin,

    // the aggregate-derived dim join applied relationally; the flag pins
    // that the realized dim value pruned file planning at runtime
    "q_store_bloom_join" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |dim AS (SELECT DISTINCT grp AS dgrp FROM base
        |        WHERE CAST(('0x' || SUBSTR(md5(grp), 1, 2)) AS INTEGER) < 100)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM base JOIN dim ON grp = dgrp GROUP BY grp
        |UNION ALL SELECT 'z_bloom_join_pruned', 1, 0
        |ORDER BY grp""".stripMargin,

    // audit view = seed ∪ staged applied relationally; flags pin main
    // isolation, vacuum pinning, and loud resolution after publish
    "q_store_wap_read" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |ins AS (SELECT 'NEW' AS grp, k * 10 AS amt FROM base WHERE k % 101 = 0),
        |au AS (SELECT grp, amt FROM base UNION ALL SELECT grp, amt FROM ins)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM au GROUP BY grp
        |UNION ALL SELECT 'z_gone_after_publish', 1, 0
        |UNION ALL SELECT 'z_main_untouched', 1, 0
        |UNION ALL SELECT 'z_vacuum_pins', 1, 0
        |ORDER BY grp""".stripMargin,

    // the folded view == the replaced content, applied relationally; the
    // flags pin the schema-aware feed shape and the bit-for-bit fold
    "q_store_ivm_replace" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |rep AS (SELECT grp, amt * 3 AS amt FROM base WHERE k % 2 = 0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM rep GROUP BY grp
        |UNION ALL SELECT 'z_cdf_shape', 1, 0
        |UNION ALL SELECT 'z_ivm_match', 1, 0
        |ORDER BY grp""".stripMargin,

    // backfill applied relationally: audit = 8 scanned / 8 updated, zero
    // rewrites, and pruning switches on only after the analyze
    "q_store_analyze" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    o_orderkey % 1000 AS fee FROM orders)
        |SELECT 'grp:' || grp AS step, COUNT(*) AS n,
        |  CAST(SUM(fee) AS BIGINT) AS fee_sum
        |FROM base WHERE fee < 125 GROUP BY grp
        |UNION ALL SELECT 'z_analyze_audit', 8, 8
        |UNION ALL SELECT 'z_ndv_grp', 3, 0
        |UNION ALL SELECT 'z_ndv_k_close', 1, 0
        |UNION ALL SELECT 'z_no_rewrite', 1, 0
        |UNION ALL SELECT 'z_prunes_after', 1, 0
        |ORDER BY step""".stripMargin,

    // declared-column stats applied relationally: filtered content is
    // exact, MIN/MAX come from metadata, flags pin pruning + pushdown
    "q_store_zone_multi" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    o_orderkey % 1000 AS fee FROM orders)
        |SELECT 'grp:' || grp AS step, COUNT(*) AS n,
        |  CAST(SUM(fee) AS BIGINT) AS fee_sum
        |FROM base WHERE fee < 125 GROUP BY grp
        |UNION ALL SELECT 'minmax', CAST((SELECT MIN(fee) FROM base) AS BIGINT),
        |  CAST((SELECT MAX(fee) FROM base) AS BIGINT)
        |UNION ALL SELECT 'z_agg_pushed', 1, 0
        |UNION ALL SELECT 'z_stat_pruned', 1, 0
        |ORDER BY step""".stripMargin,

    // rename applied relationally: both generations' values live in ONE
    // column after the rename; the flags pin head/travel schema names and
    // that the pre-rename snapshot still sees its note values
    "q_store_evolve_rename" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp FROM orders),
        |ins1 AS (SELECT 'NEW' AS grp, 'n' || CAST(k AS VARCHAR) AS memo
        |         FROM base WHERE k % 101 = 0),
        |ins2 AS (SELECT 'NEW2' AS grp, 'm' || CAST(k AS VARCHAR) AS memo
        |         FROM base WHERE k % 103 = 0),
        |allr AS (
        |  SELECT grp, CAST(NULL AS VARCHAR) AS memo FROM base
        |  UNION ALL SELECT grp, memo FROM ins1
        |  UNION ALL SELECT grp, memo FROM ins2)
        |SELECT 'grp:' || grp AS step, COUNT(*) AS n,
        |  COUNT(memo) AS n_memo, MAX(memo) AS max_memo
        |FROM allr GROUP BY grp
        |UNION ALL SELECT 'z_head_renamed', 1, 0, '-'
        |UNION ALL SELECT 'z_travel_old_name', 1, 0, '-'
        |UNION ALL SELECT 'z_travel_notes',
        |  (SELECT COUNT(*) FROM base WHERE k % 101 = 0), 0, '-'
        |ORDER BY step""".stripMargin,

    // drop applied relationally: fee survives the dead neighbor slot in
    // every generation (+1 on NEW2 from the post-drop UPDATE); the re-added
    // note reads NULL everywhere (no resurrection); travel still sees the
    // pre-drop column
    "q_store_evolve_drop" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp FROM orders),
        |ins1 AS (SELECT 'NEW' AS grp, k % 7 AS fee FROM base WHERE k % 101 = 0),
        |ins2 AS (SELECT 'NEW2' AS grp, k % 5 + 1 AS fee FROM base WHERE k % 103 = 0),
        |allr AS (
        |  SELECT grp, CAST(NULL AS BIGINT) AS fee FROM base
        |  UNION ALL SELECT grp, fee FROM ins1
        |  UNION ALL SELECT grp, fee FROM ins2)
        |SELECT 'grp:' || grp AS step, COUNT(*) AS n,
        |  CAST(SUM(fee) AS BIGINT) AS fee_sum, CAST(0 AS BIGINT) AS n_note
        |FROM allr GROUP BY grp
        |UNION ALL SELECT 'z_head_schema', 1, 0, 0
        |UNION ALL SELECT 'z_travel_schema', 1, 0, 0
        |UNION ALL SELECT 'z_travel_notes',
        |  (SELECT COUNT(*) FROM base WHERE k % 101 = 0), 0, 0
        |ORDER BY step""".stripMargin,

    // bloom pruning is a planning rewrite; the absent value plans 0 files
    // and reads 0 rows, the rare value's content is exact
    "q_store_bloom_read" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_orderstatus = 'P' GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_absent_rows', 0, 0
        |UNION ALL SELECT 'z_bloom_present', 1, 0
        |UNION ALL SELECT 'z_bloom_pruned', 1, 0
        |ORDER BY grp""".stripMargin,

    // each snapshot's state applied relationally; v1 expires after vacuum
    "q_store_time_travel" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt
        |  FROM orders),
        |v1 AS (SELECT 'v1' AS v, grp, COUNT(*) AS n,
        |         CAST(SUM(amt) AS BIGINT) AS sum_cents FROM base GROUP BY grp),
        |v2 AS (SELECT 'v2', grp, COUNT(*),
        |         CAST(SUM(amt + CASE WHEN grp = 'P' THEN 7 ELSE 0 END) AS BIGINT)
        |       FROM base GROUP BY grp),
        |v3 AS (SELECT 'v3', grp, COUNT(*),
        |         CAST(SUM(amt + CASE WHEN grp = 'P' THEN 7 ELSE 0 END) AS BIGINT)
        |       FROM base WHERE grp <> 'F' GROUP BY grp),
        |v4 AS (SELECT 'v4_post_vacuum', grp, COUNT(*),
        |         CAST(SUM(amt + CASE WHEN grp = 'P' THEN 7 ELSE 0 END) AS BIGINT)
        |       FROM base WHERE grp <> 'F' GROUP BY grp)
        |SELECT * FROM v1 UNION ALL SELECT * FROM v2
        |UNION ALL SELECT * FROM v3 UNION ALL SELECT * FROM v4
        |UNION ALL SELECT 'v1_expired', '-', 1, 0
        |ORDER BY v, grp""".stripMargin,

    // ledger instants never surface — each generation's content applied
    // relationally; boundary and post-vacuum probes fail loudly
    "q_store_travel_ts" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders),
        |t1 AS (SELECT 't1' AS v, grp, COUNT(*) AS n,
        |         CAST(SUM(amt) AS BIGINT) AS sum_cents FROM base GROUP BY grp),
        |t2 AS (SELECT 't2', grp, COUNT(*),
        |         CAST(SUM(amt + CASE WHEN grp = 'P' THEN 7 ELSE 0 END) AS BIGINT)
        |       FROM base GROUP BY grp),
        |t3 AS (SELECT 't3', grp, COUNT(*),
        |         CAST(SUM(amt + CASE WHEN grp = 'P' THEN 7 ELSE 0 END) AS BIGINT)
        |       FROM base WHERE grp <> 'F' GROUP BY grp)
        |SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3
        |UNION ALL SELECT 'z_expired_loud', '-', 1, 0
        |UNION ALL SELECT 'z_hist', '-', 1, 0
        |UNION ALL SELECT 'z_pre_epoch_loud', '-', 1, 0
        |ORDER BY v, grp""".stripMargin,

    // UPDATE's SET arithmetic applied relationally
    "q_store_update" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |           + CASE WHEN o_orderstatus = 'P' THEN 7 ELSE 0 END) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus ORDER BY grp""".stripMargin,

    // native MERGE INTO must agree bit for bit with the primitive form
    "q_store_merge_sql" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
        |  FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |merged AS (
        |  SELECT k, grp, amt_cents FROM base
        |  WHERE k % 89 <> 0 AND k % 97 <> 0
        |  UNION ALL
        |  SELECT k, grp, amt_cents + 100 FROM base
        |  WHERE k % 97 = 0 AND k % 89 <> 0
        |  UNION ALL
        |  SELECT k + mx.maxk + 1, 'NEW', k * 10 FROM base, mx
        |  WHERE k % 101 = 0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt_cents) AS BIGINT) AS sum_cents
        |FROM merged GROUP BY grp ORDER BY grp""".stripMargin,

    // survivors = even amounts; the flag pins the zero-rewrite layout
    "q_store_delete_delta" ->
      """SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS sum_cents
        |FROM (SELECT o_orderstatus AS grp,
        |        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt FROM orders) t
        |WHERE amt % 2 = 0 GROUP BY grp
        |UNION ALL SELECT 'z_no_rewrite', 1, 0
        |ORDER BY grp""".stripMargin,

    // the delta-protocol MERGE must agree bit for bit with both others
    "q_store_merge_delta" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
        |  FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |merged AS (
        |  SELECT k, grp, amt_cents FROM base
        |  WHERE k % 89 <> 0 AND k % 97 <> 0
        |  UNION ALL
        |  SELECT k, grp, amt_cents + 100 FROM base
        |  WHERE k % 97 = 0 AND k % 89 <> 0
        |  UNION ALL
        |  SELECT k + mx.maxk + 1, 'NEW', k * 10 FROM base, mx
        |  WHERE k % 101 = 0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt_cents) AS BIGINT) AS sum_cents
        |FROM merged GROUP BY grp ORDER BY grp""".stripMargin,

    // CDC applied relationally: survivors + updated versions + inserts
    "q_store_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
        |  FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |merged AS (
        |  SELECT k, grp, amt_cents FROM base
        |  WHERE k % 89 <> 0 AND k % 97 <> 0
        |  UNION ALL
        |  SELECT k, grp, amt_cents + 100 FROM base
        |  WHERE k % 97 = 0 AND k % 89 <> 0
        |  UNION ALL
        |  SELECT k + mx.maxk + 1, 'NEW', k * 10 FROM base, mx
        |  WHERE k % 101 = 0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt_cents) AS BIGINT) AS sum_cents
        |FROM merged GROUP BY grp ORDER BY grp""".stripMargin,

    // last-writer-wins per key across the two waves, stated relationally
    "s_store_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
        |  FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |fin AS (
        |  SELECT k,
        |    CASE WHEN k % 6 = 0 THEN 'W2'
        |         WHEN k % 4 = 0 THEN 'W1' ELSE grp END AS grp,
        |    CASE WHEN k % 6 = 0 THEN k * 5 + 2
        |         WHEN k % 4 = 0 THEN k * 3 + 1 ELSE amt_cents END AS amt_cents
        |  FROM base
        |  UNION ALL
        |  SELECT k + mx.maxk + 1, 'NEW', k * 7 FROM base, mx
        |  WHERE k % 101 = 0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt_cents) AS BIGINT) AS sum_cents
        |FROM fin GROUP BY grp
        |UNION ALL
        |SELECT 'z_incremental', 1, 0
        |ORDER BY grp""".stripMargin,

    // same two-wave closed form; the flag pins the merge-on-read layout
    "s_store_upsert_delta" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS grp,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS amt_cents
        |  FROM orders),
        |mx AS (SELECT MAX(k) AS maxk FROM base),
        |fin AS (
        |  SELECT k,
        |    CASE WHEN k % 6 = 0 THEN 'W2'
        |         WHEN k % 4 = 0 THEN 'W1' ELSE grp END AS grp,
        |    CASE WHEN k % 6 = 0 THEN k * 5 + 2
        |         WHEN k % 4 = 0 THEN k * 3 + 1 ELSE amt_cents END AS amt_cents
        |  FROM base
        |  UNION ALL
        |  SELECT k + mx.maxk + 1, 'NEW', k * 7 FROM base, mx
        |  WHERE k % 101 = 0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt_cents) AS BIGINT) AS sum_cents
        |FROM fin GROUP BY grp
        |UNION ALL
        |SELECT 'z_no_rewrite', 1, 0
        |ORDER BY grp""".stripMargin,

    // the store's two commits must reconstruct exactly the source table
    "sink_dsv2" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus ORDER BY grp""".stripMargin,

    // the function's closed form inlined
    "q_catalog_fn" ->
      """WITH r AS (SELECT UNNEST(GENERATE_SERIES(0, 49999)) AS id)
        |SELECT SUBSTR('abcd', CAST(id % 4 AS INTEGER) + 1, 1) AS tag,
        |  COUNT(*) AS n,
        |  CAST(SUM(id * 13 % 1000) AS BIGINT) AS amt_sum
        |FROM r GROUP BY 1 ORDER BY tag""".stripMargin,

    // the two planned buckets' closed forms; flags are plan contracts
    "src_dsv2_v2filter" ->
      """WITH g AS (SELECT 'g' || CAST(x % 8 AS VARCHAR) AS grp,
        |    x * 13 % 1000 AS amt
        |  FROM (SELECT UNNEST(GENERATE_SERIES(0, 39999)) AS x))
        |SELECT grp, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS amt_sum
        |FROM g WHERE grp IN ('g2', 'g5') GROUP BY grp
        |UNION ALL SELECT 'z_empty_domain_zero_parts', 1, 0
        |UNION ALL SELECT 'z_filter_gone', 1, 0
        |UNION ALL SELECT 'z_pruned_2_of_8', 1, 0
        |ORDER BY grp""".stripMargin,

    // the checksum's exact arithmetic in SQL (Lehmer hash summed per
    // group); the flag pins compaction invariance
    "q_catalog_agg_fn" ->
      """WITH base AS (SELECT o_orderstatus AS g,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS a FROM orders)
        |SELECT g AS grp, COUNT(*) AS n,
        |  CAST(SUM((a % 2147483647 + 2147483647) % 2147483647
        |           * 48271 % 2147483647) AS BIGINT) AS cksum
        |FROM base GROUP BY g
        |UNION ALL SELECT 'z_stable_under_compact', 1, 0
        |ORDER BY grp""".stripMargin,

    // the namespaced table's content relationally; flags are DDL contracts
    "q_catalog_ns" ->
      """SELECT o_orderstatus AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_totalprice > 100000 GROUP BY o_orderstatus
        |UNION ALL SELECT 'z_drop_nonempty_loud', 1, 0
        |UNION ALL SELECT 'z_dropped', 1, 0
        |UNION ALL SELECT 'z_ns_listed', 1, 0
        |UNION ALL SELECT 'z_prop_kept', 1, 0
        |UNION ALL SELECT 'z_tbl_listed', 1, 0
        |ORDER BY grp""".stripMargin,

    // same closed forms as the connector oracles, through the catalog name
    "src_catalog" ->
      """WITH r AS (SELECT UNNEST(GENERATE_SERIES(100000, 159999)) AS id)
        |SELECT SUBSTR('abcd', CAST(id % 4 AS INTEGER) + 1, 1) AS tag,
        |  COUNT(*) AS n,
        |  CAST(SUM(id * 7919 % 100000) AS BIGINT) AS val_cents
        |FROM r GROUP BY 1 ORDER BY tag""".stripMargin,

    // the SPJ is a layout-driven plan change, never semantics — closed forms
    "q_join_spj" ->
      """WITH a AS (
        |  SELECT 'g' || CAST(x % 8 AS VARCHAR) AS grp, x * 13 % 1000 AS amt
        |  FROM (SELECT UNNEST(GENERATE_SERIES(0, 39999)) AS x)),
        |b AS (
        |  SELECT 'g' || CAST(x % 8 AS VARCHAR) AS grp, x * 13 % 1000 AS dim_amt
        |  FROM (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS x))
        |SELECT a.grp, COUNT(*) AS n, CAST(SUM(a.amt + b.dim_amt) AS BIGINT) AS total
        |FROM a JOIN b ON a.grp = b.grp
        |GROUP BY a.grp ORDER BY a.grp""".stripMargin,

    // same closed forms as src_dsv2's oracle, restricted to the dim keys
    "src_dsv2_runtime" ->
      """WITH dim AS (
        |  SELECT UNNEST(GENERATE_SERIES(0, 175000, 25000)) AS id),
        |keys AS (SELECT id FROM dim WHERE id % 3 = 0)
        |SELECT COUNT(*) AS n,
        |  CAST(SUM(id * 7919 % 100000) AS BIGINT) AS val_cents,
        |  MIN(id) AS min_id, MAX(id) AS max_id
        |FROM keys""".stripMargin,

    "src_csv" ->
      """SELECT c_custkey, c_name, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "src_json" ->
      """SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "sink_parquet_part" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |WHERE YEAR(o_orderdate) BETWEEN 1996 AND 1998
        |GROUP BY YEAR(o_orderdate)
        |ORDER BY yr""".stripMargin,

    "src_json_corrupt" ->
      """SELECT CASE WHEN o_orderkey % 7 = 0 THEN '_corrupt' ELSE o_orderstatus END AS status,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    "src_schema_evolve" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS batch,
        |  o_orderkey,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,

    "src_orc" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |  MAX(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "sink_compact" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "sink_sorted" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-06-01' AND o_orderdate < TIMESTAMP '1997-09-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "src_xml" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "sink_part_overwrite" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1997
        |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2
        |    ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,

    "src_jdbc" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 10 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // both exports re-ingested: every group exactly doubled
    "sink_csv_json" ->
      """SELECT l_returnflag, 2 * COUNT(*) AS n2x, 2 * SUM(l_quantity) AS qty2x
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "src_text" ->
      """SELECT CAST(LENGTH(text) AS INTEGER) AS line_len, COUNT(*) AS n
        |FROM documents GROUP BY 1 ORDER BY line_len""".stripMargin,

    // pure-ASCII corpus (verified r2): chars = bytes on both sides
    "src_binary" ->
      """SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_bytes,
        |  CAST(LENGTH(text) AS BIGINT) AS content_bytes
        |FROM documents WHERE doc_id < 24 ORDER BY doc_id""".stripMargin,

    // NTILE(8) with the (c, o_orderkey) total order matches DistRank's
    // exact ntile arithmetic (first n%k buckets take ceil(n/k) rows)
    "sink_range_cluster" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders),
        |b AS (
        |  SELECT o_orderkey, c,
        |    CAST(NTILE(8) OVER (ORDER BY c, o_orderkey) AS INT) AS bucket
        |  FROM o),
        |z AS (
        |  SELECT bucket, COUNT(*) AS n, MIN(c) AS min_c, MAX(c) AS max_c
        |  FROM b GROUP BY bucket)
        |SELECT bucket, n, min_c, max_c,
        |  (LAG(max_c) OVER (ORDER BY bucket) IS NULL
        |   OR min_c >= LAG(max_c) OVER (ORDER BY bucket)) AS disjoint
        |FROM z ORDER BY bucket""".stripMargin,

    "sink_snapshot" ->
      """WITH v2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END AS st,
        |    CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS tp
        |  FROM orders)
        |SELECT 1 AS v, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'X' THEN 1 ELSE 0 END) AS BIGINT) AS n_flipped,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |UNION ALL
        |SELECT 2, COUNT(*),
        |  CAST(SUM(CASE WHEN st = 'X' THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CAST(ROUND(tp * 100) AS BIGINT)) AS BIGINT)
        |FROM v2
        |ORDER BY v""".stripMargin,

    "src_dsv2" ->
      """WITH g AS (
        |  SELECT r.range AS id,
        |    (r.range * 7919 % 100000) / 100.0 AS val,
        |    SUBSTR('abcd', CAST(r.range % 4 AS INT) + 1, 1) AS tag
        |  FROM RANGE(50000, 150000) r)
        |SELECT tag, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM g WHERE tag <> 'd'
        |GROUP BY tag ORDER BY tag""".stripMargin,

    // the fused self-join = the range intersection [30000, 60000), every
    // column a closed form of id; the flag pins the collapsed plan
    "q_join_pushdown" ->
      """WITH g AS (
        |  SELECT r.range AS jid,
        |    (r.range * 7919 % 100000) / 100.0 AS va,
        |    SUBSTR('abcd', CAST(r.range % 4 AS INT) + 1, 1) AS tb
        |  FROM RANGE(30000, 60000) r)
        |SELECT COUNT(*) AS n, MIN(jid) AS min_id, MAX(jid) AS max_id,
        |  CAST(SUM(CAST(ROUND(va * 100) AS BIGINT)) AS BIGINT) AS val_cents,
        |  CAST(SUM(CASE WHEN tb = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_tag_a,
        |  CAST(1 AS BIGINT) AS z_fused
        |FROM g""".stripMargin,

    "src_dsv2_agg" ->
      """SELECT COUNT(*) AS n, MIN(r.range) AS min_id, MAX(r.range) AS max_id
        |FROM RANGE(50000, 180000) r""".stripMargin,

    // the LCG keep-rule with the query's literals: M = 2^31-1, a =
    // 1103515245, seed 42, keep when hash < 0.1*M — the exact sampled set
    "src_dsv2_sample" ->
      """WITH g AS (
        |  SELECT r.range AS id,
        |    (r.range * 7919 % 100000) / 100.0 AS val,
        |    SUBSTR('abcd', CAST(r.range % 4 AS INT) + 1, 1) AS tag
        |  FROM RANGE(100000, 600000) r
        |  WHERE ((r.range % 2147483647) * 1103515245 + 42) % 2147483647
        |          < 214748364)
        |SELECT tag, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS BIGINT) AS val_cents,
        |  MIN(id) AS min_id, MAX(id) AS max_id
        |FROM g GROUP BY tag ORDER BY tag""".stripMargin,

    // Only the two newest snapshots survive retention.
    "sink_retention" ->
      """SELECT 3 AS v, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_orderkey % 5 < 3
        |UNION ALL
        |SELECT 4, COUNT(*),
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |FROM orders WHERE o_orderkey % 5 < 4
        |ORDER BY v""".stripMargin,
  )
}
