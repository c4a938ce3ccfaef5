package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY phase profiler for the optimization round — NOT registered
  * anywhere; run via `sbt "runMain graft.sources.Scratch <which>"`. Deleted before
  * round close. */
object Scratch {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  private def run(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.getOrElse("bm25") match {
      case "bm25" => bm25(spark, sfDir)
      case "bm25build" => bm25build(spark, sfDir)
      case "pairs" => pairs(spark, sfDir)
      case "substr" => substr(spark, sfDir)
      case "tws" => tws(spark, sfDir)
      case "shj" => shj(spark, sfDir)
      case "assign" => assignBench(spark, sfDir)
      case "contain" => contain(spark, sfDir)
      case "ivfbuild" => ivfBuild(spark, sfDir)
      case "maxsim" => maxsim(spark, sfDir)
      case "ivf" => ivf(spark, sfDir)
      case w => println(s"unknown: $w")
    }
    spark.stop()
  }

  def bm25(s: SparkSession, d: String): Unit = {
    val ti = graft.sources.TextIndex
    ti.build(s, graft.Tables.documents(s, d).select(col("doc_id"), col("text")),
      "target/tmp/scratch_bm25w") // warm
    for (i <- 1 to 2) {
      val idx = s"target/tmp/scratch_bm25_$i"
      t(s"build#$i") { ti.build(s,
        graft.Tables.documents(s, d).select(col("doc_id"), col("text")), idx) }
      t(s"terms_adhoc#$i") {
        val tf = graft.Tables.documents(s, d)
          .select(col("doc_id"), explode(split(trim(lower(col("text"))), " ")).as("t"))
          .where(col("t") =!= "")
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
        val terms = tf.where(length(col("t")) >= 4)
          .groupBy(col("t")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("t")).limit(3)
          .collect().map(_.getString(0)).toSeq
        println(s"  adhoc terms: $terms")
      }
      val terms = t(s"terms_dict#$i") {
        val ts = ti.terms(s, idx).where(length(col("t")) >= 4)
          .orderBy(col("df").desc, col("t")).limit(3)
          .collect().map(_.getString(0)).toSeq
        println(s"  dict terms:  $ts")
        ts
      }
      t(s"probeOr#$i") { ti.probeOr(s, idx, terms, topk = 15).collect() }
      t(s"probeTop#$i") { run(ti.probeTop(s, idx, topk = 20)) }
      t(s"probeTopN#$i") { ti.probeTopN(s, idx, topk = 10).collect() }
    }
  }

  /** Mimic TextIndex.build's stages with timers (no publish/locks). */
  def bm25build(s: SparkSession, d: String): Unit = {
    val Fmt = "graft.sources.StoreSink"
    import org.apache.spark.sql.types._
    val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
    // warm
    graft.sources.TextIndex.build(s, docs, "target/tmp/scratch_bldw")
    for (i <- 1 to 2) {
      val root = s"target/tmp/scratch_bld_$i"
      val tok = docs.select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), " ")).as(Seq("p0", "t")))
        .select(col("doc_id"), col("t"), (col("p0") + 1).as("pos"))
      val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val dlen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val tfd = t(s"tfd_ckpt#$i") { tf.join(dlen, "doc_id").localCheckpoint() }
      val st = t(s"stats#$i") {
        dlen.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).collect()(0) }
      val (nd, tl) = (st.getLong(0), math.max(st.getLong(1), 1L))
      val nShards = 16
      val plPath = s"$root/postings"
      val plRoot = new org.apache.hadoop.fs.Path(plPath)
      val fsys = graft.sources.StoreSink.fs(plRoot)
      graft.sources.StoreSink.writeExtras(plRoot, fsys,
        graft.sources.StoreSink.extrasOf(Seq(
          StructField("term", StringType), StructField("dl", LongType),
          StructField("imp", LongType))))
      graft.sources.StoreSink.setProp(plPath,
        graft.sources.StoreSink.StatColsProp, "imp")
      val plCols = Seq(col("doc_id").as("k"),
        concat(lit("b"), pmod(hash(col("t")), lit(nShards)).cast("string")).as("grp"),
        col("tf").as("amt_cents"), col("t").as("term"), col("dl"),
        expr(s"""cast(round(1e4 * (tf * (1.2 + 1.0))
                |  / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * $nd / cast(${tl}L as double))))
                |as bigint)""".stripMargin).as("imp"))
      t(s"postings_write#$i") {
        tfd.select(plCols: _*)
          .write.format(Fmt).mode("append").option("path", plPath)
          .option("partitionedBy", "identity:grp")
          .option("orderedBy", "imp")
          .option("writeTasks", "64").save()
      }
      val tmPath = s"$root/terms"
      val tmRoot = new org.apache.hadoop.fs.Path(tmPath)
      graft.sources.StoreSink.writeExtras(tmRoot, fsys,
        graft.sources.StoreSink.extrasOf(Seq(StructField("term", StringType))))
      t(s"terms_write#$i") {
        tfd.groupBy(col("t")).agg(count(lit(1)).as("df"))
          .select(xxhash64(col("t")).as("k"),
            concat(lit("b"), pmod(hash(col("t")), lit(nShards)).cast("string")).as("grp"),
            col("df").as("amt_cents"), col("t").as("term"))
          .write.format(Fmt).mode("append").option("path", tmPath)
          .option("partitionedBy", "identity:grp").save()
      }
      t(s"manifest_sums#$i") {
        (graft.sources.StoreSink.readEntries(tmRoot, fsys).map(_.rows).sum,
         graft.sources.StoreSink.readEntries(plRoot, fsys).map(_.rows).sum)
      }
      // variant: postings write with fewer write tasks
      val pl2 = s"$root/postings2"
      val plRoot2 = new org.apache.hadoop.fs.Path(pl2)
      graft.sources.StoreSink.writeExtras(plRoot2, fsys,
        graft.sources.StoreSink.extrasOf(Seq(
          StructField("term", StringType), StructField("dl", LongType),
          StructField("imp", LongType))))
      graft.sources.StoreSink.setProp(pl2,
        graft.sources.StoreSink.StatColsProp, "imp")
      t(s"postings_write_32t#$i") {
        tfd.select(plCols: _*)
          .write.format(Fmt).mode("append").option("path", pl2)
          .option("partitionedBy", "identity:grp")
          .option("orderedBy", "imp")
          .option("writeTasks", "32").save()
      }
    }
  }

  /** Pair-mining reshape microbenchmark: basket self-join vs collect_set +
    * double-explode (map-side pair generation). */
  def pairs(s: SparkSession, d: String): Unit = {
    def li = graft.Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))
    def variantA = {
      val bi = li.distinct()
      bi.select(col("o"), col("i").as("ia"))
        .join(bi.select(col("o"), col("i").as("ib")), Seq("o"))
        .where(col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("sp"))
        .where(col("sp") >= 2)
    }
    def variantB = {
      val baskets = li.groupBy(col("o")).agg(collect_set(col("i")).as("xs"))
      baskets.select(explode(col("xs")).as("ia"), col("xs"))
        .select(col("ia"), explode(col("xs")).as("ib"))
        .where(col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("sp"))
        .where(col("sp") >= 2)
    }
    def docEdgesA = {
      val tok = graft.Tables.documents(s, d)
        .select(col("doc_id"),
                explode(array_distinct(split(trim(lower(col("text"))), " "))).as("t"))
        .where(length(col("t")) >= 4)
      tok.select(col("doc_id"), col("t").as("u"))
        .join(tok.select(col("doc_id"), col("t").as("v")), Seq("doc_id"))
        .where(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_co"))
        .where(col("n_co") >= 3).select(col("u"), col("v"))
    }
    def docEdgesB = {
      graft.Tables.documents(s, d)
        .select(array_distinct(split(trim(lower(col("text"))), " ")).as("xs"))
        .select(explode(col("xs")).as("u"), col("xs"))
        .where(length(col("u")) >= 4)
        .select(col("u"), explode(col("xs")).as("v"))
        .where(length(col("v")) >= 4 && col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_co"))
        .where(col("n_co") >= 3).select(col("u"), col("v"))
    }
    run(variantA); run(variantB); run(docEdgesA); run(docEdgesB) // warm
    for (i <- 1 to 2) {
      t(s"liPairs_selfjoin#$i") { run(variantA) }
      t(s"liPairs_explode#$i") { run(variantB) }
      t(s"docEdges_selfjoin#$i") { run(docEdgesA) }
      t(s"docEdges_explode#$i") { run(docEdgesB) }
    }
    val a = variantA.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = variantB.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"liPairs equal: ${a == b} (${a.size} vs ${b.size})")
    val ea = docEdgesA.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val eb = docEdgesB.collect().map(r => (r.getString(0), r.getString(1))).toSet
    println(s"docEdges equal: ${ea == eb} (${ea.size} vs ${eb.size})")
  }

  /** q_substr_dedup variants: df-join vs per-(gh,doc) aggregate + window. */
  def substr(s: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    def grams = graft.Tables.documents(s, d)
      .select(col("doc_id"), explode(graft.functions.TextHashes.shinglesAll(8)(
        split(trim(col("text")), " "))).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gh"))
    def vA = {
      val df = grams.distinct().groupBy(col("gh")).agg(count(lit(1)).as("df"))
      grams.join(df, "gh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
             sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_spans"), col("n_dup"),
                expr("n_dup * 10000 div n_spans").as("dup_frac_e4"))
        .orderBy(col("doc_id"))
    }
    def vB = {
      val gcount = grams.groupBy(col("gh"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      gcount.withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_spans"),
             sum(when(col("df") >= 2, col("c")).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_spans"), col("n_dup"),
                expr("n_dup * 10000 div n_spans").as("dup_frac_e4"))
        .orderBy(col("doc_id"))
    }
    run(vA); run(vB)
    for (i <- 1 to 2) {
      t(s"substr_join#$i") { run(vA) }
      t(s"substr_window#$i") { run(vB) }
    }
    val a = vA.collect().map(_.toSeq).toSet
    val b = vB.collect().map(_.toSeq).toSet
    println(s"substr equal: ${a == b} (${a.size} vs ${b.size})")
  }

  /** s_tws_timers with/without RocksDB changelog checkpointing. */
  def tws(s: SparkSession, d: String): Unit = {
    val fn = graft.SparkEntry.queries("s_tws_timers")
    val clKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    run(fn(s, d)) // warm
    for (i <- 1 to 2) {
      t(s"tws_default#$i") { run(fn(s, d)) }
      s.conf.set(clKey, "true")
      try t(s"tws_changelog#$i") { run(fn(s, d)) }
      finally s.conf.unset(clKey)
    }
  }

  /** Join-heavy queries with/without preferSortMergeJoin. */
  def shj(s: SparkSession, d: String): Unit = {
    val names = Seq("q_join_inner", "q_join_star5", "q_join_left",
      "q_join_full", "q_join_theta", "q_agg_q1", "q_er_join",
      "q_hits_cached", "q_cdc_merge", "q_window_funnel", "q_dedup_contain",
      "q_knn_graph")
    val key = "spark.sql.join.preferSortMergeJoin"
    names.foreach(n => run(graft.SparkEntry.queries(n)(s, d))) // warm
    for (i <- 1 to 2) {
      val tSmj = names.map { n =>
        val t0 = System.nanoTime()
        run(graft.SparkEntry.queries(n)(s, d))
        (n, (System.nanoTime() - t0) / 1e9)
      }
      s.conf.set(key, "false")
      val tShj = try names.map { n =>
        val t0 = System.nanoTime()
        run(graft.SparkEntry.queries(n)(s, d))
        (n, (System.nanoTime() - t0) / 1e9)
      } finally s.conf.unset(key)
      tSmj.zip(tShj).foreach { case ((n, a), (_, b)) =>
        println(f"PHASE $n%-24s smj $a%7.3f  shj $b%7.3f  (#$i)")
      }
    }
  }

  /** Window-argmax vs partial-aggregating max(struct) for assign(). */
  def assignBench(s: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val nz = graft.ops.TrainingOps.nzEmbeddings(s, d)
    val stride = graft.sources.AnnIndex.seedStride(nz.count())
    val vecs = nz.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
                         col("nrm").as("n_nrm"))
    val seeds = nz.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
              col("nrm").as("c_nrm"))
    def vA = {
      val w = Window.partitionBy(col("n_id")).orderBy(col("c_score").desc, col("c_id"))
      vecs.join(broadcast(seeds))
        .withColumn("c_score",
          expr("graft_float_dot(n_emb, c_emb)") / (col("n_nrm") * col("c_nrm")))
        .withColumn("arn", row_number().over(w))
        .where(col("arn") === 1)
        .select(col("n_id"), col("n_emb"), col("n_nrm"), col("c_id").as("bucket"))
    }
    def vB = vecs.join(broadcast(seeds))
      .withColumn("c_score",
        expr("graft_float_dot(n_emb, c_emb)") / (col("n_nrm") * col("c_nrm")))
      .groupBy(col("n_id"))
      .agg(max(struct(col("c_score"), (-col("c_id")).as("nc"),
                      col("n_emb"), col("n_nrm"))).as("m"))
      .select(col("n_id"), col("m.n_emb").as("n_emb"),
              col("m.n_nrm").as("n_nrm"), (-col("m.nc")).as("bucket"))
    run(vA); run(vB)
    for (i <- 1 to 2) {
      t(s"assign_window#$i") { run(vA) }
      t(s"assign_maxstruct#$i") { run(vB) }
    }
    val a = vA.select(col("n_id"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = vB.select(col("n_id"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"assign equal: ${a == b} (${a.size} vs ${b.size})")
  }

  /** q_dedup_contain phase breakdown. */
  def contain(s: SparkSession, d: String): Unit = {
    val fn = graft.SparkEntry.queries("q_dedup_contain")
    run(fn(s, d)) // warm
    for (i <- 1 to 2) t(s"contain_full#$i") { run(fn(s, d)) }
    def sh = graft.Tables.documents(s, d).withColumn("sh",
        graft.functions.TextHashes.shingles(5)(split(trim(col("text")), " ")))
      .select(col("doc_id"), col("sh"))
    def post = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    def rare = post.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df").between(2, 20)).select(col("g"))
    def rp = post.join(rare, "g")
    def cand = rp.groupBy(col("g")).agg(collect_set(col("doc_id")).as("ds"))
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    t("sh_scan") { sh.queryExecution.toRdd.count() }
    t("rare") { rare.queryExecution.toRdd.count() }
    t("cand") { cand.queryExecution.toRdd.count() }
    println("cand rows: " + cand.count())
  }

  /** AnnIndex.build stage mimic with timers. */
  def ivfBuild(s: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.types._
    graft.functions.FloatDot.register(s)
    graft.sources.AnnIndex.build(s, graft.Tables.embeddings(s, d),
      "target/tmp/scratch_ivfbw") // warm
    for (i <- 1 to 2) {
      val nz = graft.ops.TrainingOps.nzEmbeddings(s, d)
      val n = t(s"count#$i") { nz.count() }
      val stride = graft.sources.AnnIndex.seedStride(n)
      val vecs = nz.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
                           col("nrm").as("n_nrm"))
      val seeds = nz.where(pmod(col("vec_id"), lit(stride)) === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
                col("nrm").as("c_nrm"))
      val trained = t(s"train#$i") {
        graft.ops.TrainingOps.assign(vecs, seeds)
          .select(col("bucket"), posexplode(col("n_emb")).as(Seq("idx", "v")))
          .groupBy(col("bucket"), col("idx"))
          .agg(expr("sum(cast(round(cast(v as double) * 1048576) as bigint))").as("sv"),
               count(lit(1)).as("n"))
          .groupBy(col("bucket"))
          .agg(max(col("n")).as("n"),
               expr("array_join(transform(array_sort(collect_list(struct(idx, sv))), p -> cast(p.sv as string)), ',')")
                 .as("sv_csv"))
          .select(col("bucket").as("c_id"), col("n"), col("sv_csv"))
          .localCheckpoint()
      }
      val cents = trained.select(col("c_id"),
          expr("transform(split(sv_csv, ','), x -> cast((cast(x as bigint) / 1048576.0) / n as float))")
            .as("c_emb"))
        .withColumn("c_nrm", sqrt(expr("graft_float_dot(c_emb, c_emb)")))
      val root = s"target/tmp/scratch_ivfb_$i"
      val plRoot = new org.apache.hadoop.fs.Path(s"$root/postings")
      val fsys = graft.sources.StoreSink.fs(plRoot)
      graft.sources.StoreSink.writeExtras(plRoot, fsys,
        graft.sources.StoreSink.extrasOf(Seq(
          StructField("emb", graft.sources.StoreSink.FloatArrayType))))
      t(s"postings_write#$i") {
        graft.ops.TrainingOps.assign(vecs, cents)
          .select(col("n_id").as("k"), col("bucket").cast("string").as("grp"),
            lit(0L).as("amt_cents"), col("n_emb").as("emb"))
          .write.format("graft.sources.StoreSink").mode("append")
          .option("path", s"$root/postings")
          .option("partitionedBy", "identity:grp").save()
      }
    }
  }

  def maxsim(s: SparkSession, d: String): Unit = {
    val mi = graft.sources.MaxSimIndex
    val nzW = graft.ops.TrainingOps.nzEmbeddings(s, d)
    val toksW = nzW.where(col("vec_id") >= 20)
      .select(col("vec_id").as("n_id"), expr("vec_id div 10").as("d_id"),
              col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    mi.build(s, nzW, toksW, "target/tmp/scratch_maxw") // warm
    for (i <- 1 to 2) {
      val idx = s"target/tmp/scratch_max_$i"
      val nz = graft.ops.TrainingOps.nzEmbeddings(s, d)
      val tokens = nz.where(col("vec_id") >= 20)
        .select(col("vec_id").as("n_id"), expr("vec_id div 10").as("d_id"),
                col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
      t(s"build#$i") { mi.build(s, nz, tokens, idx) }
      val q = nz.where(col("vec_id") < 20)
        .select(expr("vec_id div 10").as("q_id"), col("vec_id").as("qt"),
                col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      t(s"probe#$i") { run(mi.probe(s, q, idx).orderBy(col("q_id"), col("rn"))) }
    }
  }

  def ivf(s: SparkSession, d: String): Unit = {
    val ai = graft.sources.AnnIndex
    ai.build(s, graft.Tables.embeddings(s, d), "target/tmp/scratch_ivfw") // warm
    for (i <- 1 to 2) {
      val idx = s"target/tmp/scratch_ivf_$i"
      t(s"build#$i") { ai.build(s, graft.Tables.embeddings(s, d), idx) }
      val queries = graft.ops.TrainingOps.nzEmbeddings(s, d).where(col("vec_id") < 10)
      t(s"probe#$i") { run(ai.probe(s, queries, idx).orderBy(col("q_id"), col("rn"))) }
      val idxf = s"target/tmp/scratch_ivff_$i"
      t(s"buildF#$i") { ai.build(s, graft.Tables.embeddings(s, d), idxf, Some("label")) }
      t(s"probeF#$i") { run(ai.probeFiltered(s, queries, idxf, 3L)
        .orderBy(col("q_id"), col("rn"))) }
    }
  }
}
