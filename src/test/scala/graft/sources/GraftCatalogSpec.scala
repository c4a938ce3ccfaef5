package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.catalog.Identifier

/** The graft TableCatalog: name resolution, read-only DDL refusal, and —
  * the part that matters — the pushdown/partitioning contracts surviving
  * the SQL/catalog path unchanged. */
class GraftCatalogSpec extends SparkSpec {

  private def withCatalog[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    body
  }

  test("filter pushdown narrows the scan through the catalog path") {
    withCatalog {
      val df = spark.sql(
        "SELECT id, val FROM graft.range_200k WHERE id >= 100000 AND id < 160000")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("GraftRangeScan[100000, 160000)"),
        s"catalog path lost filter pushdown:\n$p")
      assert(df.count() == 60000L)
    }
  }

  test("storage-partitioned join plans exchange-free through SQL") {
    withCatalog {
      val confs = Map(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val df = spark.sql(
          """SELECT f.grp, f.id, f.amt, d.amt AS dim_amt
            |FROM graft.bucket_fact f JOIN graft.bucket_dim d ON f.grp = d.grp
            |""".stripMargin)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"catalog path lost KeyGroupedPartitioning:\n$plan")
        assert(df.count() == 40000L)
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("catalog function graft.amt resolves, computes, and rejects bad arity") {
    withCatalog {
      val rows = spark.sql(
        "SELECT id, graft.amt(id) AS a FROM graft.range_200k WHERE id < 100")
        .collect()
      assert(rows.length == 100)
      rows.foreach(r => assert(r.getLong(1) == BucketSource.amtOf(r.getLong(0))))
      intercept[Exception] {
        spark.sql("SELECT graft.amt(1L, 2L)").collect()
      }
      intercept[Exception] {
        spark.sql("SELECT graft.nope(1L)").collect()
      }
    }
  }

  test("listTables, existence, and read-only DDL refusal") {
    withCatalog {
      val cat = spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      // built-ins must list; a CTAS registration left by an earlier suite
      // in the shared warehouse dir may also appear (order-insensitive)
      val listed = cat.listTables(Array.empty).map(_.name()).toSeq
      assert(Seq("bucket_dim", "bucket_fact", "range_200k", "store")
        .forall(listed.contains), s"missing built-ins in: $listed")
      // store resolves only when the session conf points it at a root
      intercept[Exception] {
        cat.loadTable(Identifier.of(Array.empty, "store"))
      }
      assert(cat.tableExists(Identifier.of(Array.empty, "RANGE_200K")))
      assert(!cat.tableExists(Identifier.of(Array.empty, "nope")))
      intercept[Exception] {
        spark.sql("DROP TABLE graft.range_200k")
      }
      // still resolvable after the refused DDL
      assert(spark.sql("SELECT COUNT(*) FROM graft.bucket_dim").collect()
        .head.getLong(0) == 8L)
    }
  }

  test("stored procedures: listed, audit rows returned, unknown declines") {
    withCatalog {
      import spark.implicits._
      val cat = spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.ProcedureCatalog]
      assert(cat.listProcedures(Array.empty).map(_.name()).sorted.toSeq ==
        Seq("abandon", "cherry_pick", "compact", "history", "publish",
          "rollback", "tag", "vacuum", "zorder"))
      intercept[Exception] { spark.sql("CALL graft.nope(1)") }
      val dir = "target/tmp/catalog_spec_proc"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      (1 to 200).map(k => (k.toLong, "a", k * 1L)).toDF("k", "grp", "amt_cents")
        .repartition(5, $"k")
        .write.format("graft.sources.StoreSink").mode("overwrite")
        .option("path", dir).save()
      val audit = spark.sql(s"CALL graft.compact('$dir', 100)").collect()(0)
      assert((audit.getLong(0), audit.getLong(1)) == (5L, 2L))
      val vac = spark.sql(s"CALL graft.vacuum('$dir', 1)").collect()(0)
      assert((vac.getLong(0), vac.getLong(1)) == (1L, 2L))
      assert(spark.read.format("graft.sources.StoreSink").option("path", dir)
        .load().count() == 200)
    }
  }

  test("staged CTAS: atomic create, failure leaves no table, drop removes") {
    withCatalog {
      val dir = "target/tmp/catalog_spec_ctas"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.conf.set(GraftCatalog.CtasDirKey, dir)
      try {
        spark.sql("""CREATE TABLE graft.ctas_t AS
                    |SELECT id AS k, tag AS grp, id * 2 AS amt_cents, tag AS extra
                    |FROM graft.range_200k WHERE id < 1000""".stripMargin)
        assert(spark.table("graft.ctas_t").count() == 1000)
        // the evolved trailing column rode the _schema sidecar
        assert(StoreSink.tableSchema(s"$dir/ctas_t").fieldNames.last == "extra")
        // zone pushdown survives the CTAS path
        val q = spark.sql("SELECT COUNT(*) FROM graft.ctas_t WHERE k < 10")
        assert(q.collect().head.getLong(0) == 10)
        // duplicate create refuses; REPLACE unsupported; bad prefix refuses
        intercept[Exception] {
          spark.sql("CREATE TABLE graft.ctas_t AS SELECT 1L AS k, 'x' AS grp, 2L AS amt_cents")
        }
        intercept[Exception] {
          spark.sql("REPLACE TABLE graft.ctas_t AS SELECT 1L AS k, 'x' AS grp, 2L AS amt_cents")
        }
        intercept[Exception] {
          spark.sql("CREATE TABLE graft.badshape AS SELECT 1 AS a, 2 AS b")
        }
        // mid-write failure: no manifest, no table — atomic by construction
        intercept[Exception] {
          spark.sql("""CREATE TABLE graft.boomspec AS
                      |SELECT id AS k, tag AS grp, 1L DIV (id - id) AS amt_cents
                      |FROM graft.range_200k WHERE id < 100""".stripMargin)
        }
        val cat = spark.sessionState.catalogManager.catalog("graft")
          .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        assert(!cat.tableExists(Identifier.of(Array.empty, "boomspec")),
          "failed CTAS left a visible table")
        spark.sql("DROP TABLE graft.ctas_t")
        assert(!cat.tableExists(Identifier.of(Array.empty, "ctas_t")))
      } finally spark.conf.unset(GraftCatalog.CtasDirKey)
    }
  }
}
