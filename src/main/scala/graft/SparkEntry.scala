package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's declared queries (SURVEY.md §2 — the
  * contract) and their DuckDB oracle SQL twins. Query IDs are unique across
  * modules; an accidental collision would silently drop a query, so
  * [[queries]] asserts uniqueness at class-init time.
  */
object SparkEntry {

  private val modules: Seq[OpModule] = Seq(
    Scans, Expressions, Joins, SortSetOps, Aggregations, Windows, ScalarFuncs,
    StructuredFuncs, TimeSeries, LlmOps, Multimodal, DedupVariants, TextAnalysis,
    GraphOps,
    Similarity, PipelineOps, TrainingOps, IndexOps, Subqueries, ScaleOps, EtlOps,
    graft.streaming.StreamOps, graft.sources.Sources,
    graft.sources.StoreColumnar,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Joins.star5(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries.toSeq)
    require(all.map(_._1).distinct.size == all.size,
      s"duplicate query IDs across modules: ${all.map(_._1).diff(all.map(_._1).distinct)}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (non-SQL-expressible ops, SURVEY.md §2 "—" rows). */
  val oracleSql: Map[String, String] = {
    val all = modules.flatMap(_.oracles.toSeq).toMap
    val unknown = all.keySet.diff(queries.keySet)
    require(unknown.isEmpty, s"oracle SQL for undeclared queries: $unknown")
    all
  }
}
