package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 connector — the seventh custom-Catalyst kind: the
  * CONNECTOR API an ETL engine lives on. A deterministic keyed generator
  * (`id` in [start, end); `val`/`tag` closed-form functions of id, so DuckDB
  * re-derives every row) that implements the two contracts that matter at
  * 100 TB:
  *
  *  - `SupportsPushDownFilters`: >=/>/<=/<(=) predicates on `id` TIGHTEN THE
  *    SCAN BOUNDS — partitions outside the residual range are never planned
  *    and their rows never materialize (the DSv2 analogue of parquet
  *    row-group pruning). Pushed conjuncts are consumed (removed from the
  *    Spark-side filter); unsupported ones are returned as postScanFilters.
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only the
  *    pruned schema — a projection that drops `tag` never builds its
  *    UTF8String.
  *
  * The scan splits the residual range into fixed-width slices (one input
  * partition each), so parallelism scales with the data actually read, not
  * the table's declared extent. `Scan.description()` exposes the residual
  * bounds; RangeSourceSpec asserts pushdown observably (bounds in the plan,
  * partition count, row counts), and `src_dsv2` oracle-pins row contents.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeTable(properties.get("start").toLong, properties.get("end").toLong)
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Closed-form row functions (mirrored by the DuckDB oracle). */
  def valOf(id: Long): Double = (id * 7919 % 100000) / 100.0
  def tagOf(id: Long): String = "abcd".charAt((id % 4).toInt).toString

  /** Rows per input partition slice. */
  val SliceRows = 25000L

  /** Test observability (single-JVM): the last runtime-filter narrowing as
    * (slices planned without the filter, slices surviving it). Written by
    * [[RangeScan.planInputPartitions]] only when a runtime filter arrived. */
  @volatile private[sources] var lastRuntimePrune: Option[(Int, Int)] = None
}

private class RangeTable(start: Long, end: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_range($start,$end)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end)
}

private class RangeScanBuilder(start: Long, end: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var lo = start
  private var hi = end
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.schema
  private var aggFuncs: Seq[String] = Nil // count | min | max, in push order

  // SQL integer literals arrive as Int, long ones as Long — accept both
  private object L {
    def unapply(a: Any): Option[Long] = a match {
      case i: Int  => Some(i.toLong)
      case l: Long => Some(l)
      case _       => None
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, rest) = filters.partition {
      case GreaterThan(a, L(v)) if a == "id"        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual(a, L(v)) if a == "id" => lo = math.max(lo, v); true
      case LessThan(a, L(v)) if a == "id"           => hi = math.min(hi, v); true
      case LessThanOrEqual(a, L(v)) if a == "id"    => hi = math.min(hi, v + 1); true
      case EqualTo(a, L(v)) if a == "id" =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = consumed
    rest // everything not consumed stays a Spark-side post-scan filter
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown (PARTIAL contract — supportCompletePushDown stays
    * false): COUNT(*)/MIN(id)/MAX(id) with no GROUP BY compute CLOSED-FORM
    * per partition slice (count = hi−lo, min = lo, max = hi−1), so the
    * scan returns one row per slice and Spark's final aggregation merges
    * them — rows never materialize at all. Called after pushFilters, so
    * the slices are already the residual range. Anything else declines
    * and falls back to the row scan. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions.nonEmpty) return false
    def idRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e.toString.replace("`", "") == "id"
    val fs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar           => Some("count")
      case m: Min if idRef(m.column) => Some("min")
      case m: Max if idRef(m.column) => Some("max")
      case _ => None
    }
    if (fs.contains(None) || fs.isEmpty) false
    else { aggFuncs = fs.flatten; true }
  }

  override def build(): Scan =
    if (aggFuncs.nonEmpty) new RangeAggScan(lo, hi, aggFuncs)
    else new RangeScan(lo, hi, required)
}

/** Pre-aggregated scan: one row per slice carrying the pushed aggregates. */
private class RangeAggScan(lo: Long, hi: Long, funcs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(funcs.zipWithIndex.map { case (f, i) =>
      StructField(s"${f}_$i", LongType, nullable = false)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeScan[$lo, $hi) agg=${funcs.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val n = ((hi - lo + RangeSource.SliceRows - 1) / RangeSource.SliceRows).toInt
    (0 until n).map { i =>
      val s = lo + i * RangeSource.SliceRows
      RangePartition(s, math.min(s + RangeSource.SliceRows, hi)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RangeAggReaderFactory(funcs)
}

/** Standalone (serializable) factory — an inner anonymous class would drag
  * the non-serializable Scan into the task closure. */
private case class RangeAggReaderFactory(funcs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(funcs.map {
        case "count" => p.hi - p.lo
        case "min"   => p.lo
        case "max"   => p.hi - 1
      })
      override def close(): Unit = ()
    }
  }
}

/** Row scan. [[SupportsRuntimeFiltering]] is the third pushdown contract —
  * dynamic partition pruning INTO the source: when this scan joins a dim
  * whose selective filter Spark can only evaluate at runtime, the executed
  * plan carries a `dynamicpruning` In-subquery on `id`, and just before
  * execution Spark hands the realized key set to [[filter]]; partition
  * planning then drops every slice containing none of the keys. At 100 TB
  * this is the difference between scanning the fact table's declared extent
  * and scanning only the slices the dim actually references — without the
  * query author writing any bound. */
private class RangeScan(lo: Long, hi: Long, required: StructType)
    extends Scan with Batch with SupportsRuntimeFiltering {

  /** Slice indices (relative to lo) referenced by a runtime In-filter;
    * None until/unless a runtime filter arrives. */
  @volatile private var keepSlices: Option[Set[Long]] = None

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In(a, vs) if a == "id" =>
      val ids = vs.collect {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long    => l.longValue()
      }.filter(v => v >= lo && v < hi)
      // O(|keys|): bucket each key to its slice — never a per-slice scan
      keepSlices = Some(ids.map(v => (v - lo) / RangeSource.SliceRows).toSet)
    case _ => () // unsupported runtime predicates are simply not narrowed by
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeScan[$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val n = ((hi - lo + RangeSource.SliceRows - 1) / RangeSource.SliceRows).toInt
    val all = (0 until n).map { i =>
      val s = lo + i * RangeSource.SliceRows
      RangePartition(s, math.min(s + RangeSource.SliceRows, hi)): InputPartition
    }
    keepSlices match {
      case Some(keep) =>
        val kept = all.zipWithIndex.collect {
          case (p, i) if keep.contains(i.toLong) => p
        }
        RangeSource.lastRuntimePrune = Some((n, kept.length))
        kept.toArray
      case None => all.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)
}

private case class RangePartition(lo: Long, hi: Long) extends InputPartition

private class RangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    // resolve projection ONCE per partition, not per row
    val cols: Array[Long => Any] = required.fieldNames.map {
      case "id"  => (id: Long) => id
      case "val" => (id: Long) => RangeSource.valOf(id)
      case "tag" => (id: Long) => UTF8String.fromString(RangeSource.tagOf(id))
    }
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow = InternalRow.fromSeq(cols.map(_(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
