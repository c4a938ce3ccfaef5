package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 connector reporting its PHYSICAL LAYOUT to the planner
  * (`SupportsReportPartitioning` → `KeyGroupedPartitioning`) — the
  * storage-partitioned-join contract: each input partition carries its
  * partition KEY (`HasPartitionKey`), so when two tables partitioned on the
  * same key join on it, Spark aligns the key groups directly and plans NO
  * shuffle exchange on either side (`spark.sql.sources.v2.bucketing.enabled`;
  * BucketSourceSpec asserts the exchange-free plan, `q_join_spj` oracle-pins
  * the result). This is the Iceberg/Delta bucketed-table join shape on a
  * connector we own — at 100 TB it removes BOTH full-table shuffles from
  * every fact-fact join that shares the store's partitioning, the DSv2
  * analogue of `q_join_bucketed`'s session-catalog bucketing.
  *
  * Deterministic generator (closed forms mirrored by the oracle): `rows`
  * rows with id ∈ [0, rows), grp = 'g' + (id % groups), amt = id·13 % 1000;
  * partition b holds exactly the rows with id ≡ b (mod groups).
  */
class BucketSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BucketSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BucketTable(properties.get("rows").toLong, properties.get("groups").toInt)
}

object BucketSource {
  val schema: StructType = StructType(Seq(
    StructField("grp", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("amt", LongType, nullable = false)))

  def amtOf(id: Long): Long = id * 13 % 1000
}

private class BucketTable(rows: Long, groups: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_bucket($rows,$groups)"
  override def schema(): StructType = BucketSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BucketScan(rows, groups)
    }
}

private class BucketScan(rows: Long, groups: Int)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportStatistics {

  override def readSchema(): StructType = BucketSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftBucketScan(rows=$rows, groups=$groups)"

  /** Closed-form stats (grp ~8 B + id 8 B + amt 8 B): the dim side of the
    * SPJ family stays under the broadcast threshold by REPORTED size, so
    * join planning over `graft.bucket_*` names is stats-driven, never
    * defaultSizeInBytes-blind (q_join_spj disables the threshold to force
    * the exchange-free plan; everywhere else the stats decide). */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(rows * 24L)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }

  /** The layout contract: clustered by identity(grp), one key group per
    * bucket. Spark matches this against the join's required distribution. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("grp")), groups)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until groups).map(b => BucketPartition(b, rows, groups): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = BucketReaderFactory()
}

/** One bucket = one partition; partitionKey() is what lets Spark align the
  * two sides of a storage-partitioned join group by group. */
private case class BucketPartition(bucket: Int, rows: Long, groups: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString("g" + bucket))
}

private case class BucketReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BucketPartition]
    val grp = UTF8String.fromString("g" + p.bucket)
    new PartitionReader[InternalRow] {
      private var cur = p.bucket.toLong - p.groups
      override def next(): Boolean = { cur += p.groups; cur < p.rows }
      override def get(): InternalRow =
        InternalRow(grp, cur, BucketSource.amtOf(cur))
      override def close(): Unit = ()
    }
  }
}
