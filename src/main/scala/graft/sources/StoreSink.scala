package graft.sources

import java.nio.charset.StandardCharsets
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 WRITE path — the eighth custom-Catalyst kind, and the
  * half of the connector API [[RangeSource]] (read/pushdown) doesn't touch:
  * the transactional commit protocol every exactly-once sink is built on.
  *
  * `graft-store` is a fixed-schema keyed store (`k BIGINT, grp STRING,
  * amt_cents BIGINT`) over a directory. The write protocol is the classic
  * staging/manifest two-phase commit:
  *
  *  - each task's [[DataWriter]] streams its rows to a PRIVATE staging file
  *    `_staging/part-<queryId>-<partitionId>-<taskId>`; `commit()` returns
  *    the file name + row count as the task's [[WriterCommitMessage]],
  *    `abort()` deletes the file. Task identity in the name makes retried /
  *    speculative attempts write DISJOINT files; Spark's output commit
  *    coordinator guarantees only one attempt per partition reaches the
  *    driver, and losing attempts' leftovers die with the staging dir.
  *  - the driver's [[BatchWrite]] `commit(messages)` promotes exactly the
  *    acknowledged files out of staging, then atomically swaps the
  *    `_manifest` (write `_manifest.tmp`, rename over) listing every visible
  *    data file. `abort()` deletes the staging dir — a failed job leaves the
  *    previous committed state bit-for-bit intact.
  *  - READERS PLAN FROM THE MANIFEST, never from a directory listing: a
  *    stray/orphaned/in-flight file is invisible by construction (the
  *    Iceberg/Delta snapshot-isolation principle in miniature; the read side
  *    is one InputPartition per manifest entry).
  *
  * Append mode unions the new files into the manifest; Overwrite
  * (SupportsTruncate/SupportsOverwrite with the always-true filter) swaps
  * the manifest to exactly the new files and deletes the replaced ones
  * AFTER the swap (readers of the old manifest already re-planned; the
  * delete is GC, not correctness — the sink_retention posture).
  *
  * At 100 TB: rename-based promotion is atomic on HDFS-like filesystems;
  * an object-store deployment would swap the rename for a multipart-upload
  * completion per file — the manifest protocol above is unchanged, which is
  * the point of routing ALL visibility through it.
  */
class StoreSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StoreSink.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StoreTable(properties.get("path"))
}

object StoreSink {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("grp", StringType, nullable = true),
    StructField("amt_cents", LongType, nullable = true)))

  val Manifest = "_manifest"
  val Staging = "_staging"
  private val NullMark = "\\N"

  private[sources] def fs(p: Path): FileSystem =
    p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  private[sources] def fs(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf)

  /** Committed file names, in manifest order; empty when uncommitted. */
  private[sources] def readManifest(root: Path, fsys: FileSystem): Seq[String] = {
    val mf = new Path(root, Manifest)
    if (!fsys.exists(mf)) return Nil
    val in = fsys.open(mf)
    try {
      val txt = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    } finally in.close()
  }

  private[sources] def writeManifestAtomic(
      root: Path, fsys: FileSystem, files: Seq[String]): Unit = {
    val tmp = new Path(root, Manifest + ".tmp")
    val out = fsys.create(tmp, true)
    try out.write(files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val mf = new Path(root, Manifest)
    if (fsys.exists(mf)) fsys.delete(mf, false)
    require(fsys.rename(tmp, mf), s"manifest swap failed for $mf")
  }

  private[sources] def encode(row: InternalRow): String = {
    val k = if (row.isNullAt(0)) NullMark else row.getLong(0).toString
    val g = if (row.isNullAt(1)) NullMark
            else java.net.URLEncoder.encode(row.getString(1), "UTF-8")
    val a = if (row.isNullAt(2)) NullMark else row.getLong(2).toString
    s"$k,$g,$a"
  }

  private[sources] def decode(line: String): InternalRow = {
    val parts = line.split(",", -1)
    InternalRow(
      if (parts(0) == NullMark) null else java.lang.Long.valueOf(parts(0).toLong),
      if (parts(1) == NullMark) null
      else UTF8String.fromString(java.net.URLDecoder.decode(parts(1), "UTF-8")),
      if (parts(2) == NullMark) null else java.lang.Long.valueOf(parts(2).toLong))
  }
}

private class StoreTable(pathStr: String) extends Table
    with SupportsRead with SupportsWrite {
  require(pathStr != null, "graft-store requires a path option")

  override def name(): String = s"graft_store($pathStr)"
  override def schema(): StructType = StoreSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
                    TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StoreScanBuilder(pathStr)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new StoreWriteBuilder(pathStr, info)
}

// ---------------------------------------------------------------- write path

private class StoreWriteBuilder(pathStr: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.forall(_.isInstanceOf[AlwaysTrue]),
      s"graft-store supports only full-table overwrite, got ${filters.mkString(",")}")
    doTruncate = true; this
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new StoreBatchWrite(pathStr, info.queryId(), doTruncate)
  }
}

private class StoreBatchWrite(pathStr: String, queryId: String, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    StoreWriterFactory(pathStr, queryId) // standalone class: serializable task closure

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val staging = new Path(root, StoreSink.Staging)
    val committed = messages.map(_.asInstanceOf[StoreCommitMessage]).toSeq
    // promote exactly the acknowledged files; duplicates would mean the
    // commit coordinator failed us — refuse rather than double-count
    require(committed.map(_.file).distinct.size == committed.size,
      s"duplicate commit messages: ${committed.map(_.file)}")
    committed.foreach { m =>
      require(fsys.rename(new Path(staging, m.file), new Path(root, m.file)),
        s"failed to promote ${m.file}")
    }
    val previous = StoreSink.readManifest(root, fsys)
    val visible = if (truncate) committed.map(_.file)
                  else previous ++ committed.map(_.file)
    StoreSink.writeManifestAtomic(root, fsys, visible)
    if (truncate) // GC the replaced generation only AFTER the swap
      previous.filterNot(visible.contains).foreach { f =>
        fsys.delete(new Path(root, f), false)
      }
    fsys.delete(staging, true) // losing task attempts' leftovers die here
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    fsys.delete(new Path(root, StoreSink.Staging), true)
  }
}

private case class StoreCommitMessage(file: String, rows: Long)
    extends WriterCommitMessage

/** Standalone (serializable) factory — same rule as RangeSource: an
  * anonymous inner factory would drag the driver-side write object into the
  * task closure. */
private case class StoreWriterFactory(pathStr: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StoreDataWriter(pathStr, queryId, partitionId, taskId)
}

private class StoreDataWriter(pathStr: String, queryId: String,
                              partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val fileName = s"part-$queryId-$partitionId-$taskId"
  private val staged =
    new Path(new Path(pathStr, StoreSink.Staging), fileName)
  // executor side: build the Hadoop conf locally (no SparkSession.active on
  // a bare task thread is guaranteed; a fresh Configuration resolves the
  // same local/HDFS filesystems)
  private val fsys = StoreSink.fs(staged, new Configuration())
  private val out = fsys.create(staged, true)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    out.write((StoreSink.encode(record) + "\n").getBytes(StandardCharsets.UTF_8))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StoreCommitMessage(fileName, rows)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fsys.delete(staged, false)
  }

  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read path

private class StoreScanBuilder(pathStr: String) extends ScanBuilder {
  override def build(): Scan = new StoreScan(pathStr)
}

private class StoreScan(pathStr: String) extends Scan with Batch {
  override def readSchema(): StructType = StoreSink.schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftStoreScan($pathStr)"

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    // manifest-only planning: uncommitted/stray files cannot be scanned
    StoreSink.readManifest(root, fsys)
      .map(f => StoreFilePartition(new Path(root, f).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    StoreReaderFactory()
}

private case class StoreFilePartition(file: String) extends InputPartition

private case class StoreReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = new Path(partition.asInstanceOf[StoreFilePartition].file)
    val fsys = StoreSink.fs(p, new Configuration())
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fsys.open(p), StandardCharsets.UTF_8))
    new PartitionReader[InternalRow] {
      private var line: String = _
      override def next(): Boolean = { line = in.readLine(); line != null }
      override def get(): InternalRow = StoreSink.decode(line)
      override def close(): Unit = in.close()
    }
  }
}
