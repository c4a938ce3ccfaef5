package graft.sources

import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsDelete, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{AlwaysFalse, AlwaysTrue, And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or}
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
  *    `_manifest` (write `_manifest.tmp`, FileContext.rename OVERWRITE)
  *    listing every visible data file. `abort()` deletes the staging dir —
  *    a failed job leaves the previous committed state bit-for-bit intact.
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
  * Round-12 additions, the protocol halves a production store can't live
  * without:
  *
  *  - STREAMING WRITE ([[StreamingWrite]], STREAMING_WRITE capability):
  *    each micro-batch commits through the same staging/manifest protocol,
  *    and the manifest additionally records every COMMITTED EPOCH as a
  *    `#epoch=<id>` marker line. Structured Streaming's recovery contract
  *    is that a failed run may RE-DELIVER the last epoch (same epochId,
  *    same data); `commit(epochId, ...)` consults the ledger and SKIPS the
  *    replayed epoch — deleting its staged files — so the sink is
  *    exactly-once end to end (s_sink_dsv2 replays an epoch and the oracle
  *    hash proves no double-count).
  *  - ROW-LEVEL DELETE ([[SupportsDelete]]): `DELETE FROM graft.store
  *    WHERE <translatable predicate>` rewrites ONLY the manifest files that
  *    contain matching rows (copy-on-write at file granularity — untouched
  *    files are carried over by name), then swaps the manifest; the old
  *    generation is GC'd after the swap. With delete + append, MERGE
  *    becomes delete-matched-then-insert THROUGH the connector
  *    (q_store_merge). A failed rewrite aborts with the previous manifest
  *    intact (StoreSinkSpec pins it via the fail-injection hook).
  *
  * At 100 TB: rename-based promotion is atomic on HDFS-like filesystems;
  * an object-store deployment would swap the rename for a multipart-upload
  * completion per file — the manifest protocol above is unchanged, which is
  * the point of routing ALL visibility through it. Copy-on-write delete
  * rewrites bytes proportional to the TOUCHED files, not the table.
  */
/** COMMIT ARBITRATION SEAM: how a graft-store committer gets mutual
  * exclusion for its metadata swap. Every commit path (batch append,
  * streaming epoch, row-level publish, delete, compaction, vacuum, DDL)
  * runs promote + rebuild-from-fresh-manifest + swap inside a claim from
  * the provider selected by `spark.graft.store.lock.provider`:
  *
  *  - `fs` (default): create-exclusive `_commit.lock` in the table dir —
  *    correct on POSIX (O_EXCL) and HDFS (namenode-atomic create).
  *  - `cas`: an external compare-and-swap coordinator (see
  *    [[StoreSink.CasLockProvider]]) — the shape S3-class deployments
  *    need, where the store itself has no atomic create-exclusive.
  *  - a fully-qualified class name implementing this trait: the
  *    deployment's own lock-service client (DynamoDB lock table,
  *    ZooKeeper, a catalog CAS).
  *
  * Contract: `tryClaim` must be ATOMIC (at most one concurrent caller may
  * see true until the matching `release`); non-blocking; idempotence is
  * NOT assumed. The wait/timeout loop lives in the caller
  * (StoreSink.withCommitLock), so providers stay two primitive
  * operations. */
trait StoreLockProvider {
  /** Atomically claim the table's commit mutex; false when already held. */
  def tryClaim(root: org.apache.hadoop.fs.Path, raw: FileSystem): Boolean
  /** Release a claim this caller holds. */
  def release(root: org.apache.hadoop.fs.Path, raw: FileSystem): Unit
  /** Human-readable claim identity for the stale-claim error message. */
  def describe(root: org.apache.hadoop.fs.Path, raw: FileSystem): String =
    s"${getClass.getSimpleName} on $root"
}

class StoreSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("path")).map { p =>
      if ("true".equalsIgnoreCase(options.get("changeFeed")))
        StoreSink.cdfSchema(p)
      else StoreSink.tableSchema(p,
        Option(options.get("atVersion")).map(_.toInt))
    }.getOrElse(StoreSink.schema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    // `changeFeed=true` resolves the STREAMING CHANGE FEED view of the
    // table (op/cv-prefixed rows, version-offset micro-batches);
    // `atVersion` pins SCHEMA + layout resolution for path-based reads —
    // the batch change feed reads archived generations' files under the
    // schema they were written with (time travel through the catalog
    // passes the version directly instead)
    if ("true".equalsIgnoreCase(properties.get("changeFeed")))
      new StoreCdfTable(properties.get("path"),
        Option(properties.get("startingVersion")).map(_.toInt))
    else new StoreTable(properties.get("path"),
      Option(properties.get("atVersion")).map(_.toInt),
      requested = partitioning,
      // SCHEMA MERGE ON WRITE: the option must lift Spark's write-arity
      // check (ACCEPT_ANY_SCHEMA) at TABLE resolution — the analyzer
      // rejects a wider DataFrame before any write builder runs
      // otherwise; the builder then re-validates the prefix itself and
      // registers the new trailing slots (see mergeWriteSchema)
      mergeCap = "true".equalsIgnoreCase(properties.get("mergeSchema")))
}

object StoreSink {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("grp", StringType, nullable = true),
    StructField("amt_cents", LongType, nullable = true)))

  val Manifest = "_manifest"
  val Staging = "_staging"
  val SchemaFile = "_schema"
  private[sources] val NullMark = "\\N"
  private val EpochMark = "#epoch="

  // ------------------------------------------------- schema evolution
  /** Extra TRAILING columns appended by `ALTER TABLE ... ADD COLUMN`
    * (GraftCatalog.alterTable), persisted as a `_schema` sidecar. The base
    * (k, grp, amt_cents) prefix is immutable — zones, blooms, partition
    * specs, and the delete-predicate compiler all address it by ordinal.
    *
    * FIELD-ID EVOLUTION (the Iceberg field-id contract in miniature): every
    * extra column carries a STABLE integer field id, and its id IS its
    * physical slot — slots are append-only, assigned once, never reused.
    *  - ADD appends a new slot (id = max seen + 1, base owns 1..3).
    *  - RENAME is pure metadata: the slot keeps decoding the same physical
    *    position; old files read under the NEW name with zero rewrites.
    *  - DROP is a TOMBSTONE on the slot: the column leaves the logical
    *    schema but the physical slot stays reserved, so a file written
    *    before the drop still decodes every surviving column correctly by
    *    position, and a file written after it carries a null placeholder in
    *    the dead slot (2 bytes/row; compaction rewrites absorb nothing —
    *    the slot stays reserved so widths remain monotone). At 100 TB the
    *    same ids would live in parquet field-id metadata and drops would
    *    cost zero bytes; the PLANNING contract — resolve by id, never by
    *    current-schema ordinal — is what this pins.
    * A file's WIDTH therefore still names its write-time schema generation
    * (slots are append-only), which is what keeps every historical file
    * readable without per-file schema pointers. Binding happens at table
    * RESOLUTION (loadTable / getTable re-read the sidecar), so an ALTER is
    * visible to the next statement without any session restart. */
  /** Metadata key carrying an added column's DEFAULT as its raw value
    * (reader-side form); CURRENT_DEFAULT / EXISTS_DEFAULT carry the SQL
    * text Spark's analyzer consumes for INSERTs that omit the column. */
  private[sources] val RawDefaultKey = "graft.default.raw"

  /** One trailing column slot: stable field `id` (= physical slot index −
    * base width + 1 + 3; ids 1..3 are the base prefix), current `name`,
    * optional initial DEFAULT, and the drop tombstone. */
  case class ExtraField(id: Int, name: String, dataType: DataType,
                        rawDefault: Option[String] = None,
                        dropped: Boolean = false) {
    def toStructField: StructField = {
      val f = StructField(name, dataType, nullable = true)
      rawDefault.fold(f) { rawV =>
        val sqlText =
          if (dataType == LongType || dataType == IntegerType) rawV
          else "'" + rawV.replace("'", "''") + "'"
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putString(RawDefaultKey, rawV)
          .putString("CURRENT_DEFAULT", sqlText)
          .putString("EXISTS_DEFAULT", sqlText)
          .build())
      }
    }
  }

  /** Lift plain StructFields (CTAS/RTAS schemas, legacy v1 sidecar lines)
    * into id'd slots: ids 4.. in declared order. */
  private[sources] def extrasOf(fields: Seq[StructField]): Seq[ExtraField] =
    fields.zipWithIndex.map { case (f, i) =>
      ExtraField(4 + i, f.name, f.dataType,
        if (f.metadata.contains(RawDefaultKey))
          Some(f.metadata.getString(RawDefaultKey)) else None)
    }

  private[sources] def readExtras(root: Path, fsys: FileSystem): Seq[ExtraField] =
    readExtrasFile(new Path(root, SchemaFile), fsys)

  /** SNAPSHOT-SCOPED SCHEMA: trailing columns decode by ORDINAL, so a
    * REPLACE that changes the trailing set would misread ARCHIVED
    * generations under the new schema. stageReplace therefore archives the
    * outgoing `_schema` as `_schema.v<V>` (V = the last version committed
    * under it), and a versioned read resolves the smallest archive whose
    * V covers the requested version — the Iceberg schema-per-snapshot
    * contract at one tiny file per schema CHANGE (not per commit). */
  private[sources] def schemaArchivePath(root: Path, v: Int): Path =
    new Path(root, s"$SchemaFile.v$v")

  private[sources] def listSchemaArchives(root: Path, fsys: FileSystem): Seq[Int] =
    if (!fsys.exists(root)) Nil
    else fsys.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(s"$SchemaFile.v"))
      .flatMap(n => scala.util.Try(n.stripPrefix(s"$SchemaFile.v").toInt).toOption)
      .sorted

  private[sources] def readExtrasAt(root: Path, fsys: FileSystem,
                                    version: Option[Int]): Seq[ExtraField] =
    version match {
      case None => readExtras(root, fsys)
      case Some(v) =>
        listSchemaArchives(root, fsys).find(_ >= v) match {
          case Some(w) => readExtrasFile(schemaArchivePath(root, w), fsys)
          case None => readExtras(root, fsys) // never replaced since v
        }
    }

  /** v2 sidecar header; v1 files (`name:type[:default]` lines, no header)
    * still parse — their slots get ids 4.. in file order, exactly the ids
    * the v2 writer would have assigned, so upgrading is a no-op rewrite. */
  private val SchemaV2Header = "#graft-schema-v2"

  /** FLOAT-ARRAY trailing columns (`farr`, round-11 verdict #5): vectors
    * persist as CONCATENATED 8-hex-digit IEEE-754 bit patterns (fixed
    * width — self-delimiting, no separators to escape) and decode straight
    * to ArrayType(FloatType). Exact by construction (bits round-trip,
    * unlike decimal text) and CHEAP to parse: 8 hex chars per float, no
    * decimal conversion — this is what removes the per-row
    * `transform(split(emb,','), cast)` from every ANN probe's hot path.
    * Never a stat/zone candidate; defaults unsupported. */
  private[sources] val FloatArrayType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = true)

  /** containsNull-agnostic farr test (frames arriving at the writer often
    * carry nullable elements for the same physical values). */
  private[sources] def isFarr(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  private def typeOf(t: String): DataType = t match {
    case "bigint" => LongType
    case "string" => StringType
    case "int"    => IntegerType
    case "farr"   => FloatArrayType
    case other => throw new IllegalArgumentException(
      s"graft-store extra column type $other (int|bigint|string|farr only)")
  }

  private def readExtrasFile(sf: Path, fsys: FileSystem): Seq[ExtraField] = {
    val raw = manifestFs(fsys)
    if (!raw.exists(sf)) return Nil
    val in = raw.open(sf)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      finally in.close()
    val lines = txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    if (lines.headOption.contains(SchemaV2Header))
      // v2: `id:name:type[:d<urlenc default>][:x]` — `x` is the tombstone
      lines.tail.map { l =>
        val p = l.split(":", -1)
        val rest = p.drop(3)
        ExtraField(p(0).toInt, p(1), typeOf(p(2)),
          rest.find(_.startsWith("d"))
            .map(d => java.net.URLDecoder.decode(d.drop(1), "UTF-8")),
          dropped = rest.contains("x"))
      }
    else
      lines.zipWithIndex.map { case (l, i) =>
        val p = l.split(":", 3)
        ExtraField(4 + i, p(0), typeOf(p(1)),
          if (p.length < 3) None
          else Some(java.net.URLDecoder.decode(p(2), "UTF-8")))
      }
  }

  private[sources] def writeExtras(root: Path, fsys: FileSystem,
                                   extras: Seq[ExtraField]): Unit =
    writeExtrasFile(new Path(root, SchemaFile), fsys, extras)

  /** SCHEMA MERGE ON WRITE (`option("mergeSchema", "true")` — the Delta
    * auto-evolution contract, constrained to this store's add-TRAILING
    * rule): an append whose DataFrame is WIDER than the table
    * auto-registers the extra trailing columns as new id'd slots before
    * any row is staged, exactly as `ALTER TABLE ... ADD COLUMN` would
    * have. Because the option lifts Spark's own arity check
    * (ACCEPT_ANY_SCHEMA), this helper re-validates STRICTLY:
    *  - the first live-width fields must match the live projection by
    *    position — names case-insensitively, types exactly (mergeSchema
    *    never reorders, renames, drops or retypes);
    *  - every new field must be a supported trailing type
    *    (int|bigint|string|farr) — the same domain ALTER accepts.
    * Runs under the commit lock: two racing merge-writes serialize, the
    * second seeing the first's columns (same names+types → its tail is
    * empty and the merge is a no-op; a type conflict refuses loudly).
    * Old files never rewrite — short rows decode the new columns as
    * NULL, the store's standing evolution contract. If the DATA write
    * aborts after the merge, the registered columns remain — the same
    * metadata-only residue a standalone ALTER before a failed write
    * leaves, and harmless for the same reason (no file references them).
    * Tables with enforced CHECK constraints refuse: constraint
    * validation is injected during the output resolution that
    * ACCEPT_ANY_SCHEMA waives, so a merge write cannot prove the
    * constraints were enforced — loud over silently unvalidated. */
  private[sources] def mergeWriteSchema(pathStr: String,
                                        incoming: StructType): Unit = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    require(readConstraints(root, fsys).isEmpty,
      "mergeSchema does not compose with CHECK constraints (their " +
        "validation rides the schema resolution the option waives) — " +
        "ALTER the table instead")
    def sameType(a: DataType, b: DataType): Boolean =
      a == b || (isFarr(a) && isFarr(b))
    withCommitLock(root, fsys) {
      val extras = readExtras(root, fsys)
      val liveF: Seq[(String, DataType)] =
        schema.fields.map(f => (f.name, f.dataType)).toSeq ++
          extras.filterNot(_.dropped).map(e => (e.name, e.dataType))
      require(incoming.fields.length >= liveF.length,
        s"mergeSchema write is NARROWER than the table (" +
          s"${incoming.fields.length} < ${liveF.length} columns) — " +
          "mergeSchema only ADDS trailing columns")
      liveF.zipWithIndex.foreach { case ((n, t), i) =>
        val f = incoming.fields(i)
        require(f.name.equalsIgnoreCase(n),
          s"mergeSchema write column $i is ${f.name}, table has $n — " +
            "the existing projection must match by position")
        require(sameType(f.dataType, t),
          s"mergeSchema write column ${f.name} is ${f.dataType.simpleString}, " +
            s"table has ${t.simpleString} — use ALTER COLUMN TYPE to widen")
      }
      var cur = extras
      incoming.fields.drop(liveF.length).foreach { f =>
        val dt = f.dataType match {
          case LongType | StringType | IntegerType => f.dataType
          case t if isFarr(t) => FloatArrayType
          case t => throw new IllegalArgumentException(
            s"mergeSchema cannot add column ${f.name} of type " +
              s"${t.simpleString} (int|bigint|string|farr only)")
        }
        val liveNames = (schema.fields.map(_.name) ++
          cur.filterNot(_.dropped).map(_.name))
          .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        require(!liveNames(f.name.toLowerCase(java.util.Locale.ROOT)),
          s"mergeSchema duplicate new column: ${f.name}")
        val nextId = (3 +: cur.map(_.id)).max + 1
        cur = cur :+ ExtraField(nextId, f.name, dt, None)
      }
      if (cur != extras) writeExtras(root, fsys, cur)
    }
  }

  private[sources] def writeExtrasFile(sf: Path, fsys: FileSystem,
                                       extras: Seq[ExtraField]): Unit = {
    val raw = manifestFs(fsys)
    val lines = SchemaV2Header +: extras.map { f =>
      val t = f.dataType match {
        case LongType => "bigint"
        case StringType => "string"
        case IntegerType => "int"
        case dt if isFarr(dt) => "farr"
        case other => throw new IllegalArgumentException(
          s"graft-store cannot add a $other column (int|bigint|string|farr only)")
      }
      val d = f.rawDefault
        .map(v => ":d" + java.net.URLEncoder.encode(v, "UTF-8")).getOrElse("")
      val x = if (f.dropped) ":x" else ""
      s"${f.id}:${f.name}:$t$d$x"
    }
    val out = raw.create(sf, true)
    try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Per-column reader defaults (null = pad with NULL): applied ONLY to
    * physically short rows — rows written before the column existed (the
    * Iceberg initial-default contract); a NULL written after the ALTER
    * stays NULL. */
  private[sources] def defaultsOf(st: StructType): Array[Any] =
    st.fields.map { f =>
      if (!f.metadata.contains(RawDefaultKey)) null
      else f.dataType match {
        case LongType =>
          java.lang.Long.valueOf(f.metadata.getString(RawDefaultKey).toLong)
        case IntegerType =>
          java.lang.Integer.valueOf(f.metadata.getString(RawDefaultKey).toInt)
        case _ => UTF8String.fromString(f.metadata.getString(RawDefaultKey))
      }
    }

  /** The PHYSICAL row layout a schema state implies, driving both halves of
    * the line codec:
    *  - `physTypes`/`physDefaults`: one entry per physical slot, tombstoned
    *    slots included — what [[decode]] walks, so every file (any width ≤
    *    the layout's) resolves each surviving column by its id'd position;
    *  - `proj`: logical ordinal → physical slot, the reader's projection;
    *  - `slots`: physical slot → logical ordinal (−1 on tombstones), the
    *    writer's emission order (dead slots write a null placeholder).
    * Resolved ONCE on the driver at plan/write-build time and shipped to
    * tasks — executors never re-read the sidecar, so a concurrent ALTER
    * can't skew a running job's layout mid-flight. */
  private[sources] case class StoreLayout(physTypes: Array[DataType],
                                          physDefaults: Array[Any],
                                          proj: Array[Int],
                                          slots: Array[Int]) {
    def identity: Boolean = slots.length == proj.length
  }

  private[sources] def layoutOf(extras: Seq[ExtraField]): StoreLayout = {
    val live = extras.filterNot(_.dropped)
    val logical = StructType(schema.fields ++ live.map(_.toStructField))
    val logicalDefaults = defaultsOf(logical)
    val physTypes = baseTypes ++ extras.map(_.dataType)
    val proj = new Array[Int](3 + live.length)
    val slots = Array.fill(physTypes.length)(-1)
    var s = 0; var l = 0
    while (s < 3) { proj(s) = s; slots(s) = s; s += 1 }
    extras.foreach { e =>
      if (!e.dropped) { proj(3 + l) = s; slots(s) = 3 + l; l += 1 }
      s += 1
    }
    val physDefaults = new Array[Any](physTypes.length)
    proj.indices.foreach(i => physDefaults(proj(i)) = logicalDefaults(i))
    StoreLayout(physTypes, physDefaults, proj, slots)
  }

  private[sources] def layoutAt(pathStr: String,
                                version: Option[Int]): StoreLayout = {
    val root = new Path(pathStr)
    layoutOf(readExtrasAt(root, fs(root), version))
  }

  /** Change-feed row shape: op (insert|delete), cv (commit version), then
    * the CURRENT table columns — older generations project by name. */
  def cdfSchema(pathStr: String): StructType =
    StructType(
      StructField("op", StringType, nullable = false) +:
      StructField("cv", LongType, nullable = false) +:
      tableSchema(pathStr).fields.toSeq)

  /** The CURRENT table schema: immutable base + live sidecar extras. */
  def tableSchema(pathStr: String): StructType = tableSchema(pathStr, None)

  /** Schema AT a version — resolves the archived `_schema.v<V>` a REPLACE
    * left behind (see [[schemaArchivePath]]); current schema otherwise. */
  def tableSchema(pathStr: String, version: Option[Int]): StructType = {
    val root = new Path(pathStr)
    StructType(schema.fields ++ readExtrasAt(root, fs(root), version)
      .filterNot(_.dropped).map(_.toStructField))
  }

  // ------------------------------------------------- CHECK constraints
  /** Enforced CHECK constraints (`_constraints` sidecar of
    * `name|<urlencoded predicate sql>` lines). Reported through
    * Table.constraints(); Spark validates EXISTING data at ADD CONSTRAINT
    * time (AddCheckConstraintExec scans) and rejects writes whose rows
    * violate an enforced constraint — data quality as table metadata, the
    * Delta CHECK-constraint contract. */
  val ConstraintFile = "_constraints"

  private[sources] def readConstraints(root: Path,
                                       fsys: FileSystem): Seq[(String, String)] = {
    val raw = manifestFs(fsys)
    val cf = new Path(root, ConstraintFile)
    if (!raw.exists(cf)) return Nil
    val in = raw.open(cf)
    val txt = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty).map { l =>
      val Array(n, p) = l.split("\\|", 2)
      (n, java.net.URLDecoder.decode(p, "UTF-8"))
    }
  }

  private[sources] def writeConstraints(root: Path, fsys: FileSystem,
                                        cs: Seq[(String, String)]): Unit = {
    val raw = manifestFs(fsys)
    val out = raw.create(new Path(root, ConstraintFile), true)
    try out.write(cs.map { case (n, p) =>
        s"$n|${java.net.URLEncoder.encode(p, "UTF-8")}"
      }.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** TABLE PROPERTIES sidecar (`_props`, `key|url-encoded-value` lines):
    * `ALTER TABLE graft.store SET/UNSET TBLPROPERTIES` durably records
    * free-form table metadata, surfaced through Table.properties() (SHOW
    * TBLPROPERTIES / DESCRIBE EXTENDED) — and OPERATIONAL properties feed
    * maintenance defaults: `graft.vacuum.keep` is the retention policy
    * `CALL graft.vacuum(path, 0)` resolves when no explicit count is
    * passed, so the policy travels WITH the table (the Delta
    * `delta.deletedFileRetentionDuration` shape), not with the caller. */
  val PropsFile = "_props"

  private[sources] def readProps(root: Path, fsys: FileSystem): Seq[(String, String)] = {
    val raw = manifestFs(fsys)
    val pf = new Path(root, PropsFile)
    if (!raw.exists(pf)) return Nil
    val in = raw.open(pf)
    val txt = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("\\|", 2)
      (k, java.net.URLDecoder.decode(v, "UTF-8"))
    }
  }

  private[sources] def writeProps(root: Path, fsys: FileSystem,
                                  ps: Seq[(String, String)]): Unit = {
    val raw = manifestFs(fsys)
    val out = raw.create(new Path(root, PropsFile), true)
    try out.write(ps.sortBy(_._1).map { case (k, v) =>
        s"$k|${java.net.URLEncoder.encode(v, "UTF-8")}"
      }.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** One committed data file with its ZONE MAP (row count + min/max of the
    * key column, None when the file holds no non-null keys) and its GRP
    * BLOOM (a 64-bit Bloom filter over the file's non-null `grp` values —
    * the second pruning structure: zones answer range predicates on the
    * clustered key, the bloom answers point/IN predicates on the unordered
    * dimension column, exactly the Delta/Iceberg column-stats + bloom
    * split). The stats ride the manifest line
    * (`name|rows|minK|maxK|bloomHex`); legacy 4-field and bare-name lines
    * parse with no stats and are simply never prunable. At 100 TB the
    * 64-bit word scales to a KB-sized per-file bloom sidecar; the planning
    * contract (prune when the membership test says "cannot contain") is
    * unchanged, and saturation only costs pruning, never correctness. */
  case class StoreFileEntry(name: String, rows: Long,
                            minK: Option[Long], maxK: Option[Long],
                            bloom: Option[Long] = None,
                            bytes: Option[Long] = None,
                            dv: Option[String] = None,
                            part: Option[String] = None,
                            eq: Option[String] = None,
                            minA: Option[Long] = None,
                            maxA: Option[Long] = None,
                            stats: Seq[(String, Long, Long)] = Nil,
                            sstats: Seq[(String, String, String)] = Nil,
                            nullK: Option[Long] = None) {
    /** 8 fields; a 9th (`eq` — equality-delete sidecar), a 10th/11th
      * (`minA`/`maxA` — the SECOND zone column, over `amt_cents`) and a
      * 12th (PER-COLUMN stats for DECLARED stat columns:
      * `col:min:max[;col:min:max...]` — the generalized zone map, the
      * Iceberg lower/upper-bounds map in miniature) are emitted only when
      * present, so unaffected stores keep the round-13 line format
      * bit-for-bit. Earlier fields get `-` placeholders when a later one
      * needs the width. Range predicates on ANY stat-carrying column prune
      * file planning; a file without a stat for some column simply never
      * prunes on it (conservative, always correct). `rows` is EXACT live
      * rows except on eq-vectored entries, where it is an upper bound (the
      * delete never read the file) — COUNT/MIN/MAX pushdown declines
      * there. */
    def line: String = {
      val needS = stats.nonEmpty || sstats.nonEmpty || nullK.isDefined
      val needA = minA.isDefined || maxA.isDefined || needS
      val needEq = eq.isDefined || needA
      s"$name|$rows|${minK.getOrElse("-")}|${maxK.getOrElse("-")}|" +
        bloom.map(java.lang.Long.toHexString).getOrElse("-") + "|" +
        bytes.getOrElse("-") + "|" + dv.getOrElse("-") + "|" +
        part.getOrElse("-") +
        (if (needEq) "|" + eq.getOrElse("-") else "") +
        (if (needA) s"|${minA.getOrElse("-")}|${maxA.getOrElse("-")}" else "") +
        (if (needS)
           "|" + (if (stats.isEmpty) "-"
                  else stats.map { case (c, lo, hi) => s"$c:$lo:$hi" }.mkString(";"))
         else "") +
        // 13th field: STRING column bounds (`col:<urlenc lo>:<urlenc hi>`)
        // — truncated-prefix min + incremented-prefix max, pruning-only
        (if (sstats.nonEmpty || nullK.isDefined)
           "|" + (if (sstats.isEmpty) "-"
                  else sstats.map { case (c, lo, hi) =>
                    s"$c:${java.net.URLEncoder.encode(lo, "UTF-8")}:" +
                      java.net.URLEncoder.encode(hi, "UTF-8")
                  }.mkString(";"))
         else "") +
        // 14th field: NULL-KEY COUNT (Iceberg null_value_counts for the key
        // column): exact per-file nulls — IS [NOT] NULL file pruning and
        // the sound non-null coverage arithmetic TopN planning needs
        nullK.map(v => s"|$v").getOrElse("")
    }
    /** Read token (`name[@dv][#eq]`): the explicit-files read path and
      * the tail's prefix identity both need the MASKED file — deletion
      * vectors and equality-delete sidecars are part of the file's
      * logical identity. */
    def token: String = name + dv.map("@" + _).getOrElse("") +
      eq.map("#" + _).getOrElse("")
    /** Can this file contain a row whose grp carries ANY of the signatures?
      * (One pushed conjunct = an OR-list of signatures.) Bloomless files
      * always can. */
    def mayContainGrp(sigs: Array[Long]): Boolean = bloom match {
      case Some(b) => sigs.exists(s => (b & s) == s)
      case None    => true
    }
    /** Can this file contain a key in [lo, hi]? Stat-less files always can. */
    def mayContain(lo: Option[Long], hi: Option[Long]): Boolean = (minK, maxK) match {
      case (Some(mn), Some(mx)) =>
        lo.forall(_ <= mx) && hi.forall(_ >= mn)
      case _ => true
    }
    /** Second-zone-column twin of [[mayContain]], over `amt_cents`. */
    def mayContainA(lo: Option[Long], hi: Option[Long]): Boolean = (minA, maxA) match {
      case (Some(mn), Some(mx)) =>
        lo.forall(_ <= mx) && hi.forall(_ >= mn)
      case _ => true
    }
    /** Can this file contain ANY of the (sorted) keys? */
    def mayContainAny(sortedKeys: Array[Long]): Boolean = (minK, maxK) match {
      case (Some(mn), Some(mx)) =>
        val i = java.util.Arrays.binarySearch(sortedKeys, mn)
        val from = if (i >= 0) i else -i - 1
        from < sortedKeys.length && sortedKeys(from) <= mx
      case _ => true
    }
    /** Generalized zone check on a DECLARED stat column: a file carrying
      * no stat for `colName` always may contain (conservative — legacy
      * files, COW-rewritten files, and never-declared columns just don't
      * prune). */
    def mayContainStat(colName: String, lo: Option[Long],
                       hi: Option[Long]): Boolean =
      stats.find(_._1 == colName) match {
        case Some((_, mn, mx)) => lo.forall(_ <= mx) && hi.forall(_ >= mn)
        case None => true
      }
    /** String-column twin: `mn` is a TRUNCATED prefix of the true minimum
      * (≤ it) and `mx` an incremented prefix of the true maximum (≥ it), so
      * the check stays conservative under truncation. Values are recorded
      * ASCII-only (writer guard), where Java string order == UTF-8 binary
      * order — the two engines' comparators agree. */
    def mayContainStrStat(colName: String, lo: Option[String],
                          hi: Option[String]): Boolean =
      sstats.find(_._1 == colName) match {
        case Some((_, mn, mx)) =>
          lo.forall(_.compareTo(mx) <= 0) && hi.forall(_.compareTo(mn) >= 0)
        case None => true
      }
  }

  /** Iceberg-style string-bound truncation: a 16-char lower prefix is a
    * valid lower bound as-is; the upper bound increments the prefix's last
    * incrementable char (None when impossible — that file simply records
    * no upper and never prunes). Non-ASCII values are not truncatable here
    * (comparator mismatch risk) — callers skip them. */
  private[sources] val StrStatPrefixLen = 16
  private[sources] def truncLower(v: String): String =
    v.substring(0, math.min(StrStatPrefixLen, v.length))
  /** Increment the last incrementable char (None when every char is
    * Char.MaxValue) — shared by the file-bound and query-bound paths so
    * the conservative-pruning invariant can't drift between them. */
  private[sources] def incrementLast(p: String): Option[String] = {
    val a = p.toCharArray
    var i = a.length - 1
    while (i >= 0 && a(i) == Char.MaxValue) i -= 1
    if (i < 0) None else Some(new String(a, 0, i) + (a(i) + 1).toChar)
  }
  private[sources] def truncUpper(v: String): Option[String] =
    if (v.length <= StrStatPrefixLen) Some(v)
    else incrementLast(v.substring(0, StrStatPrefixLen))

  /** DECLARED STAT COLUMNS (`graft.stats.cols` table property, comma
    * list): the extra bigint columns whose per-file min/max ride the
    * manifest's 12th field — the Iceberg "which columns get bounds"
    * declaration, resolved table-side so the policy travels with the
    * table. Resolved against the CURRENT schema at write/plan time: a
    * since-dropped or non-bigint name silently contributes nothing. */
  val StatColsProp = "graft.stats.cols"

  private[sources] def declaredStatCols(root: Path, fsys: FileSystem,
                                        dataSchema: StructType): Seq[(String, Int)] = {
    val declared = readProps(root, fsys).toMap.get(StatColsProp)
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    declared.flatMap { c =>
      val i = dataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
      // base k/amt_cents already have dedicated zones; only trailing
      // bigint columns are generalized-stat candidates
      if (i >= 3 && dataSchema.fields(i).dataType == LongType)
        Some((dataSchema.fields(i).name, i))
      else None
    }
  }

  /** STRING twin of [[declaredStatCols]]: declared trailing string columns
    * get truncated-prefix bounds in the manifest's 13th field. */
  private[sources] def declaredStrStatCols(root: Path, fsys: FileSystem,
                                           dataSchema: StructType): Seq[(String, Int)] = {
    val declared = readProps(root, fsys).toMap.get(StatColsProp)
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    declared.flatMap { c =>
      val i = dataSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c))
      if (i >= 3 && dataSchema.fields(i).dataType == StringType)
        Some((dataSchema.fields(i).name, i))
      else None
    }
  }

  private[sources] def parseEntry(l: String): StoreFileEntry =
    if (l.contains('|')) {
      val p = l.split('|')
      def opt(s: String) = if (s == "-") None else Some(s.toLong)
      val bloom =
        if (p.length > 4 && p(4) != "-")
          Some(java.lang.Long.parseUnsignedLong(p(4), 16))
        else None
      val bytes = if (p.length > 5) opt(p(5)) else None
      val dv = if (p.length > 6 && p(6) != "-") Some(p(6)) else None
      val part = if (p.length > 7 && p(7) != "-") Some(p(7)) else None
      val eq = if (p.length > 8 && p(8) != "-") Some(p(8)) else None
      val minA = if (p.length > 9) opt(p(9)) else None
      val maxA = if (p.length > 10) opt(p(10)) else None
      val stats =
        if (p.length > 11 && p(11) != "-")
          p(11).split(';').toSeq.map { s =>
            val q = s.split(':')
            (q(0), q(1).toLong, q(2).toLong)
          }
        else Nil
      val sstats =
        if (p.length > 12 && p(12) != "-")
          p(12).split(';').toSeq.map { s =>
            // -1: an empty string is a legal bound (URLEncoder("") == "")
            val q = s.split(":", -1)
            (q(0), java.net.URLDecoder.decode(q(1), "UTF-8"),
              java.net.URLDecoder.decode(q(2), "UTF-8"))
          }
        else Nil
      val nullK = if (p.length > 13) opt(p(13)) else None
      StoreFileEntry(p(0), p(1).toLong, opt(p(2)), opt(p(3)), bloom, bytes, dv,
        part, eq, minA, maxA, stats, sstats, nullK)
    } else StoreFileEntry(l, -1L, None, None)

  /** Two-probe Bloom signature of a grp value: 2 bits of a 64-bit word from
    * independent murmur3 seeds. A file's bloom is the OR of its rows'
    * signatures; `(bloom & sig) == sig` failing proves the value is absent.
    * Null grps contribute nothing — equality predicates never match null,
    * so an all-null file (bloom 0) pruning for every literal is correct. */
  private[sources] def grpSig(grp: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(grp, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(grp, 0x5bd1e995)
    (1L << (h1 & 63)) | (1L << (h2 & 63))
  }

  /** Committed data file entries (zone maps included), in manifest order. */
  private[sources] def readEntries(root: Path, fsys: FileSystem): Seq[StoreFileEntry] =
    readManifestLines(root, fsys).filterNot(_.startsWith("#")).map(parseEntry)

  /** Test observability: last (planned, kept) zone-map narrowing. */
  @volatile private[sources] var lastZonePrune: Option[(Int, Int)] = None
  /** Last runtime filter handed to a store scan (spec observability). */
  @volatile private[graft] var lastRuntimeFilter: Option[String] = None

  /** Test hook: runs between a DELETE's rewrite computation and its
    * publish — the conflict window the optimistic retry covers. */
  @volatile private[sources] var onDeleteComputed: () => Unit = () => ()

  /** Test observability: last (candidates, kept) partition-value pruning
    * (set only for scans over a partitioned store). */
  @volatile private[sources] var lastPartPrune: Option[(Int, Int)] = None

  /** Last limit-pushdown planning observation: (candidate files, files
    * actually planned after the limit prefix cut). Spec observability. */
  @volatile private[sources] var lastLimitPlan: Option[(Int, Int)] = None

  /** Top-n twin: (candidates, planned after zone-ordered coverage). */
  @volatile private[sources] var lastTopNPlan: Option[(Int, Int)] = None

  /** Offset twin: (candidates, planned after the leading-file drop). */
  @volatile private[sources] var lastOffsetPlan: Option[(Int, Int)] = None

  /** A file's partition key as the InternalRow SPJ alignment compares:
    * bucket ids are ints, identity values are strings (null mark → null). */
  private[sources] def partKeyRow(value: String, isBucket: Boolean): InternalRow =
    if (isBucket) InternalRow(value.toInt)
    else if (value == NullMark) InternalRow(null)
    else InternalRow(UTF8String.fromString(value))

  /** Test observability: (start, end) of each tail batch planned. */
  private[graft] val tailPlans =
    new java.util.concurrent.CopyOnWriteArrayList[(Int, Int)]()

  /** Test-only failure injection for the delete path: when set, the
    * rewrite throws after processing one file — the spec asserts the
    * previous manifest (and its files) survive the abort. */
  @volatile private[sources] var failDeleteAfterOneFile = false

  // ------------------------------------------------- columnar at-rest encoding
  /** Table property selecting the AT-REST encoding of NEW data files:
    * `text` (default — one URL-encoded CSV line per row) or `columnar`.
    * The encoding is a property of each FILE, not the table: files are
    * self-identifying (columnar files open with [[ColMagic]]), so flipping
    * the property mid-table, time-traveling across the flip, CDF-diffing a
    * mixed generation, and compacting text+columnar inputs into columnar
    * outputs all read correctly. Everything ABOVE the file — manifest
    * grammar, zones, blooms, partitions, dv/eq masks, field-id schema —
    * is encoding-blind and unchanged.
    *
    * Columnar grammar (`#GC1` — one row group per file):
    * {{{
    *   #GC1 <nrows> <len1> <len2> ... <lenC>\n
    *   <block1>\n<block2>\n...<blockC>\n
    * }}}
    * Block i holds physical slot i's `nrows` values joined by ',' in
    * EXACTLY the row format's field encoding (digits for int/bigint —
    * so `ALTER COLUMN TYPE BIGINT` widening stays metadata-only —
    * URL-encoded UTF-8 for strings, `\N` for null); `lenI` is the block's
    * UTF-8 byte length. A projected read seeks past unneeded blocks
    * (offset of block i = header + Σ(lenJ+1, j<i)), so scanning 1 of C
    * columns reads ~1/C of the file — the within-file cost the row format
    * could not shed. Files written under an OLDER schema simply carry
    * fewer blocks; a missing block reads as the column's initial default
    * (NULL without one), the same short-row contract as text. At 100 TB
    * a file would hold MULTIPLE such groups (parquet row groups) with the
    * header list per group; one group per file keeps the planning story
    * identical while files stay write-task-sized. */
  val EncodingProp = "graft.store.encoding"
  /** Optional per-block compression for COLUMNAR data files
    * (`graft.store.compress = deflate`): blocks are column-homogeneous, so
    * a cheap JDK deflate pass compresses them well; the `#GC2` header
    * carries `raw:comp` length pairs, planning is untouched, and the
    * reader inflates ONLY the blocks the projection names — compression
    * composes with block skipping instead of fighting it (the parquet
    * page-compression shape). Per-FILE like the encoding itself: flipping
    * the property affects new files only. */
  val CompressProp = "graft.store.compress"
  /** Optional DICTIONARY ENCODING for low-cardinality STRING blocks
    * (`graft.store.dict = on`): a qualifying block stores
    * `n|v0,v1,…|i0,i1,…` — the distinct values once plus one small
    * ordinal per row — and its header length token carries a `d` prefix.
    * Per-BLOCK and self-identifying like everything else in the file
    * grammar: text, plain-columnar, deflated, and dictionary blocks mix
    * freely in one table. Beyond the byte shrink, the dictionary is a
    * block-local predicate index: a pushed string EQUALITY whose value
    * is absent from the dictionary skips the whole group after reading
    * ONE block (the indices — and every other column's blocks — are
    * never parsed), which is the parquet dictionary-page filter shape. */
  val DictProp = "graft.store.dict"
  /** Optional RUN-LENGTH ENCODING for INTEGER blocks
    * (`graft.store.rle = on`): a qualifying block stores `c0*v0,c1*v1,…`
    * run pairs and its header length token carries an `r` prefix.
    * Per-block, self-identifying, and provably-smaller-only, exactly like
    * the string dictionary — and the payoff compounds with the layouts
    * the store already produces: a range-clustered or orderedBy write
    * leaves long constant runs in partition/group/low-cardinality
    * columns, and a sorted key column's delta structure is RLE-friendly
    * after updates collapse to few distinct values. The parquet RLE
    * page shape. */
  val RleProp = "graft.store.rle"

  /** Set (once, at commit) when an `orderedBy` write lands: such files
    * are sorted by (partition value, orderedBy col), NOT by k — the
    * SupportsReportOrdering per-partition `k ASC` claim must be
    * withdrawn for the table from then on (correctness first; a claim
    * over imp-sorted postings would let a merge join drop Sorts over
    * unsorted keys — review catch). */
  val OrderedByProp = "graft.store.ordered.by"
  private[sources] val ColMagic = "#GC1 "
  private[sources] val ColMagicBytes =
    ColMagic.getBytes(StandardCharsets.UTF_8)
  private[sources] val ColMagic2 = "#GC2 "
  private[sources] val ColMagic2Bytes =
    ColMagic2.getBytes(StandardCharsets.UTF_8)

  private[sources] def deflateBytes(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length / 3))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private[sources] def inflateBytes(b: Array[Byte], rawLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(b)
    val out = new Array[Byte](rawLen)
    var got = 0
    while (got < rawLen && !inf.finished())
      got += inf.inflate(out, got, rawLen - got)
    inf.end()
    require(got == rawLen, s"torn compressed block: $got of $rawLen bytes")
    out
  }

  /** Should NEW data files at `pathStr` be columnar? (Writer/COW-side;
    * resolved on the DRIVER at factory construction.) */
  private[sources] def columnarAt(pathStr: String): Boolean = {
    val root = new Path(pathStr)
    readProps(root, fs(root)).toMap.get(EncodingProp).contains("columnar")
  }

  /** Should NEW columnar files deflate their blocks? (No effect on the
    * text encoding — compression is a block-level property.) */
  private[sources] def compressAt(pathStr: String): Boolean = {
    val root = new Path(pathStr)
    readProps(root, fs(root)).toMap.get(CompressProp).contains("deflate")
  }

  /** Rows per columnar GROUP (`graft.store.group.rows`): a writer flushes
    * a complete header+blocks section every N rows, so reader memory is
    * bounded by the group, not the file — the parquet row-group knob. The
    * default keeps typical write-task files single-group. */
  val GroupRowsProp = "graft.store.group.rows"
  private[sources] def groupRowsAt(pathStr: String): Int = {
    val root = new Path(pathStr)
    readProps(root, fs(root)).toMap.get(GroupRowsProp)
      .map(_.toInt).getOrElse(1 << 20)
  }

  /** Should NEW columnar files dictionary-encode qualifying string
    * blocks? (Writer-side, resolved on the driver like the others.) */
  private[sources] def dictAt(pathStr: String): Boolean = {
    val root = new Path(pathStr)
    readProps(root, fs(root)).toMap.get(DictProp).contains("on")
  }

  /** Should NEW columnar files run-length-encode qualifying integer
    * blocks? (Writer-side, resolved on the driver like the others.) */
  private[sources] def rleAt(pathStr: String): Boolean = {
    val root = new Path(pathStr)
    readProps(root, fs(root)).toMap.get(RleProp).contains("on")
  }

  /** Set one table property (read-merge-write under the commit lock). */
  private[graft] def setProp(pathStr: String, key: String, value: String): Unit = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    withCommitLock(root, fsys) {
      val ps = readProps(root, fsys).toMap
      writeProps(root, fsys, (ps + (key -> value)).toSeq)
    }
  }

  /** Run two INDEPENDENT driver actions concurrently (optimization guide
    * §2.6 — Spark's scheduler happily runs several jobs at once; actions
    * are only sequential because driver code calls them sequentially, so
    * the second job's tasks back-fill executors freed by the first's
    * tail). Used by the index builds whose two store commits target
    * DIFFERENT table roots (per-root commit locks never contend) and read
    * from the SAME already-materialized input. `a` runs on a spawned
    * thread — SparkContext keeps job group/description in an
    * InheritableThreadLocal, so the child thread's jobs stay in the
    * caller's group — while `b` runs on the calling thread. Both always
    * run to completion before return; the first failure rethrows. */
  private[graft] def inParallel[A, B](a: => A)(b: => B): (A, B) = {
    @volatile var ra: Either[Throwable, A] = null
    val th = new Thread(() => {
      ra = try Right(a) catch { case e: Throwable => Left(e) }
    }, "graft-parallel-commit")
    th.setDaemon(true)
    th.start()
    val rb = try Right(b) catch { case e: Throwable => Left(e) }
    th.join()
    (ra, rb) match {
      case (Right(x), Right(y)) => (x, y)
      case (Left(e), _)         => throw e
      case (_, Left(e))         => throw e
    }
  }

  /** Test observability: (blocks read, blocks in file) of the last
    * columnar projected read — pins that narrow projections skip blocks. */
  @volatile private[sources] var lastColBlocks: Option[(Int, Int)] = None

  /** Test observability: (groups decoded, groups in file) ACCUMULATED
    * across the partitions of columnar reads since the last reset — pins
    * that per-group zone stats skip groups a pushed predicate excludes. */
  @volatile private[sources] var lastColGroups: Option[(Int, Int)] = None
  private[sources] def addColGroups(read: Int, total: Int): Unit =
    synchronized {
      lastColGroups = Some(lastColGroups.fold((read, total)) {
        case (r, t) => (r + read, t + total)
      })
    }

  /** One field's text encoding — the SHARED per-value codec both the row
    * format (fields joined per ROW) and the columnar format (fields joined
    * per COLUMN) are built from, so a value round-trips identically under
    * either at-rest layout. */
  private[sources] def fieldString(row: InternalRow, ord: Int,
                                   dt: DataType): String =
    if (row.isNullAt(ord)) NullMark
    else dt match {
      case LongType    => java.lang.Long.toString(row.getLong(ord))
      case IntegerType => java.lang.Integer.toString(row.getInt(ord))
      case StringType  =>
        java.net.URLEncoder.encode(row.getString(ord), "UTF-8")
      case dt if isFarr(dt) => floatsToHex(row.getArray(ord))
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }

  /** farr at-rest form: concatenated 8-hex-digit IEEE-754 bit patterns —
    * exact, separator-free, parsed without decimal conversion. */
  private[sources] def floatsToHex(
      a: org.apache.spark.sql.catalyst.util.ArrayData): String = {
    val sb = new StringBuilder(a.numElements() * 8)
    var i = 0
    while (i < a.numElements()) {
      val bits = java.lang.Float.floatToIntBits(a.getFloat(i))
      var sh = 28
      while (sh >= 0) {
        sb.append(java.lang.Character.forDigit((bits >>> sh) & 0xf, 16))
        sh -= 4
      }
      i += 1
    }
    sb.result()
  }

  private[sources] def hexToFloats(s: String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    require(s.length % 8 == 0, s"torn farr value of ${s.length} hex digits")
    val out = new Array[Float](s.length / 8)
    var i = 0
    while (i < out.length) {
      var bits = 0
      var j = 0
      while (j < 8) {
        bits = (bits << 4) | java.lang.Character.digit(s.charAt(i * 8 + j), 16)
        j += 1
      }
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Field-decode twin of [[fieldString]] (`\N` → null; an int slot later
    * widened to bigint decodes under LongType — digits parse wider). */
  private[sources] def parseField(s: String, dt: DataType): Any =
    if (s == NullMark) null
    else dt match {
      case LongType    => java.lang.Long.valueOf(s.toLong)
      case IntegerType => java.lang.Integer.valueOf(s.toInt)
      case StringType  =>
        UTF8String.fromString(java.net.URLDecoder.decode(s, "UTF-8"))
      case dt if isFarr(dt) => hexToFloats(s)
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }

  /** Parsed columnar header: row count, per-block ON-DISK byte lengths
    * (compressed size under `#GC2`), per-block RAW lengths (== lens under
    * `#GC1`), and whether blocks are deflated. `dataStart` is the byte
    * offset of block 0. `gstats` are the GROUP'S zone stats — physical
    * slot → (min, max) over the group's NON-NULL values (the parquet
    * row-group-stats shape): a predicate the group's range excludes skips
    * the whole group without touching a block. Absent for slots the
    * writer didn't track (legacy files, non-stat columns) — absence
    * never prunes. */
  private[sources] case class ColHeader(nrows: Int, lens: Array[Long],
                                        rawLens: Array[Long],
                                        compressed: Boolean,
                                        dataStart: Long,
                                        gstats: Map[Int, (Long, Long)] = Map.empty,
                                        dictFlags: Array[Boolean] = Array.empty,
                                        rleFlags: Array[Boolean] = Array.empty,
                                        dictRleFlags: Array[Boolean] = Array.empty) {
    def isDict(slot: Int): Boolean =
      slot < dictFlags.length && dictFlags(slot)
    def isRle(slot: Int): Boolean =
      slot < rleFlags.length && rleFlags(slot)
    /** Dictionary block whose ORDINAL stream is run-length-encoded (the
      * `e` length-token prefix) — same dictionary semantics as `d`
      * (predicate pre-checks apply identically), denser at rest. */
    def isDictRle(slot: Int): Boolean =
      slot < dictRleFlags.length && dictRleFlags(slot)
    /** Either dictionary form — the predicate-index checks key off the
      * DICTIONARY, not the ordinal layout. */
    def hasDict(slot: Int): Boolean = isDict(slot) || isDictRle(slot)
  }

  /** Sniff + parse the columnar GROUP header at `base`. Returns None
    * (stream repositioned to 0) when the byte run is row-text; the magic
    * is unambiguous — text rows never start with '#' (strings URL-encode
    * it, numeric fields open with a digit or '-', nulls with '\'). */
  private[sources] def readColHeader(
      in: org.apache.hadoop.fs.FSDataInputStream,
      base: Long = 0L): Option[ColHeader] = {
    in.seek(base)
    val magic = new Array[Byte](ColMagicBytes.length)
    var got = 0
    while (got < magic.length) {
      val n = in.read(magic, got, magic.length - got)
      if (n < 0) { in.seek(0L); return None } // shorter than the magic: text
      got += n
    }
    val compressed = java.util.Arrays.equals(magic, ColMagic2Bytes)
    if (!compressed && !java.util.Arrays.equals(magic, ColMagicBytes)) {
      in.seek(0L); return None
    }
    val sb = new StringBuilder
    var b = in.read()
    while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() } // ASCII
    val parts = sb.result().trim.split(" ").filter(_.nonEmpty)
    val nrows = parts(0).toInt
    // group-stat tokens (`@<slot>:<min>:<max>`) ride after the lens —
    // unambiguous: length tokens always open with a digit
    val (statToks, entries0) = parts.drop(1).partition(_.startsWith("@"))
    // a `d` prefix on a length token marks a DICTIONARY-encoded block,
    // an `r` prefix a RUN-LENGTH-encoded one, an `e` prefix a dictionary
    // whose ordinal stream is itself run-length-encoded (all mutually
    // exclusive per block)
    val dictFlags = entries0.map(_.startsWith("d"))
    val rleFlags = entries0.map(_.startsWith("r"))
    val dictRleFlags = entries0.map(_.startsWith("e"))
    val entries = entries0.map(e =>
      if (e.startsWith("d") || e.startsWith("r") || e.startsWith("e"))
        e.substring(1)
      else e)
    val lens = entries.map(e => e.split(':')(0).toLong)
    val rawLens =
      if (compressed) entries.map(e => e.split(':')(1).toLong) else lens
    val gstats = statToks.map { t =>
      val a = t.substring(1).split(':')
      a(0).toInt -> (a(1).toLong, a(2).toLong)
    }.toMap
    Some(ColHeader(nrows, lens, rawLens, compressed,
      base + ColMagicBytes.length + sb.length + 1L, gstats, dictFlags,
      rleFlags, dictRleFlags))
  }

  /** Walk a columnar file's GROUP chain (one header + blocks per group —
    * the parquet row-group shape: a reader holds ONE group's blocks at a
    * time, so memory is bounded by the group-size knob, not the file).
    * None when the file is row-text. */
  private[sources] def readColGroups(
      in: org.apache.hadoop.fs.FSDataInputStream,
      fileLen: Long): Option[Seq[ColHeader]] = {
    readColHeader(in, 0L) match {
      case None => None
      case Some(first) =>
        val groups = Seq.newBuilder[ColHeader]
        var h = first
        groups += h
        var pos = h.dataStart + h.lens.map(_ + 1L).sum
        while (pos < fileLen) {
          h = readColHeader(in, pos).getOrElse(throw new IllegalStateException(
            s"torn columnar group chain at byte $pos of $fileLen"))
          groups += h
          pos = h.dataStart + h.lens.map(_ + 1L).sum
        }
        Some(groups.result())
    }
  }

  /** Load one block's TEXT (seek + readFully + inflate-if-compressed). */
  private def loadBlockText(in: org.apache.hadoop.fs.FSDataInputStream,
                            h: ColHeader, s: Int): String = {
    var off = h.dataStart
    var j = 0
    while (j < s) { off += h.lens(j) + 1L; j += 1 }
    in.seek(off)
    val buf = new Array[Byte](h.lens(s).toInt)
    in.readFully(buf)
    val raw = if (h.compressed) inflateBytes(buf, h.rawLens(s).toInt) else buf
    new String(raw, StandardCharsets.UTF_8)
  }

  /** A loaded column block's value accessor — plain text-with-offsets
    * ([[ColBlock]]) or dictionary-decoded ([[DictBlock]]). */
  private[sources] sealed trait ColValues {
    def isNull(r: Int): Boolean
    def long(r: Int): Long
    def raw(r: Int): String
    /** The block-local dictionary (URL-encoded values), when present. */
    def dictValues: Option[Array[String]] = None
  }

  /** Dictionary block: `n|v0,v1,…|i0,i1,…` decoded once into the value
    * table + per-row ordinals — same memory shape as offsets (one int
    * per row), repeated strings stored once. */
  private[sources] final class DictBlock(values: Array[String],
                                         idx: Array[Int]) extends ColValues {
    override def isNull(r: Int): Boolean = values(idx(r)) == NullMark
    override def long(r: Int): Long = raw(r).toLong
    override def raw(r: Int): String = values(idx(r))
    override def dictValues: Option[Array[String]] = Some(values)
  }

  private[sources] def parseDictBlock(text: String, nrows: Int): DictBlock = {
    val p1 = text.indexOf('|')
    val p2 = text.indexOf('|', p1 + 1)
    val n = text.substring(0, p1).toInt
    val values =
      if (n == 0) Array.empty[String]
      else text.substring(p1 + 1, p2).split(",", -1)
    require(values.length == n, s"torn dictionary block: ${values.length} != $n")
    val idx = new Array[Int](nrows)
    var i = p2 + 1
    var r = 0
    while (r < nrows) {
      // corruption must be LOUD (the ColBlock offset-check discipline):
      // a truncated ordinal list would otherwise silently decode the
      // missing tail as ordinal 0
      val start = i
      var v = 0
      while (i < text.length && text.charAt(i) != ',') {
        v = v * 10 + (text.charAt(i) - '0'); i += 1
      }
      require(i > start, s"torn dict block: ordinals end after $r of $nrows rows")
      require(v < math.max(n, 1), s"torn dict block: ordinal $v >= $n at row $r")
      i += 1
      idx(r) = v
      r += 1
    }
    require(i >= text.length,
      s"torn dict block: ordinal section holds more than $nrows rows")
    new DictBlock(values, idx)
  }

  /** Encode a string block's values as a dictionary block when it
    * qualifies (≥ 16 rows, ≤ 64 distinct covering at most half the
    * rows); None = plain text is the better layout. Values are the
    * at-rest (URL-encoded) forms, so ',' and '|' never appear inside. */
  private[sources] def dictBlockText(values: Array[String]): Option[String] = {
    if (values.length < 16) return None
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var ok = true
    values.foreach { v =>
      if (ok && !seen.contains(v)) {
        if (seen.size >= 64) ok = false else seen(v) = seen.size
      }
    }
    if (!ok || seen.size * 2 > values.length) return None
    val plainLen = values.map(_.length + 1).sum - 1
    val sb = new StringBuilder
    sb.append(seen.size).append('|')
    var first = true
    seen.keysIterator.foreach { v =>
      if (!first) sb.append(','); sb.append(v); first = false
    }
    sb.append('|')
    var r = 0
    while (r < values.length) {
      if (r > 0) sb.append(',')
      sb.append(seen(values(r)))
      r += 1
    }
    // the dictionary must EARN its keep: short values (1-char statuses)
    // cost as much as their ordinals — keep plain text then
    if (sb.length >= plainLen) None else Some(sb.result())
  }

  /** COMPOSE RLE WITH DICT ORDINALS (round-13 verdict #8): re-encode a
    * qualifying dictionary block's ORDINAL stream as `c*o` run pairs —
    * `n|values|c0*o0,c1*o1,…`, the `e` length-token prefix. The layouts
    * the store already produces make this the common dense case: a
    * range-clustered / orderedBy / partitioned write leaves a sorted
    * low-cardinality string column as a handful of LONG ordinal runs, so
    * the per-row ordinal cost collapses to one token per run (the
    * parquet RLE/bit-packed hybrid over dictionary indices). Guarded by
    * the same provably-smaller-only rule: returns None unless the run
    * form is strictly smaller than the plain-ordinal dictionary (which
    * itself already beat plain text), so unclustered blocks keep the
    * `d` layout and unique-ish columns keep plain. */
  private[sources] def dictRleFromDict(dict: String): Option[String] = {
    val p2 = dict.indexOf('|', dict.indexOf('|') + 1)
    val ords = dict.substring(p2 + 1).split(",", -1)
    val sb = new StringBuilder(dict.substring(0, p2 + 1))
    var i = 0
    while (i < ords.length) {
      var j = i + 1
      while (j < ords.length && ords(j) == ords(i)) j += 1
      if (i > 0) sb.append(',')
      sb.append(j - i).append('*').append(ords(i))
      if (sb.length >= dict.length) return None // not smaller: keep `d`
      i = j
    }
    Some(sb.result())
  }

  /** Parse an `e` block: the dictionary half exactly like [[parseDictBlock]],
    * the ordinal half run-decoded with the RLE loudness checks (a torn
    * run list must never silently decode short, repeat, or point past
    * the dictionary). Decodes to the same [[DictBlock]] shape — readers
    * and the dictionary predicate pre-checks are layout-blind. */
  private[sources] def parseDictRleBlock(text: String, nrows: Int): DictBlock = {
    val p1 = text.indexOf('|')
    val p2 = text.indexOf('|', p1 + 1)
    val n = text.substring(0, p1).toInt
    val values =
      if (n == 0) Array.empty[String]
      else text.substring(p1 + 1, p2).split(",", -1)
    require(values.length == n,
      s"torn dict-rle block: ${values.length} != $n dictionary values")
    val runs = text.substring(p2 + 1).split(",", -1)
    val idx = new Array[Int](nrows)
    var r = 0
    runs.foreach { run =>
      val p = run.indexOf('*')
      require(p > 0, s"torn dict-rle block: run '$run' has no count")
      val c = run.substring(0, p).toInt
      require(c >= 1, s"torn dict-rle block: run count $c < 1")
      val v = run.substring(p + 1).toInt
      require(v >= 0 && v < math.max(n, 1),
        s"torn dict-rle block: ordinal $v >= $n")
      var m = 0
      while (m < c) {
        require(r < nrows,
          s"torn dict-rle block: runs cover more than $nrows rows")
        idx(r) = v; r += 1; m += 1
      }
    }
    require(r == nrows,
      s"torn dict-rle block: runs cover $r of $nrows rows")
    new DictBlock(values, idx)
  }

  /** Run block: `c0*v0,c1*v1,…` decoded into per-run values plus a
    * per-row run index — the DictBlock memory shape (one int per row),
    * each run's value stored once. NOT exposed as a dictionary: run
    * values can repeat across runs, and integer predicates are already
    * served by zone stats. */
  private[sources] final class RunBlock(values: Array[String],
                                        idx: Array[Int]) extends ColValues {
    override def isNull(r: Int): Boolean = values(idx(r)) == NullMark
    override def long(r: Int): Long = raw(r).toLong
    override def raw(r: Int): String = values(idx(r))
  }

  private[sources] def parseRleBlock(text: String, nrows: Int): RunBlock = {
    // corruption must be LOUD (the dict/ColBlock discipline): a truncated
    // run list must never silently decode short or repeat a run
    val runs =
      if (text.isEmpty) Array.empty[String] else text.split(",", -1)
    val values = new Array[String](runs.length)
    val idx = new Array[Int](nrows)
    var r = 0
    var ri = 0
    while (ri < runs.length) {
      val run = runs(ri)
      val p = run.indexOf('*')
      require(p > 0, s"torn RLE block: run '$run' has no count")
      val c = run.substring(0, p).toInt
      require(c >= 1, s"torn RLE block: run count $c < 1")
      values(ri) = run.substring(p + 1)
      var n = 0
      while (n < c) {
        require(r < nrows,
          s"torn RLE block: runs cover more than $nrows rows")
        idx(r) = ri; r += 1; n += 1
      }
      ri += 1
    }
    require(r == nrows, s"torn RLE block: runs cover $r of $nrows rows")
    new RunBlock(values, idx)
  }

  /** Encode an integer block's values as RLE runs when it qualifies
    * (≥ 16 rows) AND the runs are provably smaller than plain text —
    * high-cardinality blocks (a unique key column in arrival order) keep
    * the plain layout, exactly the dictionary's earn-its-keep rule.
    * At-rest integer tokens are digits/'-'/`\N`, so '*' and ',' never
    * occur inside a value. */
  private[sources] def rleBlockText(values: Array[String]): Option[String] = {
    if (values.length < 16) return None
    val plainLen = values.map(_.length + 1).sum - 1
    val sb = new StringBuilder
    var i = 0
    while (i < values.length) {
      var j = i + 1
      while (j < values.length && values(j) == values(i)) j += 1
      if (i > 0) sb.append(',')
      sb.append(j - i).append('*').append(values(i))
      if (sb.length >= plainLen) return None // not smaller: keep plain
      i = j
    }
    Some(sb.result())
  }

  /** One loaded column block: the raw text plus per-value OFFSETS —
    * values parse straight out of the block (no per-value String
    * materialization; a 20-column file would otherwise hold millions of
    * short-lived strings live at once). Value r spans
    * [offs(r), offs(r+1) - 1) (the -1 drops the comma; the last value
    * runs to the end). */
  private[sources] final class ColBlock(val text: String,
                                        private val offs: Array[Int]) extends ColValues {
    @inline private def start(r: Int): Int = offs(r)
    @inline private def end(r: Int): Int =
      if (r + 1 < offs.length) offs(r + 1) - 1 else text.length
    def isNull(r: Int): Boolean = {
      val a = start(r)
      end(r) - a == 2 && text.charAt(a) == '\\' && text.charAt(a + 1) == 'N'
    }
    def long(r: Int): Long = {
      var i = start(r); val e = end(r)
      var neg = false
      if (text.charAt(i) == '-') { neg = true; i += 1 }
      var v = 0L
      while (i < e) { v = v * 10 + (text.charAt(i) - '0'); i += 1 }
      if (neg) -v else v
    }
    def raw(r: Int): String = text.substring(start(r), end(r))
  }

  /** Read SELECTED blocks of a columnar file: seeks past everything else.
    * `slots` beyond the file's width are absent from the result (the
    * caller pads the column's default — the short-file contract). Records
    * [[lastColBlocks]]. */
  private[sources] def readColBlocks(in: org.apache.hadoop.fs.FSDataInputStream,
                                     h: ColHeader,
                                     slots: Array[Int],
                                     preloaded: Map[Int, ColValues] = Map.empty): Map[Int, ColValues] = {
    val want = slots.filter(_ < h.lens.length).distinct.sorted
    val out = Map.newBuilder[Int, ColValues]
    // blocks a pre-check already decoded (the dict group filter) are
    // reused, never re-read
    want.foreach { s => out += s -> preloaded.getOrElse(s, readOneBlock(in, h, s)) }
    // keep the WIDEST read since the last reset: partition readers race
    // and only some files carry masks (their readers add the key block) —
    // last-writer-wins made the eq-mask pin order-dependent (observed
    // 1-in-6 flake)
    synchronized {
      lastColBlocks = Some(lastColBlocks.fold((want.length, h.lens.length)) {
        case (w, t) => (math.max(w, want.length), math.max(t, h.lens.length))
      })
    }
    out.result()
  }

  private[sources] def readOneBlock(in: org.apache.hadoop.fs.FSDataInputStream,
                                    h: ColHeader, s: Int): ColValues = {
    val text = loadBlockText(in, h, s)
    if (h.isDict(s)) parseDictBlock(text, h.nrows)
    else if (h.isDictRle(s)) parseDictRleBlock(text, h.nrows)
    else if (h.isRle(s)) parseRleBlock(text, h.nrows)
    else {
      val offs = new Array[Int](math.max(h.nrows, 0))
      if (h.nrows > 0) {
        offs(0) = 0
        var r = 1
        var i = 0
        while (r < h.nrows) {
          i = text.indexOf(',', i)
          require(i >= 0, s"columnar block $s holds too few values for ${h.nrows} rows")
          i += 1
          offs(r) = i
          r += 1
        }
        require(text.indexOf(',', i) < 0,
          s"columnar block $s holds too many values for ${h.nrows} rows")
      }
      new ColBlock(text, offs)
    }
  }

  /** Iterate a data file's rows as full-width TEXT LINES regardless of
    * at-rest encoding — the shared row view for paths that genuinely need
    * every column (COW rewrite, CDF, analyze backfill). Text streams
    * lazily; a columnar file materializes its blocks (file-sized, the row
    * group contract) and re-joins rows. Returns (iterator, closer). */
  private[sources] def openDataLines(fsys: FileSystem,
                                     p: Path): (Iterator[String], () => Unit) = {
    val in = fsys.open(p)
    val fileLen = fsys.getFileStatus(p).getLen
    readColGroups(in, fileLen) match {
      case Some(groups) =>
        // lazy per-group materialization: one group's blocks live at a time
        val it = groups.iterator.flatMap { h =>
          val cols = (0 until h.lens.length).map { s =>
            if (h.nrows == 0) Array.empty[String]
            else if (h.isDict(s)) {
              val db = parseDictBlock(loadBlockText(in, h, s), h.nrows)
              Array.tabulate(h.nrows)(db.raw)
            } else if (h.isDictRle(s)) {
              val db = parseDictRleBlock(loadBlockText(in, h, s), h.nrows)
              Array.tabulate(h.nrows)(db.raw)
            } else if (h.isRle(s)) {
              val rb = parseRleBlock(loadBlockText(in, h, s), h.nrows)
              Array.tabulate(h.nrows)(rb.raw)
            } else loadBlockText(in, h, s).split(",", -1)
          }.toArray
          (0 until h.nrows).iterator.map { r =>
            val sb = new StringBuilder
            var c = 0
            while (c < cols.length) {
              if (c > 0) sb.append(',')
              sb.append(cols(c)(r))
              c += 1
            }
            sb.result()
          }
        }
        (it, () => in.close())
      case None =>
        val rd = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
        val it = new Iterator[String] {
          private var nextLine = rd.readLine()
          override def hasNext: Boolean = nextLine != null
          override def next(): String = {
            val l = nextLine; nextLine = rd.readLine(); l
          }
        }
        (it, () => rd.close())
    }
  }

  /** Serialize uniform-width text rows as a columnar file's bytes —
    * chunked into GROUPS of `groupRows` (ordinals run across groups, so
    * dv masks are untouched by the grouping). */
  private[sources] def columnarFileBytes(lines: Seq[String],
                                         compress: Boolean = false,
                                         groupRows: Int = 1 << 20,
                                         dictSlots: Set[Int] = Set.empty,
                                         statSlots: Seq[Int] = Seq(0),
                                         rleSlots: Set[Int] = Set.empty): Array[Byte] = {
    val width = if (lines.isEmpty) 0 else lines.head.count(_ == ',') + 1
    val slots = statSlots.filter(s => s >= 0 && s < width)
    val out = new java.io.ByteArrayOutputStream()
    lines.grouped(math.max(1, groupRows)).foreach { group =>
      val bufs = Array.fill(width)(new StringBuilder)
      // per-group zone stats for the caller's long-typed slots (slot 0 —
      // `k` — always; COW callers add amt + declared stat slots so group
      // skipping survives maintenance rewrites)
      val sMin = Array.fill(slots.size)(Long.MaxValue)
      val sMax = Array.fill(slots.size)(Long.MinValue)
      var r = 0
      group.foreach { l =>
        val f = l.split(",", -1)
        require(f.length == width, s"ragged row width ${f.length} != $width")
        var si = 0
        while (si < slots.size) {
          val c = slots(si)
          if (f(c) != NullMark && f(c).nonEmpty) {
            val v = f(c).toLong
            if (v < sMin(si)) sMin(si) = v
            if (v > sMax(si)) sMax(si) = v
          }
          si += 1
        }
        var c = 0
        while (c < width) {
          // separator by ROW INDEX — a buffer-emptiness test would drop
          // the comma after a leading EMPTY-STRING value, tearing the block
          if (r > 0) bufs(c).append(',')
          bufs(c).append(f(c))
          c += 1
        }
        r += 1
      }
      val gs = slots.indices.flatMap { si =>
        if (sMin(si) == Long.MaxValue) None
        else Some((slots(si), sMin(si), sMax(si)))
      }
      out.write(columnarBytes(group.size, bufs, compress, gs, dictSlots,
        rleSlots))
    }
    out.toByteArray
  }

  /** Assemble header + blocks from per-column builders (deflating each
    * block under `compress` — the `#GC2` grammar). */
  private[sources] def columnarBytes(nrows: Int,
                                     bufs: Array[StringBuilder],
                                     compress: Boolean = false,
                                     gstats: Seq[(Int, Long, Long)] = Nil,
                                     dictSlots: Set[Int] = Set.empty,
                                     rleSlots: Set[Int] = Set.empty): Array[Byte] = {
    // dictionary-qualify the declared string slots and RLE-qualify the
    // integer slots block by block; a `d`/`r` length-token prefix marks
    // the encoded ones (self-identifying). A string slot in BOTH sets
    // (dict + rle tables) additionally tries the RLE-ordinal dictionary
    // form (`e`) — picked only when provably smaller than `d`, which was
    // itself provably smaller than plain: the strictly-shrinking chain.
    val encoded: Array[(Array[Byte], String)] = bufs.indices.map { s =>
      val plain = bufs(s).result()
      val (enc, marker) =
        if (nrows > 0 && dictSlots.contains(s)) {
          val d = dictBlockText(plain.split(",", -1))
          val e = if (rleSlots.contains(s)) d.flatMap(dictRleFromDict) else None
          if (e.isDefined) (e, "e") else (d, "d")
        } else if (nrows > 0 && rleSlots.contains(s))
          (rleBlockText(plain.split(",", -1)), "r")
        else (None, "")
      (enc.getOrElse(plain).getBytes(StandardCharsets.UTF_8),
        if (enc.isDefined) marker else "")
    }.toArray
    val rawBlocks = encoded.map(_._1)
    def dPfx(i: Int): String = encoded(i)._2
    val blocks = if (compress) rawBlocks.map(deflateBytes) else rawBlocks
    // per-group zone stats ride the header as `@<slot>:<min>:<max>` tokens
    val statPart = gstats.map { case (s, mn, mx) => s" @$s:$mn:$mx" }.mkString
    val header = (if (compress)
        ColMagic2 + nrows + blocks.indices.map(i =>
          s" ${dPfx(i)}${blocks(i).length}:${rawBlocks(i).length}").mkString +
          statPart + "\n"
      else ColMagic + nrows + blocks.indices.map(i =>
          s" ${dPfx(i)}${blocks(i).length}").mkString +
        statPart + "\n")
      .getBytes(StandardCharsets.UTF_8)
    val total = header.length + blocks.map(_.length + 1).sum
    val out = new Array[Byte](total)
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    blocks.foreach { b =>
      System.arraycopy(b, 0, out, off, b.length)
      off += b.length
      out(off) = '\n'; off += 1
    }
    out
  }

  /** Write text rows to `p` under the requested at-rest encoding; returns
    * bytes written — the COW-rewrite write path (the streaming writer
    * builds its column buffers directly, never through lines). */
  private[sources] def writeDataFile(fsys: FileSystem, p: Path,
                                     lines: Seq[String],
                                     columnar: Boolean,
                                     compress: Boolean = false,
                                     groupRows: Int = 1 << 20,
                                     dictSlots: Set[Int] = Set.empty,
                                     statSlots: Seq[Int] = Seq(0),
                                     rleSlots: Set[Int] = Set.empty): Long = {
    val bytes =
      if (columnar && lines.nonEmpty)
        columnarFileBytes(lines, compress, groupRows, dictSlots, statSlots,
          rleSlots)
      else lines.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8)
    val out = fsys.create(p, true)
    try out.write(bytes) finally out.close()
    bytes.length.toLong
  }

  // ------------------------------------------------- deletion vectors (MoR)
  /** MERGE-ON-READ delete policy: when a file's newly-matched fraction of
    * live rows is at or below this, the delete writes a deletion-vector
    * SIDECAR (physical line ordinals) instead of rewriting the file —
    * selective deletes (GDPR single-row, CDC trickle) cost O(matched)
    * metadata, not O(file) bytes. Bulk deletes above the threshold rewrite
    * copy-on-write as before, absorbing any existing vector. Readers apply
    * the mask; compaction absorbs vectors into clean files. */
  private[sources] val MorMaxFraction = 0.2

  /** Deletion-vector sidecar: ascending physical line ordinals, one per
    * line. Immutable — a later delete writes a NEW vector absorbing the
    * old one; vacuum GCs unreferenced vectors. */
  private[sources] def readDv(root: Path, fsys: FileSystem,
                              name: String): Array[Int] = {
    val raw = manifestFs(fsys)
    val in = raw.open(new Path(root, name))
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      .split("\n").map(_.trim).filter(_.nonEmpty).map(_.toInt)
    finally in.close()
  }

  private[sources] def writeDv(root: Path, fsys: FileSystem, name: String,
                               positions: Seq[Int]): Unit = {
    val raw = manifestFs(fsys)
    val out = raw.create(new Path(root, name), true)
    try out.write(positions.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** EQUALITY-delete sidecar: ascending deleted KEY values, one per line —
    * the Iceberg-v2 second merge-on-read shape. Attached WITHOUT reading
    * the data file (zone-matched attach only), which is the whole point:
    * a keyed delete from a writer that cannot afford the read (streaming
    * upsert retraction, GDPR-by-key against a cold table) costs O(keys)
    * metadata and zero data I/O. Readers drop rows whose key is in the
    * set; `rows` on an eq-vectored entry is an UPPER BOUND (agg pushdown
    * declines); any COW rewrite (bulk delete, row-level op, compaction)
    * absorbs the sidecar into a clean file. Immutable — a later equality
    * delete writes a NEW sidecar absorbing the old; vacuum GCs
    * unreferenced ones with their generations. */
  private[sources] def readEq(root: Path, fsys: FileSystem,
                              name: String): Array[Long] = {
    val raw = manifestFs(fsys)
    val in = raw.open(new Path(root, name))
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      .split("\n").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    finally in.close()
  }

  private[sources] def writeEq(root: Path, fsys: FileSystem, name: String,
                               keys: Seq[Long]): Unit = {
    val raw = manifestFs(fsys)
    val out = raw.create(new Path(root, name), true)
    try out.write(keys.distinct.sorted.mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Metadata-only equality delete: attach zone-matched key sidecars under
    * the commit lock in ONE manifest swap. No data file is read or
    * written. Supports a single `k IN (...)`/`k = v` predicate — the
    * keyed-retraction shape; anything richer needs the row-reading paths
    * (ordinal vectors / COW), which know actual row contents. */
  private[sources] def equalityDelete(pathStr: String,
                                      filters: Array[Filter]): Unit = {
    val keys: Array[Long] = filters match {
      case Array(In("k", vs)) => vs.map {
        case l: java.lang.Long    => l.longValue
        case i: java.lang.Integer => i.longValue
        case other => throw new IllegalArgumentException(
          s"equality delete: non-integral key $other")
      }
      case Array(EqualTo("k", v: java.lang.Long))    => Array(v.longValue)
      case Array(EqualTo("k", v: java.lang.Integer)) => Array(v.longValue)
      case _ => throw new IllegalArgumentException(
        "equality delete mode requires a single IN/= predicate on k, got: " +
          filters.mkString(", "))
    }
    val sorted = keys.distinct.sorted
    val root = new Path(pathStr)
    val fsys = fs(root)
    val gen = System.nanoTime().toHexString
    withCommitLock(root, fsys) {
      val lines = readManifestLines(root, fsys)
      val newLines = lines.map { l =>
        if (l.startsWith("#")) l
        else {
          val e = parseEntry(l)
          val mine = sorted.filter(k => e.mayContain(Some(k), Some(k)))
          if (mine.isEmpty) l // zone-missed file carries over untouched
          else {
            val prev = e.eq.map(q => readEq(root, fsys, q).toSeq)
              .getOrElse(Nil)
            val eqName = s"${e.name}.eq-$gen"
            writeEq(root, fsys, eqName, prev ++ mine)
            e.copy(eq = Some(eqName)).line
          }
        }
      }
      if (newLines != lines) writeManifestAtomic(root, fsys, newLines)
    }
  }

  // ------------------------------------------------- partition spec
  /** Table PARTITIONING, persisted as a one-line `_partition` sidecar and
    * declared at creation (`CREATE TABLE ... PARTITIONED BY (...)` through
    * the graft catalog, a `partitionedBy` write option, or the Transform
    * array Spark hands `getTable`). Two transforms over the immutable base
    * prefix:
    *
    *   - `identity:grp`  — one directory per distinct dimension value
    *     (`grp=<v>/`), the Hive/Iceberg identity layout: partition pruning
    *     answers grp point/IN predicates EXACTLY (the bloom is
    *     probabilistic), and store⋈store joins on grp are
    *     storage-partitioned (no exchange).
    *   - `bucket:<n>:k`  — floorMod(k, n) key buckets (`k_bucket=<b>/`),
    *     the fact-table layout: an equi-join of two stores bucketed the
    *     same way on k plans ZERO shuffles (KeyGroupedPartitioning +
    *     HasPartitionKey, resolved through the catalog's `bucket`
    *     V2 function), which at 100 TB removes both full-table exchanges
    *     from every fact⋈fact join — the reason bucketing exists.
    *
    * Writers route rows to one staged file per partition value they see;
    * each manifest entry records its value (8th field), so pruning and the
    * SPJ report are MANIFEST-only — the directories are layout, never the
    * source of truth. The spec is immutable once set (append with a
    * different spec fails loudly; a full overwrite may re-partition). */
  val PartFile = "_partition"

  case class PartSpec(kind: String, col: String, n: Int, id: Int = 1) {
    def line: String =
      if (kind == "bucket") s"bucket:$n:$col" else s"identity:$col"
    /** Ordinal of the source column in the BASE schema (k=0, grp=1). */
    private def ordinal: Int = if (col == "k") 0 else 1
    /** Partition value of a row (manifest-field form). Null keys bucket to
      * -1; null identity values keep the encode-layer null mark. */
    def valueOf(row: InternalRow, base: Int): String =
      if (kind == "bucket") {
        if (row.isNullAt(base + ordinal)) "-1"
        else java.lang.Math.floorMod(row.getLong(base + ordinal), n.toLong).toString
      } else {
        if (row.isNullAt(base + ordinal)) NullMark
        else row.getUTF8String(base + ordinal).toString
      }
    /** SPEC-EVOLUTION manifest tag: files written under a non-initial spec
      * record `<specId>~<value>` so planning resolves each file under the
      * spec IT was written with (the Iceberg per-file spec-id field in
      * miniature); initial-spec files stay bare — the round-14 format is a
      * bit-for-bit subset. */
    def tagged(value: String): String = if (id <= 1) value else s"$id~$value"
    /** Partition directory for a value (sanitized — the manifest field
      * carries the exact value; the dir is layout only). Later specs get an
      * `s<id>_` prefix so generations never collide on disk. */
    def dirOf(value: String): String = {
      val d =
        if (kind == "bucket") s"${col}_bucket=$value"
        else if (value == NullMark) s"$col=__null__"
        else s"$col=" + value.replaceAll("[^A-Za-z0-9_.-]", "_")
      if (id <= 1) d else s"s${id}_$d"
    }
    def toTransform: Transform =
      if (kind == "bucket")
        org.apache.spark.sql.connector.expressions.Expressions.bucket(n, col)
      else org.apache.spark.sql.connector.expressions.Expressions.identity(col)
  }

  /** Split a manifest part field into (spec id, raw value): bare values are
    * initial-spec (id 1). */
  private[sources] def partTag(p: String): (Int, String) = {
    val i = p.indexOf('~')
    if (i <= 0) (1, p)
    else if (p.substring(0, i).forall(_.isDigit)) (p.substring(0, i).toInt,
      p.substring(i + 1))
    else (1, p)
  }

  private[sources] def parsePartSpec(s: String): PartSpec = s.split(':') match {
    case Array("identity", c) =>
      require(c == "grp", s"graft-store identity partitioning supports grp, got $c")
      PartSpec("identity", c, 0)
    case Array("bucket", n, c) =>
      require(c == "k", s"graft-store bucket partitioning supports k, got $c")
      require(n.toInt > 0, s"bucket count must be positive, got $n")
      PartSpec("bucket", c, n.toInt)
    case _ => throw new IllegalArgumentException(
      s"unparseable partition spec: $s (identity:grp | bucket:<n>:k)")
  }

  /** SPEC EVOLUTION: the `_partition` sidecar is a VERSIONED REGISTRY —
    * either the legacy single spec line (= spec id 1, immutable meaning) or
    * `<id>|<spec or '-'>` lines, current spec LAST. `CALL
    * graft.repartition_spec` appends a new id; ids are never reused or
    * redefined, so a manifest entry's `<id>~<value>` tag resolves to the
    * same spec forever — archived generations (time travel, CDF) plan under
    * the spec they were written with. */
  private[sources] def readPartSpecs(root: Path,
                                     fsys: FileSystem): Seq[(Int, Option[PartSpec])] = {
    val raw = manifestFs(fsys)
    val pf = new Path(root, PartFile)
    if (!raw.exists(pf)) return Nil
    val in = raw.open(pf)
    val txt = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim
      finally in.close()
    if (txt.isEmpty) return Nil
    val lines = txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    if (!lines.head.contains("|"))
      Seq((1, Some(parsePartSpec(lines.head)))) // legacy single-spec file
    else lines.map { l =>
      val Array(i, s) = l.split("\\|", 2)
      val id = i.toInt
      (id, if (s == "-") None else Some(parsePartSpec(s).copy(id = id)))
    }
  }

  /** The CURRENT spec, or None for an unpartitioned store. */
  private[sources] def readPartSpec(root: Path, fsys: FileSystem): Option[PartSpec] =
    readPartSpecs(root, fsys).lastOption.flatMap(_._2)

  /** Append a new spec generation (caller holds the commit lock). `specStr`
    * is `identity:grp` / `bucket:<n>:k` / `none`; the file upgrades to the
    * registry format, prior ids preserved verbatim. Returns the new spec.
    * Refuses a no-op (same spec as current). */
  private[sources] def appendPartSpec(root: Path, fsys: FileSystem,
                                      specStr: String): (Int, Option[PartSpec]) = {
    val specs = readPartSpecs(root, fsys)
    val nextId = (1 +: specs.map(_._1)).max + 1
    val parsed =
      if (specStr == "none") None
      else Some(parsePartSpec(specStr).copy(id = nextId))
    val cur = specs.lastOption.flatMap(_._2)
    require(cur.map(_.line) != parsed.map(_.line),
      s"spec $specStr is already the current partitioning")
    val lines = (if (specs.isEmpty) Seq((1, None)) else specs)
      .map { case (i, os) => s"$i|${os.map(_.line).getOrElse("-")}" } :+
      s"$nextId|${parsed.map(_.line).getOrElse("-")}"
    val raw = manifestFs(fsys)
    val out = raw.create(new Path(root, PartFile), true)
    try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    (nextId, parsed)
  }

  private[sources] def writePartSpec(root: Path, fsys: FileSystem,
                                     spec: PartSpec): Unit = {
    val raw = manifestFs(fsys)
    val out = raw.create(new Path(root, PartFile), true)
    try out.write(spec.line.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Persist a write-resolved spec: a fresh table gets the legacy one-line
    * file (id 1); a spec CHANGE on a table with history appends a registry
    * generation — validating that the id the write tagged its files with is
    * the id actually registered (a concurrent spec change is a loud race,
    * never a silent mis-tag). */
  private[sources] def persistResolvedSpec(root: Path, fsys: FileSystem,
                                           sp: PartSpec): Unit = {
    val specs = readPartSpecs(root, fsys)
    if (specs.isEmpty) writePartSpec(root, fsys, sp)
    else if (specs.last._2.map(_.line).contains(sp.line)) ()
    else {
      val (nid, _) = appendPartSpec(root, fsys, sp.line)
      if (nid != sp.id) throw new java.util.ConcurrentModificationException(
        s"partition-spec id raced: write tagged files with spec ${sp.id} " +
          s"but the registry assigned $nid — re-run the write")
    }
  }

  /** Translate Spark's Transform array (CTAS PARTITIONED BY / partitionBy)
    * into the store's spec; anything but a single identity/bucket transform
    * over a base column is refused loudly, never silently ignored. */
  private[sources] def specOf(transforms: Array[Transform]): Option[PartSpec] = {
    if (transforms.isEmpty) return None
    require(transforms.length == 1,
      s"graft-store supports one partition transform, got ${transforms.mkString(", ")}")
    val t = transforms(0)
    val refs = t.references()
    require(refs.length == 1,
      s"graft-store partition transforms take one column, got ${t.describe()}")
    val col = refs(0).fieldNames().mkString(".")
    t.name() match {
      case "identity" => Some(parsePartSpec(s"identity:$col"))
      case "bucket" =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value().toString
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform without a bucket count: ${t.describe()}"))
        Some(parsePartSpec(s"bucket:$n:$col"))
      case other => throw new IllegalArgumentException(
        s"graft-store supports identity/bucket partitioning, got $other")
    }
  }

  /** md5 of a UTF-8 string as lowercase hex (prefix-identity signatures). */
  private[sources] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private[sources] def fs(p: Path): FileSystem =
    p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  private[sources] def fs(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf)

  /** Manifest I/O goes through the RAW filesystem on checksum-wrapped
    * local FS: the `.crc` SIDECAR breaks the atomic-swap contract — a
    * reader can open the old manifest while the rename replaces the
    * sidecar, and the mismatched pair throws ChecksumException (observed
    * from the store-tail stream polling latestOffset during an append).
    * One file, one rename, no sidecar = genuinely atomic. HDFS/object
    * stores checksum inline, so this is a local-FS-only unwrap. */
  private[sources] def manifestFs(fsys: FileSystem): FileSystem = fsys match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case f => f
  }

  // ------------------------------------------------- manifest tree
  /** The manifest is a TREE, not a flat file: the `_manifest` LIST holds
    * epoch markers, loose entry lines, and `@seg|...` POINTERS to immutable
    * content-addressed segment files (`_seg-<md5>`), each pointer carrying
    * the segment's aggregate metadata (line/data counts, key range, row and
    * byte sums). This is the Iceberg manifest-list / Delta checkpoint idea
    * in miniature, and it is what keeps store METADATA scalable:
    *
    *  - commits rewrite only the (small) list plus segments whose lines
    *    actually changed — an append to a million-file table rewrites the
    *    list and at most one sealed segment, never O(files) bytes;
    *  - planning prunes whole segments by their key range WITHOUT reading
    *    them, so a point query's driver work is O(list + matched segments),
    *    not O(files);
    *  - COUNT/MIN/MAX and size statistics come from pointer aggregates —
    *    no segment reads, no per-file listStatus at plan time.
    *
    * Segment files are immutable and named by content hash, which makes the
    * driver-side segment cache trivially correct and makes an unchanged
    * segment's reuse detectable by pointer equality. Logical manifest ORDER
    * (the streaming tail's offset log) is preserved: expansion splices each
    * segment's lines in place. */
  val SegPrefix = "_seg-"
  private val SegMark = "@seg|"
  /** Lines per sealed segment. Production would use thousands; 16 keeps the
    * tree exercised at harness scale (a 64-file table = 4 segments). */
  private[sources] val SegTarget = 16

  /** Segment pointer in the list: aggregates let planning and commits treat
    * the segment as a unit without opening it. */
  case class SegPointer(name: String, nLines: Int, nData: Int,
                        minK: Option[Long], maxK: Option[Long],
                        rows: Long, bytes: Long) {
    def line: String =
      s"$SegMark$name|$nLines|$nData|${minK.getOrElse("-")}|" +
        s"${maxK.getOrElse("-")}|$rows|$bytes"
    /** Can any file in this segment hold a key in [lo, hi]? */
    def mayContain(lo: Option[Long], hi: Option[Long]): Boolean = (minK, maxK) match {
      case (Some(mn), Some(mx)) => lo.forall(_ <= mx) && hi.forall(_ >= mn)
      case _ => true
    }
  }

  private[sources] def parseSeg(l: String): SegPointer = {
    val p = l.stripPrefix(SegMark).split('|')
    def opt(s: String) = if (s == "-") None else Some(s.toLong)
    SegPointer(p(0), p(1).toInt, p(2).toInt, opt(p(3)), opt(p(4)),
      p(5).toLong, p(6).toLong)
  }

  /** Driver-side segment cache. Content-hash names make entries immutable,
    * so the cache never invalidates; at true scale it would be bounded. */
  private val segCache =
    new scala.collection.concurrent.TrieMap[String, Seq[String]]()

  private[sources] def readSegment(root: Path, fsys: FileSystem,
                                   name: String): Seq[String] =
    segCache.getOrElseUpdate(name, {
      val raw = manifestFs(fsys)
      val in = raw.open(new Path(root, name))
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8)
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      finally in.close()
    })

  /** PHYSICAL list lines of the current manifest (pointers unexpanded). */
  private[sources] def readListLines(root: Path, fsys: FileSystem): Seq[String] = {
    val raw = manifestFs(fsys)
    val mf = new Path(root, Manifest)
    if (!raw.exists(mf)) return Nil
    val in = raw.open(mf)
    try {
      val txt = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    } finally in.close()
  }

  /** Expand physical list lines to the LOGICAL manifest, order-preserving. */
  private[sources] def expand(root: Path, fsys: FileSystem,
                              physical: Seq[String]): Seq[String] =
    physical.flatMap {
      case l if l.startsWith(SegMark) => readSegment(root, fsys, parseSeg(l).name)
      case l => Seq(l)
    }

  /** LOGICAL manifest lines (data files + epoch markers); empty when
    * uncommitted. */
  private[sources] def readManifestLines(root: Path, fsys: FileSystem): Seq[String] =
    expand(root, fsys, readListLines(root, fsys))

  /** Test observability: last planning's (segments in list, segments read). */
  @volatile private[sources] var lastSegPlan: Option[(Int, Int)] = None

  /** Test observability: functions of the last metadata-answered aggregate
    * pushdown (None = last agg query fell back to the row scan). */
  @volatile private[sources] var lastAggPush: Option[Seq[String]] = None

  /** Seal a segment for `group`, returning its pointer (file written only
    * if absent — content addressing dedupes). */
  private def sealSegment(root: Path, fsys: FileSystem,
                          group: Seq[String]): SegPointer = {
    val content = group.mkString("\n")
    val name = SegPrefix + md5Hex(content)
    val raw = manifestFs(fsys)
    val sp = new Path(root, name)
    if (!raw.exists(sp)) {
      val out = raw.create(sp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    segCache.putIfAbsent(name, group)
    val data = group.filterNot(_.startsWith("#")).map(parseEntry)
    val ks = data.flatMap(e => e.minK.toSeq ++ e.maxK.toSeq)
    SegPointer(name, group.size, data.size,
      if (ks.isEmpty) None else Some(ks.min),
      if (ks.isEmpty) None else Some(ks.max),
      data.map(e => math.max(e.rows, 0L)).sum,
      data.flatMap(_.bytes).sum)
  }

  /** Build the physical list for `logical`: reuse every existing segment
    * whose lines appear unchanged and in order (pointer carried over — zero
    * metadata bytes rewritten for it), then seal full SegTarget-sized runs
    * of the remaining loose lines into new segments. A COW substitution
    * invalidates exactly its containing segment; appends accumulate loose
    * until a run seals. The in-order indexOfSlice matching is O(list ×
    * segments) at worst — a production tree would key segments by first
    * entry; entry lines are unique (file names), so matches are exact. */
  private def sealLines(root: Path, fsys: FileSystem,
                        logical: Seq[String]): Seq[String] = {
    val existing = readListLines(root, fsys)
      .filter(_.startsWith(SegMark)).map(parseSeg)
    val out = Seq.newBuilder[String]
    def flushLoose(run: Seq[String]): Unit = {
      val full = run.length / SegTarget * SegTarget
      run.take(full).grouped(SegTarget)
        .foreach(g => out += sealSegment(root, fsys, g).line)
      run.drop(full).foreach(out += _)
    }
    var i = 0
    val pendingLoose = Seq.newBuilder[String]
    existing.foreach { sp =>
      val content =
        try readSegment(root, fsys, sp.name) catch { case _: Exception => Nil }
      if (content.nonEmpty) {
        val at = logical.indexOfSlice(content, i)
        if (at >= 0) {
          (i until at).foreach(j => pendingLoose += logical(j))
          flushLoose(pendingLoose.result()); pendingLoose.clear()
          out += sp.line
          i = at + content.length
        }
      }
    }
    (i until logical.length).foreach(j => pendingLoose += logical(j))
    flushLoose(pendingLoose.result())
    out.result()
  }

  /** Committed data file names, in manifest order; empty when uncommitted. */
  private[sources] def readManifest(root: Path, fsys: FileSystem): Seq[String] =
    readManifestLines(root, fsys).filterNot(_.startsWith("#"))
      .map(l => parseEntry(l).name)

  /** Number of epochs the streaming ledger has committed — the public
    * audit surface for "was this store built incrementally". */
  def epochCount(pathStr: String): Long = {
    val root = new Path(pathStr)
    readManifestLines(root, fs(root)).count(_.startsWith(EpochMark)).toLong
  }

  /** Epoch ids already committed by the streaming write path. */
  private[sources] def committedEpochs(lines: Seq[String]): Set[Long] =
    lines.collect {
      case l if l.startsWith(EpochMark) => l.stripPrefix(EpochMark).toLong
    }.toSet

  private[sources] def epochLine(id: Long): String = s"$EpochMark$id"

  /** Version manifests: `_manifest.v<N>` — every committed generation is
    * archived immutably, so `VERSION AS OF n` reads are one manifest file
    * away (GraftCatalog.loadTable(ident, version)). Data files are NEVER
    * deleted by writes — [[vacuum]] is the retention op (expire versions,
    * then delete files no retained manifest references): time travel stays
    * honest until an explicit, auditable GC. */
  private def versionPath(root: Path, n: Int) = new Path(root, s"$Manifest.v$n")

  /** Committed version numbers, ascending; empty when uncommitted. */
  private[sources] def listVersions(root: Path, fsys: FileSystem): Seq[Int] = {
    val raw = manifestFs(fsys)
    if (!raw.exists(root)) return Nil
    raw.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(Manifest + ".v"))
      .map(_.stripPrefix(Manifest + ".v").toInt).sorted.toSeq
  }

  /** PHYSICAL list lines of an archived version (loudly absent if expired). */
  private[sources] def readVersionPhysical(root: Path, fsys: FileSystem,
                                           version: Int): Seq[String] = {
    val raw = manifestFs(fsys)
    val vp = versionPath(root, version)
    require(raw.exists(vp),
      s"graft-store version $version does not exist (expired by vacuum, or " +
        s"never committed); available: ${listVersions(root, fsys).mkString(",")}")
    val in = raw.open(vp)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    finally in.close()
  }

  /** LOGICAL manifest lines of an archived version. */
  private[sources] def readVersionLines(root: Path, fsys: FileSystem,
                                        version: Int): Seq[String] =
    expand(root, fsys, readVersionPhysical(root, fsys, version))

  /** NAMED REFS (tags): `_tags` maps a human name to an archived version
    * (`name=version` lines) — `VERSION AS OF 'pre_migration'` resolves
    * through [[tagVersion]] (GraftCatalog.loadTable receives the string
    * verbatim, so non-integer versions ARE the tag namespace, the
    * Iceberg refs idea). Tagging is O(1) metadata under the commit lock;
    * vacuum refuses to expire a tagged version — a tag is a retention
    * pin, which is the operational point of naming a snapshot. */
  def tag(pathStr: String, name: String, version: Int): Unit = {
    require(name.nonEmpty && !name.forall(_.isDigit) &&
      !name.contains('=') && !name.contains('\n'),
      s"tag names must be non-numeric and '='/newline-free, got '$name'")
    val root = new Path(pathStr)
    val fsys = fs(root)
    withCommitLock(root, fsys) {
      require(listVersions(root, fsys).contains(version),
        s"cannot tag version $version — not an archived version")
      val tags = readTags(root, fsys) + (name -> version)
      val raw = manifestFs(fsys)
      val out = raw.create(new Path(root, Tags), true)
      try out.write(tags.toSeq.sortBy(_._1).map { case (n, v) => s"$n=$v" }
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  private[sources] def readTags(root: Path, fsys: FileSystem): Map[String, Int] = {
    val raw = manifestFs(fsys)
    val tp = new Path(root, Tags)
    if (!raw.exists(tp)) return Map.empty
    val in = raw.open(tp)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty).map { l =>
        val Array(n, v) = l.split("=", 2)
        n -> v.toInt
      }.toMap
    finally in.close()
  }

  private[sources] def tagVersion(root: Path, fsys: FileSystem,
                                  name: String): Int =
    readTags(root, fsys).getOrElse(name, throw new IllegalArgumentException(
      s"unknown graft-store tag '$name'; known: " +
        readTags(root, fsys).keys.toSeq.sorted.mkString(",")))

  val Tags = "_tags"

  /** Retention: keep the newest `keepVersions` archived manifests, delete
    * the rest, then delete every data file NO retained manifest (nor the
    * current one) references. O(manifests) metadata + unreferenced-file
    * deletes — never a data rewrite. `keepVersions <= 0` resolves the
    * policy from the table's `graft.vacuum.keep` property (default 2) —
    * retention travels with the table, not the caller. */
  def vacuum(pathStr: String, keepVersions: Int): Unit = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    val raw = manifestFs(fsys)
    // under the commit lock: a concurrent commit's promoted-but-not-yet-
    // manifested files would otherwise look unreferenced and be GC'd
    withCommitLock(root, fsys) {
      val keepEff =
        if (keepVersions > 0) keepVersions
        else readProps(root, fsys).toMap.get("graft.vacuum.keep")
          .map(_.trim.toInt).filter(_ > 0).getOrElse(2)
      val versions = listVersions(root, fsys)
      // a TAG is a retention pin: tagged versions survive any keepVersions
      val pinned = readTags(root, fsys).values.toSet
      val (byAge, _) = versions.splitAt(math.max(0, versions.size - keepEff))
      gcExpired(root, fsys, versions, byAge.filterNot(pinned.contains))
    }
  }

  /** TIMESTAMP-based retention (the Iceberg `expire_snapshots(older_than)`
    * form): expire archived versions whose COMMIT-LEDGER instant (`#ts=`,
    * never file mtime) is `< cutoffMs`. The newest version and tagged
    * versions are always retained — a cutoff in the future degrades to
    * "keep only the current generation", never to an empty table. Returns
    * (versions expired, versions retained). Same locked sweep as vacuum:
    * O(manifests) metadata plus unreferenced-file deletes. */
  def expireBefore(pathStr: String, cutoffMs: Long): (Int, Int) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    var res = (0, 0)
    withCommitLock(root, fsys) {
      val versions = listVersions(root, fsys)
      val pinned = readTags(root, fsys).values.toSet
      val tsOf = history(pathStr).map { case (v, ts, _, _) => v -> ts }.toMap
      val expired = versions.dropRight(1) // the newest always survives
        .filter(v => tsOf.get(v).exists(_ < cutoffMs))
        .filterNot(pinned.contains)
      gcExpired(root, fsys, versions, expired)
      res = (expired.size, versions.size - expired.size)
    }
    res
  }

  /** The shared GC sweep (CALLER HOLDS the commit lock): delete `expired`
    * version manifests, then every data file / dv / eq sidecar / segment /
    * schema archive no retained version (nor the current manifest, nor a
    * live branch) references. */
  private def gcExpired(root: Path, fsys: FileSystem,
                        versions: Seq[Int], expired: Seq[Int]): Unit = {
    val raw = manifestFs(fsys)
    val retained = versions.filterNot(expired.contains)
    val physicals = retained.map(v => readVersionPhysical(root, fsys, v)) :+
      readListLines(root, fsys)
    // data files AND their deletion-vector sidecars (dv names share the
    // part- prefix, so the sweep below GCs unreferenced vectors too);
    // LIVE BRANCHES pin their staged files — only abandon() releases them
    val branchLines = listBranches(root, fsys)
      .flatMap(b => readBranchLines(root, fsys, b))
    val referenced = (physicals.flatMap(expand(root, fsys, _)) ++ branchLines)
      .filterNot(_.startsWith("#")).map(parseEntry)
      .flatMap(e => e.name +: (e.dv.toSeq ++ e.eq.toSeq)).toSet
    // segment files referenced by any RETAINED list survive; the rest are
    // metadata of expired generations and GC with them
    val referencedSegs = physicals.flatten
      .filter(_.startsWith(SegMark)).map(parseSeg(_).name).toSet
    expired.foreach(v => raw.delete(versionPath(root, v), false))
    listDataFiles(root, fsys).foreach { n =>
      if (!referenced.contains(n)) fsys.delete(new Path(root, n), false)
    }
    fsys.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(SegPrefix) && !referencedSegs.contains(n))
        raw.delete(st.getPath, false)
      // an archived pre-REPLACE schema is dead once every version it
      // covered (v <= W) has expired
      else if (n.startsWith(s"$SchemaFile.v") &&
               scala.util.Try(n.stripPrefix(s"$SchemaFile.v").toInt).toOption
                 .exists(w => !retained.exists(_ <= w)))
        raw.delete(st.getPath, false)
      // a partition dir whose files all expired is pure layout — GC it
      else if (st.isDirectory && n.contains("=") &&
               fsys.listStatus(st.getPath).isEmpty)
        fsys.delete(st.getPath, false)
    }
  }

  /** Manifest-RELATIVE names of every on-disk data file (and dv sidecar),
    * including those inside partition directories — the sweep/audit walk. */
  private[sources] def listDataFiles(root: Path, fsys: FileSystem): Seq[String] =
    fsys.listStatus(root).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.contains("=") && !n.startsWith("_"))
        fsys.listStatus(st.getPath).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("part-")).map(fn => s"$n/$fn")
      else if (st.isFile && n.startsWith("part-")) Seq(n)
      else Nil
    }

  /** OPTIMIZE: rewrite the current snapshot as ~`targetRows`-sized,
    * RANGE-CLUSTERED files (repartitionByRange on the key → disjoint
    * zones), committed through the ordinary overwrite two-phase protocol —
    * one atomic manifest swap, the previous generation stays archived and
    * time-travelable until vacuum, and the epoch ledger survives
    * (`preserveMarkers`) so a streaming writer's exactly-once state is not
    * reset by maintenance. Returns (files before, files after). A
    * concurrent reader sees either generation, never a mix: compaction is
    * a pure layout change under snapshot isolation. At 100 TB this is the
    * periodic small-file + clustering maintenance job; cost is one
    * read+shuffle+write of LIVE bytes only (deleted generations are not
    * touched), and bin sizing is row-count-driven from the manifest, no
    * file listing. */
  /** Full-table form; see the ranged overload. */
  def compact(spark: SparkSession, pathStr: String, targetRows: Long): (Int, Int) =
    compact(spark, pathStr, targetRows, None, None)

  /** OPTIMIZE ... ZORDER BY, Hilbert flavor: rewrite the snapshot clustered
    * by the HILBERT index over BOTH zone columns — `k` and `amt_cents`
    * scaled onto the order-8 grid from the manifest's own global zone
    * bounds — so each output file covers a compact 2-D region and range
    * predicates on EITHER column prune file planning (each file's k-span
    * AND amt-span is a fraction of the domain, vs range clustering where
    * amt zones span everything). Delta/Iceberg ship exactly this as
    * OPTIMIZE ZORDER / rewrite with a hilbert sort-order; the curve math is
    * the repo's own codegen [[graft.functions.HilbertKey]], same kernel
    * q_hilbert_key / q_layout_compare pin against a generated SQL oracle.
    * Commit protocol identical to [[compact]] (replace-set overwrite, one
    * atomic swap, epoch ledger preserved). Unpartitioned stores only — a
    * declared partitioning already owns the layout. */
  def compactHilbert(spark: SparkSession, pathStr: String,
                     targetRows: Long): (Int, Int) = {
    val root = new Path(pathStr)
    require(readPartSpec(root, fs(root)).isEmpty,
      "zorder: a partitioned store's layout is owned by its partition " +
        "spec — compact() clusters within it; hilbert clustering applies " +
        "to unpartitioned stores only")
    compact(spark, pathStr, targetRows, None, None, cluster = "hilbert")
  }

  /** OPTIMIZE ... ZORDER BY (col1, ..., cold) — the d-DIMENSIONAL form:
    * Morton (bit-interleave) clustering over 2–4 bigint columns, each
    * scaled onto an 8-bit grid from the LIVE data's own bounds (one cheap
    * aggregate pass — unlike the 2-D Hilbert path, arbitrary columns may
    * have no manifest bounds yet). Contiguous Morton ranges are compact
    * d-D regions, so with the columns DECLARED as stat columns
    * ([[StatColsProp]]) a narrow predicate on ANY of them prunes file
    * planning after the rewrite. Hilbert has strictly better locality in
    * 2-D, so the canonical (k, amt_cents) pair still routes there; Morton
    * generalizes to d dims with one codegen'd integer expression — the
    * Delta ZORDER BY shape. Commit protocol identical to [[compact]]. */
  def compactZorder(spark: SparkSession, pathStr: String, targetRows: Long,
                    cols: Seq[String]): (Int, Int) = {
    require(cols.size >= 2 && cols.size <= 4,
      s"zorder_by takes 2..4 columns, got ${cols.mkString(",")}")
    val tbl = tableSchema(pathStr)
    cols.foreach { c =>
      require(tbl.fields.exists(f => f.name.equalsIgnoreCase(c) &&
        (f.dataType == LongType || f.dataType == StringType)),
        s"zorder_by column $c is not a bigint/string column of " +
          tbl.fieldNames.mkString(","))
    }
    if (cols.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("k", "amt_cents"))
      return compactHilbert(spark, pathStr, targetRows)
    val root = new Path(pathStr)
    require(readPartSpec(root, fs(root)).isEmpty,
      "zorder_by: a partitioned store's layout is owned by its partition spec")
    compact(spark, pathStr, targetRows, None, None,
      cluster = "morton:" + cols.mkString(","))
  }

  /** TRIGGER-BASED MAINTENANCE (round-12 verdict #5 — index_rebuild_if's
    * posture applied to the table store): decide from the MANIFEST ALONE
    * whether the table needs compacting —
    *  - small-file pressure: live row-bearing file count past `maxFiles`;
    *  - clustering drift: the k-zone OVERLAP factor, Σ per-file zone
    *    widths / global zone width in e4 units (10000 = disjoint zones;
    *    n×10000 means a typical key is covered by ~n files, so every
    *    range read opens ~n× the bytes it needs).
    * Either trigger fires → the existing [[compact]] rewrite (range
    * clustering restores disjoint zones and merges small files in the
    * same pass). The decision costs one manifest read — at 100 TB
    * somebody must decide WHEN to compact after weeks of CDC appends,
    * and this makes it a policy instead of a human. Returns (action,
    * files, overlap_e4, files_after); stat-less legacy manifests read as
    * overlap 10000 (no evidence of drift → only the file-count trigger
    * applies). */
  /** PROPERTY-DRIVEN AUTO-MAINTENANCE (`CALL graft.maintain(path)`): the
    * thresholds live IN the table as `graft.maintain.*` properties, so
    * one scheduler loop over many tables needs no per-table arguments —
    * the policy travels with the data (Iceberg's table-level
    * write/maintenance options, Delta's autoOptimize posture):
    *  - `graft.maintain.compact`   = 'target_rows:max_files:max_overlap_e4'
    *    → [[compactIf]] (manifest-only decision, rewrite only on trigger)
    *  - `graft.maintain.keep.ms`   = retention window → [[expireBefore]]
    *    at now − window (tags still pin, newest always survives)
    *  - `graft.maintain.orphans.ms`= age margin → [[removeOrphans]]
    *  - `graft.maintain.keep.before` / `graft.maintain.orphans.before` =
    *    EXPLICIT absolute epoch-ms cutoffs (they win over the `.ms`
    *    twins) — the TTL rung's replayability posture extended to file
    *    retention: a policy that re-derives "now" per tick races its own
    *    audit trail, so a scheduler that wants replayable maintenance
    *    advances the cutoff property and every tick at the same property
    *    state produces the same audit row (round-13 verdict #7). The
    *    `.ms` forms stay for fleets that accept wall-clock margins.
    * Absent keys skip their step; a table with NO policy returns a
    * single 'none' row (running the fleet loop over an unconfigured
    * table is a no-op, not an error); a MALFORMED policy refuses loudly
    * (a typo must not read as "healthy, nothing to do"). Audit rows:
    * (op, action, a, b, c) per executed step. */
  def maintain(spark: SparkSession,
               pathStr: String): Seq[(String, String, Long, Long, Long)] = {
    val root = new Path(pathStr)
    val ps = readProps(root, fs(root)).toMap
    val out = Seq.newBuilder[(String, String, Long, Long, Long)]
    ps.get("graft.maintain.ttl").foreach { v =>
      // ROW RETENTION: '<col>:<min_keep>' — rows with col < min_keep
      // retire through the ordinary row-level delete (zone pruning
      // scopes the rewrite, MoR vectors keep a trickle cheap), BEFORE
      // any compact step so soon-dead rows are never re-clustered. The
      // cutoff is an EXPLICIT value, not wall-clock: a policy that
      // re-derives "now" per tick is unreplayable and races its own
      // audit trail — schedulers advance the property instead (the
      // Iceberg retention-property posture). Audit: (dropped, kept).
      val p = v.split(":", 2)
      // an optional LEADING '-' followed by digits only — the permissive
      // any-position '-' check let '1-2' through to toLong, which dies
      // with a raw NumberFormatException instead of the loud property
      // message this guard exists for (advice catch)
      require(p.length == 2 && p(0).nonEmpty && p(1).matches("-?\\d+"),
        s"graft.maintain.ttl must be '<col>:<min_keep_long>', got '$v'")
      def live() = readEntries(root, fs(root))
        .map(e => math.max(e.rows, 0L)).sum
      val before = live()
      // the policy delete pins its OWN mode: under an ambient
      // equality-delete scope the manifest row counts become upper
      // bounds and the (dropped, kept) audit would silently lie — a
      // maintenance tick must not change meaning with session conf
      val sc = org.apache.spark.sql.internal.SQLConf.get
      val modeKey = "spark.graft.store.delete.mode"
      // remember whether the key was SET: restoring a previously-unset
      // key as an explicit 'auto' is harmless semantically but observable
      // session-conf pollution (advice catch) — unset it back instead
      val prev = if (sc.contains(modeKey)) Some(sc.getConfString(modeKey))
                 else None
      sc.setConfString(modeKey, "auto")
      try
        new StoreTable(pathStr).deleteWhere(Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.LessThan(p(0), p(1).toLong)))
      finally prev match {
        case Some(old) => sc.setConfString(modeKey, old)
        case None => sc.unsetConf(modeKey)
      }
      val after = live()
      out += (("ttl", "ok", before - after, after, 0L))
    }
    ps.get("graft.maintain.compact").foreach { v =>
      val p = v.split(":", -1)
      require(p.length == 3 && p.forall(x => x.nonEmpty && x.forall(_.isDigit)),
        "graft.maintain.compact must be 'target_rows:max_files:" +
          s"max_overlap_e4' (non-negative integers), got '$v'")
      val (action, files, ov, after) =
        compactIf(spark, pathStr, p(0).toLong, p(1).toLong, p(2).toLong)
      out += (("compact", action, files, ov, after))
    }
    // explicit-cutoff forms WIN over the wall-clock margins: the cutoff
    // is then part of the table state and the tick replays (the TTL
    // rung's own argument, which keep.ms/orphans.ms violated — round-13
    // verdict #7)
    def cutoffOf(beforeKey: String, msKey: String): Option[Long] =
      ps.get(beforeKey).map { v =>
        require(v.nonEmpty && v.forall(_.isDigit),
          s"$beforeKey must be an absolute epoch-ms cutoff, got '$v'")
        v.toLong
      }.orElse(ps.get(msKey).map { v =>
        require(v.nonEmpty && v.forall(_.isDigit),
          s"$msKey must be a non-negative integer, got '$v'")
        System.currentTimeMillis() - v.toLong
      })
    cutoffOf("graft.maintain.keep.before", "graft.maintain.keep.ms")
      .foreach { cut =>
        val (dropped, kept) = expireBefore(pathStr, cut)
        out += (("expire", "ok", dropped.toLong, kept.toLong, 0L))
      }
    // the .ms property is an AGE margin; removeOrphans takes the absolute
    // modification-time cutoff (the procedure's older_ms convention)
    cutoffOf("graft.maintain.orphans.before", "graft.maintain.orphans.ms")
      .foreach { cut =>
        val (deleted, candidates) = removeOrphans(pathStr, cut)
        out += (("orphans", "ok", deleted.toLong, candidates.toLong, 0L))
      }
    // INDEX maintenance rides the same loop: a corpus table that owns
    // derived indexes names their policies too, so ONE maintain(path)
    // tick keeps table AND indexes healthy (the round-12 verdict's
    // "somebody must decide" closed for every derived artifact, not just
    // the data files)
    ps.get("graft.maintain.ann").foreach { v =>
      // numbers FIRST, path LAST with a bounded split: the index path may
      // itself contain ':' (URIs), the thresholds never do
      val p = v.split(":", 3)
      require(p.length == 3 && p(0).nonEmpty && p(0).forall(_.isDigit) &&
        p(1).nonEmpty && p(1).forall(_.isDigit) && p(2).nonEmpty,
        "graft.maintain.ann must be " +
          s"'max_skew_e4:min_recall_e4:index_path', got '$v'")
      val (action, skew, recall) =
        AnnIndex.rebuildIf(spark, p(2), p(0).toLong, p(1).toLong)
      out += (("ann", action, skew, recall, 0L))
    }
    ps.get("graft.maintain.text").foreach { v =>
      require(v.nonEmpty, "graft.maintain.text must be an index path")
      val (action, armed, postings) = TextIndex.rebuildIf(spark, v)
      out += (("text", action, armed, postings, 0L))
    }
    ps.get("graft.maintain.maxsim").foreach { v =>
      // the late-interaction index joins the loop. Two forms (the .ann
      // numbers-first convention): 'max_skew_e4:index_path' = rebuild
      // POLICY (fold, then retrain if the occupancy skew trips — audit
      // (action, skew_e4)); a bare path = refresh-only fold — audit
      // (tokens_changed, partitions_rewritten).
      require(v.nonEmpty, "graft.maintain.maxsim must be an index path " +
        "or 'max_skew_e4:index_path'")
      val p = v.split(":", 2)
      if (p.length == 2 && p(0).nonEmpty && p(0).forall(_.isDigit)) {
        val (action, skew) = MaxSimIndex.rebuildIf(spark, p(1), p(0).toLong)
        out += (("maxsim", action, skew, 0L, 0L))
      } else {
        val (keys, parts) = MaxSimIndex.refresh(spark, v)
        out += (("maxsim", "ok", keys, parts, 0L))
      }
    }
    val res = out.result()
    if (res.isEmpty) Seq(("none", "no graft.maintain.* properties", 0L, 0L, 0L))
    else res
  }

  /** CONSISTENCY CHECK (`CALL graft.fsck`) — verify the manifest's claims
    * against the files on disk WITHOUT reading data bytes: every
    * row-bearing entry's data file must exist, every referenced deletion
    * vector / equality sidecar must exist, and dv ordinal lists must be
    * strictly ascending and non-negative. DETECTION ONLY: damage counts
    * in the audit row instead of throwing — an fsck that dies on the
    * problem it exists to find is useless (readers still fail loudly on
    * their own). Returns (entries, missing_files, sidecars,
    * bad_sidecars). EXECUTOR-PARALLEL (round-13 verdict #3): the driver
    * reads the manifest and folds four counters; the per-entry
    * exists/parse checks — one metadata stat per file, the expensive
    * half against an object store — fan out over the cluster. A
    * petabyte manifest's millions of HEAD requests would otherwise run
    * as a single serial driver chain (the repo's own scale-bug class
    * #6, a driver loop whose iteration count scales with the data);
    * distributed, the nightly integrity tick is bounded by
    * entries/parallelism round-trips. */
  def fsck(pathStr: String): (Long, Long, Long, Long) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    val entries = readEntries(root, fsys).filter(_.rows != 0)
    if (entries.isEmpty) return (0L, 0L, 0L, 0L)
    // ship only what the check needs: (data file, dv sidecar, eq sidecar)
    val work: Seq[(String, Option[String], Option[String])] =
      entries.map(e => (e.name, e.dv, e.eq))
    val spark = SparkSession.active
    val slices = math.max(1, math.min(work.size,
      spark.sparkContext.defaultParallelism))
    val (missing, side, bad) = spark.sparkContext
      .parallelize(work, slices)
      .mapPartitions { it =>
        // executor-side FS from a fresh conf (the streaming writer's
        // pattern — no SparkSession.active on a bare task thread)
        val r = new Path(pathStr)
        val f = StoreSink.fs(r, new Configuration())
        var miss = 0L; var sd = 0L; var bd = 0L
        it.foreach { case (name, dv, eq) =>
          if (!f.exists(new Path(r, name))) miss += 1
          dv.foreach { d =>
            sd += 1
            if (!f.exists(new Path(r, d))) bd += 1
            else
              try {
                val o = StoreSink.readDv(r, f, d)
                if (o.nonEmpty && (o.head < 0 ||
                    o.indices.drop(1).exists(i => o(i - 1) >= o(i)))) bd += 1
              } catch { case _: Exception => bd += 1 }
          }
          eq.foreach { q =>
            sd += 1
            if (!f.exists(new Path(r, q))) bd += 1
          }
        }
        Iterator.single((miss, sd, bd))
      }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    (entries.size.toLong, missing, side, bad)
  }

  def compactIf(spark: SparkSession, pathStr: String, targetRows: Long,
                maxFiles: Long, maxOverlapE4: Long): (String, Long, Long, Long) = {
    val root = new Path(pathStr)
    val entries = readEntries(root, fs(root)).filter(_.rows > 0)
    val nFiles = entries.size.toLong
    val zones = entries.flatMap(e => e.minK.zip(e.maxK))
    val overlapE4 =
      if (zones.isEmpty) 10000L
      else {
        // BigInt: Σ widths over a petabyte manifest overflows a Long
        val g = BigInt(zones.map(_._2).max) - BigInt(zones.map(_._1).min) + 1
        val widths = zones.map { case (mn, mx) =>
          BigInt(mx) - BigInt(mn) + 1 }.sum
        // a row-bearing file WITHOUT zones gives no evidence of its span:
        // count it as covering the whole global zone rather than silently
        // dropping it — a partially-legacy manifest must not read as
        // healthy (review catch); fully stat-less manifests keep the
        // no-evidence 10000 baseline above
        val statless = nFiles - zones.size
        ((widths + g * statless) * 10000 / g).toLong
      }
    if (nFiles > maxFiles || overlapE4 > maxOverlapE4) {
      val (_, after) = compact(spark, pathStr, targetRows)
      ("compact", nFiles, overlapE4, after.toLong)
    } else ("keep", nFiles, overlapE4, nFiles)
  }

  /** PARTIAL compaction: only files whose zones overlap [lo, hi] are
    * rewritten (None = unbounded); everything else carries over by name.
    * This is the maintenance shape that matters at 100 TB — a CDC-heavy
    * table fragments in its HOT key range while cold history stays
    * well-clustered, and "OPTIMIZE WHERE" rewrites the hot tail's bytes
    * only. The zone maps that prune reads are the same metadata that
    * scopes the rewrite. */
  def compact(spark: SparkSession, pathStr: String, targetRows: Long,
              lo: Option[Long], hi: Option[Long],
              cluster: String = "range"): (Int, Int) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    val entries = readEntries(root, fsys)
    val touch = entries.filter(_.mayContain(lo, hi))
    if (touch.size <= 1) return (entries.size, entries.size) // nothing to merge
    val totalRows = touch.map(e => math.max(e.rows, 0L)).sum
    val n = math.max(1L, (totalRows + targetRows - 1) / targetRows).toInt
    // plan the read from exactly this snapshot's touched files and commit
    // with `replace` = that same set: an append landing DURING the
    // compaction survives the swap (the commit rebases under the lock),
    // and a concurrent rewrite of one of our inputs is a loud conflict
    // rather than silent row resurrection
    val names = touch.map(_.name)
    // read by TOKEN (name@dv): compaction reads the MASKED rows, so the
    // rewrite absorbs every deletion vector into clean files
    val df = spark.read.format("graft.sources.StoreSink")
      .option("path", pathStr).option("files", touch.map(_.token).mkString(","))
      .load()
    // cluster WITHIN the table's layout: a partitioned store shuffles on
    // its partition expression (each task then holds whole partitions and
    // the writer emits partition-pure files); unpartitioned stores
    // range-cluster on the key for disjoint zones
    import org.apache.spark.sql.functions.{col, expr, lit, pmod}
    val clustered = readPartSpec(root, fsys) match {
      case Some(sp) if sp.kind == "bucket" =>
        df.repartition(n, pmod(col("k"), lit(sp.n)))
      case Some(sp) => df.repartition(n, col(sp.col))
      case None if cluster.startsWith("morton:") =>
        // d-dim bit interleave: scale each column onto 8 bits from the
        // live data's bounds (one aggregate), then range-cluster on the
        // Morton index — one pure-integer codegen'd expression. STRING
        // columns enter through an order-preserving 8-byte prefix code
        // (base-256 over ascii codes, Iceberg's truncate-transform idea) —
        // lossy beyond 7 chars, which only costs clustering sharpness,
        // never correctness.
        val cs = cluster.stripPrefix("morton:").split(',').toSeq
        val isStr = cs.map(c =>
          df.schema.fields.exists(f => f.name.equalsIgnoreCase(c) &&
            f.dataType == org.apache.spark.sql.types.StringType))
        def valOf(c: String, str: Boolean): String =
          if (!str) s"`$c`"
          else (1 to 7).map { i => // 7 bytes, codepoints clamped to 255:
            // stays overflow-free signed; non-ASCII chars degrade layout
            // sharpness only, never the arithmetic
            val coef = java.lang.Math.pow(256.0, 7 - i).toLong
            s"least(cast(coalesce(ascii(substring(`$c`, $i, 1)), 0) as bigint), 255L) * ${coef}L"
          }.mkString("(", " + ", ")")
        val bounds = df.select(cs.zip(isStr).flatMap { case (c, str) =>
            Seq(org.apache.spark.sql.functions.min(expr(valOf(c, str))),
                org.apache.spark.sql.functions.max(expr(valOf(c, str))))
          }: _*)
          .collect()(0)
        val scaled = cs.zipWithIndex.map { case (c, j) =>
          if (bounds.isNullAt(2 * j)) "0L" // all-null column: no frame
          else {
            val mn = bounds.getLong(2 * j); val mx = bounds.getLong(2 * j + 1)
            s"coalesce(cast((${valOf(c, isStr(j))} - ${mn}L) * 255L div " +
              s"greatest(1L, ${mx - mn}L) as bigint), 0L)"
          }
        }
        val d = cs.size
        val terms = for { i <- 0 until 8; j <- 0 until d } yield
          s"shiftleft(shiftright(${scaled(j)}, $i) & 1L, ${i * d + j})"
        df.repartitionByRange(n, expr(terms.mkString(" + ")))
      case None if cluster == "hilbert" =>
        // 2-D clustering: scale both zone columns onto the 8-bit grid from
        // the manifest's OWN global bounds (no extra data pass), then
        // range-cluster by the Hilbert index — contiguous curve ranges =
        // compact 2-D regions = both columns' zones stay narrow per file
        graft.functions.HilbertKey.register(spark)
        def bound(f: StoreFileEntry => Option[Long],
                  pick: Seq[Long] => Long): Option[Long] = {
          val vs = touch.flatMap(e => f(e))
          if (vs.isEmpty) None else Some(pick(vs))
        }
        (for {
          kMin <- bound(_.minK, _.min); kMax <- bound(_.maxK, _.max)
          aMin <- bound(_.minA, _.min); aMax <- bound(_.maxA, _.max)
        } yield {
          val kb = s"(k - ${kMin}L) * 255L div greatest(1L, ${kMax - kMin}L)"
          val ab = s"(amt_cents - ${aMin}L) * 255L div greatest(1L, ${aMax - aMin}L)"
          df.repartitionByRange(n, expr(s"graft_hilbert($kb, $ab)"))
        }).getOrElse(
          // stat-less inputs (legacy lines / all-null columns): the curve
          // has no frame to scale into — fall back to key range clustering
          df.repartitionByRange(n, col("k")))
      case None => df.repartitionByRange(n, col("k"))
    }
    clustered
      .write.format("graft.sources.StoreSink").mode("append")
      .option("path", pathStr).option("preserveMarkers", "true")
      .option("replace", names.mkString(",")).save()
    (entries.size, readEntries(root, fsys).size)
  }

  /** ANALYZE: backfill DECLARED stat columns ([[StatColsProp]]) onto
    * manifest entries that lack them — one read pass over exactly the
    * stat-less files, then a METADATA-ONLY locked swap (no data bytes
    * written), so declaring a stat column on an EXISTING table enables
    * pruning retroactively without a rewrite. Bounds are computed over
    * all physical rows (mask-blind): masks only remove rows, so the
    * bounds are conservative — pruning-safe by the zone contract.
    * Entries whose line changed between compute and publish are skipped
    * (they'll pick up stats on their next rewrite); returns
    * (files scanned, entries updated). */
  /** Conf key under `_props` holding analyze's per-column NDV sketches
    * (`col:estimate;...`) — surfaced through SupportsReportStatistics
    * column stats so the CBO sees distinct counts for selectivity
    * (equality-filter estimates, join ordering, hint-free broadcasts).
    * Advisory by contract: stale after new commits until re-analyzed,
    * like every engine's table statistics. */
  val NdvProp = "graft.stats.ndv"

  /** INCREMENTAL NDV (round-11 verdict #6): the serialized per-column HLL
    * sketches behind [[NdvProp]]'s estimates (`col:base64;...`). Sketches
    * MERGE, so every append commit unions its writer-task sketches into the
    * stored ones — O(1)/row at write time, one tiny prop rewrite at commit
    * — and the CBO's row estimates track the table BETWEEN analyzes instead
    * of decaying. Deletes never subtract (HLL can't): estimates are an
    * upper bound until the next ANALYZE re-baselines, the standard stats
    * staleness contract. A logical truncate RESETS the sketches to the new
    * generation's. Tracking switches on once ANALYZE has established the
    * sketches (the factory gate), so untouched tables pay nothing. */
  val NdvHllProp = "graft.stats.ndv.hll"

  /** The ONE sketch kernel both ANALYZE and the write path use — update
    * hashing must match exactly or a merge double-counts every value. */
  private[sources] object Ndv extends Serializable {
    import org.apache.datasketches.hll.{HllSketch, Union}
    private val LgK = 12 // ~1.6% rse, 16 KB max — the Spark default shape

    def empty(): HllSketch = new HllSketch(LgK)

    def update(sk: HllSketch, row: InternalRow, ord: Int, dt: DataType): Unit =
      if (!row.isNullAt(ord)) dt match {
        case LongType    => sk.update(row.getLong(ord))
        case IntegerType => sk.update(row.getInt(ord).toLong)
        case StringType  => sk.update(row.getUTF8String(ord).getBytes)
        case _           => () // non-sketchable types contribute nothing
      }

    def unionAll(parts: Seq[Array[Byte]]): Array[Byte] = {
      val u = new Union(LgK)
      parts.foreach(b => u.update(HllSketch.heapify(b)))
      u.getResult.toCompactByteArray
    }

    def estimate(b: Array[Byte]): Long =
      math.round(HllSketch.heapify(b).getEstimate)

    def enc(m: Seq[(String, Array[Byte])]): String =
      m.sortBy(_._1).map { case (c, b) =>
        s"$c:${java.util.Base64.getEncoder.encodeToString(b)}"
      }.mkString(";")

    def dec(s: String): Seq[(String, Array[Byte])] =
      s.split(';').toSeq.filter(_.nonEmpty).map { kv =>
        val Array(c, b) = kv.split(":", 2)
        (c, java.util.Base64.getDecoder.decode(b))
      }
  }

  /** Writer-side gate: track per-column sketches only once ANALYZE has
    * established them (resolved on the DRIVER at factory construction). */
  private[sources] def ndvTracking(pathStr: String): Boolean = {
    val root = new Path(pathStr)
    readProps(root, fs(root)).toMap.contains(NdvHllProp)
  }

  /** Fold commit-message sketches into the stored ones (its own lock
    * window — NDV staleness is advisory, manifest atomicity is not
    * involved). `reset` on a logical truncate starts from this commit. */
  private[sources] def mergeNdv(root: Path, fsys: FileSystem,
                                incoming: Seq[(String, Array[Byte])],
                                reset: Boolean): Unit = {
    if (incoming.isEmpty) return
    withCommitLock(root, fsys) {
      mergeNdvUnlocked(root, fsys, incoming, reset)
    }
  }

  /** Union per-column incoming sketches into the stored map — the ONE
    * merge kernel both the table NDV and the branch sidecar fold with
    * (a semantics fix must land in exactly one place). */
  private def unionSketches(stored: Map[String, Array[Byte]],
                            incoming: Seq[(String, Array[Byte])]): Seq[(String, Array[Byte])] = {
    val byCol = incoming.groupBy(_._1)
    (stored.keySet ++ byCol.keySet).toSeq.sorted.map { c =>
      c -> Ndv.unionAll(stored.get(c).toSeq ++ byCol.getOrElse(c, Nil).map(_._2))
    }
  }

  /** The merge body for callers ALREADY inside the commit lock (branch
    * publish and reset-shaped batch commits fold sketches in the same
    * critical section as their manifest swap — the lock is not
    * re-entrant). */
  private[sources] def mergeNdvUnlocked(root: Path, fsys: FileSystem,
                                        incoming: Seq[(String, Array[Byte])],
                                        reset: Boolean): Unit = {
    if (incoming.isEmpty) return
    val ps = readProps(root, fsys).toMap
    val stored: Map[String, Array[Byte]] =
      if (reset) Map.empty
      else ps.get(NdvHllProp).map(Ndv.dec(_).toMap).getOrElse(Map.empty)
    val merged = unionSketches(stored, incoming)
    val estimates = merged.map { case (c, b) => s"$c:${Ndv.estimate(b)}" }
      .mkString(";")
    writeProps(root, fsys, (ps +
      (NdvHllProp -> Ndv.enc(merged)) + (NdvProp -> estimates)).toSeq)
  }

  /** BRANCH NDV SIDECAR (`_branchndv.<name>`): a WAP append's writer
    * sketches ride next to the branch manifest instead of folding into
    * the table's NDV early — the branch may be abandoned, and published
    * rows must still be counted (they previously never were: a sustained
    * WAP pipeline drifted the estimates LOW, breaking the upper-bound-
    * only staleness contract — advice catch). Publish folds the sidecar
    * in the SAME critical section as its manifest swap; abandon deletes
    * it with the branch. */
  private[sources] def branchNdvFile(name: String) = s"_branchndv.$name"

  private[sources] def stashBranchNdv(root: Path, fsys: FileSystem,
                                      name: String,
                                      incoming: Seq[(String, Array[Byte])]): Unit = {
    if (incoming.isEmpty) return
    val stored = readSmall(root, fsys, branchNdvFile(name))
      .map(Ndv.dec(_).toMap).getOrElse(Map.empty[String, Array[Byte]])
    atomicWriteSmall(root, fsys, branchNdvFile(name),
      Ndv.enc(unionSketches(stored, incoming)))
  }

  /** Fold a branch's stashed sketches into the table NDV (caller holds
    * the lock) and drop the sidecar. */
  private[sources] def foldBranchNdv(root: Path, fsys: FileSystem,
                                     name: String): Unit = {
    readSmall(root, fsys, branchNdvFile(name)).foreach { payload =>
      mergeNdvUnlocked(root, fsys, Ndv.dec(payload), reset = false)
    }
    manifestFs(fsys).delete(new Path(root, branchNdvFile(name)), false)
  }

  def analyze(pathStr: String): (Long, Long) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    val tbl = tableSchema(pathStr)
    // NDV SKETCHES for the optimizer: ONE distributed pass (a sketch per
    // column per partition, unioned on the driver — no data shuffle),
    // persisted to the props sidecar as BOTH estimates (what the CBO
    // reads) and the serialized sketches (what later commits MERGE into —
    // incremental NDV). The pass runs the SAME [[Ndv]] kernel the write
    // path runs, so analyze-time and commit-time sketches hash values
    // identically and unions never double-count. Runs for every column:
    // base prefix + live trailing longs/strings.
    locally {
      val s = SparkSession.active
      val names = tbl.fields.map(_.name)
      val dts = tbl.fields.map(_.dataType)
      val n = dts.length
      val partSketches = s.read.format("graft.sources.StoreSink")
        .option("path", pathStr).load()
        .queryExecution.toRdd.mapPartitions { it =>
          val sks = Array.fill(n)(Ndv.empty())
          it.foreach { row =>
            var i = 0
            while (i < n) { Ndv.update(sks(i), row, i, dts(i)); i += 1 }
          }
          Iterator.single(sks.map(_.toCompactByteArray))
        }.collect()
      val merged = names.indices.map { i =>
        names(i) -> Ndv.unionAll(partSketches.map(_(i)).toSeq)
      }
      val enc = merged.map { case (c, b) => s"$c:${Ndv.estimate(b)}" }
        .mkString(";")
      withCommitLock(root, fsys) {
        val ps = readProps(root, fsys).toMap
        writeProps(root, fsys, (ps + (NdvProp -> enc) +
          (NdvHllProp -> Ndv.enc(merged))).toSeq)
      }
    }
    val statCols = declaredStatCols(root, fsys, tbl)
    val strCols = declaredStrStatCols(root, fsys, tbl)
    if (statCols.isEmpty && strCols.isEmpty) return (0L, 0L)
    val layout = layoutAt(pathStr, None)
    val slots = statCols.map { case (n, li) => (n, layout.proj(li)) }
    val strSlots = strCols.map { case (n, li) => (n, layout.proj(li)) }
    val todo = readEntries(root, fsys).filter(e =>
      statCols.exists { case (n, _) => !e.stats.exists(_._1 == n) } ||
      strCols.exists { case (n, _) => !e.sstats.exists(_._1 == n) })
    val updates: Map[String, (String, String)] = todo.map { e =>
      val mins = Array.fill(slots.size)(Long.MaxValue)
      val maxs = Array.fill(slots.size)(Long.MinValue)
      val minT = Array.fill[String](strSlots.size)(null)
      val maxT = Array.fill[String](strSlots.size)(null)
      val ascii = Array.fill(strSlots.size)(true)
      val (dataLines, closer) =
        openDataLines(fsys, new Path(root, e.name))
      try {
        while (dataLines.hasNext) {
          val parts = dataLines.next().split(",", -1)
          var i = 0
          while (i < slots.size) {
            val s = slots(i)._2
            if (s < parts.length && parts(s) != NullMark) {
              val v = parts(s).toLong
              if (v < mins(i)) mins(i) = v
              if (v > maxs(i)) maxs(i) = v
            }
            i += 1
          }
          var t = 0
          while (t < strSlots.size) {
            val s = strSlots(t)._2
            if (ascii(t) && s < parts.length && parts(s) != NullMark) {
              val v = java.net.URLDecoder.decode(parts(s), "UTF-8")
              if (!v.forall(_ < 128)) ascii(t) = false
              else {
                if (minT(t) == null || v.compareTo(minT(t)) < 0) minT(t) = v
                if (maxT(t) == null || v.compareTo(maxT(t)) > 0) maxT(t) = v
              }
            }
            t += 1
          }
        }
      } finally closer()
      val fresh = slots.indices.flatMap { i =>
        val n = slots(i)._1
        if (e.stats.exists(_._1 == n) || mins(i) == Long.MaxValue) None
        else Some((n, mins(i), maxs(i)))
      }
      val freshS = strSlots.indices.flatMap { t =>
        val n = strSlots(t)._1
        if (e.sstats.exists(_._1 == n) || !ascii(t) || minT(t) == null) None
        else truncUpper(maxT(t)).map(up => (n, truncLower(minT(t)), up))
      }
      e.name -> (e.line,
        e.copy(stats = e.stats ++ fresh, sstats = e.sstats ++ freshS).line)
    }.toMap
    var applied = 0L
    withCommitLock(root, fsys) {
      val lines = readManifestLines(root, fsys)
      val rebased = lines.map { l =>
        if (l.startsWith("#")) l
        else updates.get(parseEntry(l).name) match {
          case Some((orig, neu)) if l == orig => applied += 1; neu
          case _ => l // changed since compute: skip, stays conservative
        }
      }
      if (applied > 0) writeManifestAtomic(root, fsys, rebased)
    }
    (todo.size.toLong, applied)
  }

  /** CHANGE DATA FEED between two committed versions, reconstructed from
    * the manifests alone: files present only in `toV` are insert
    * candidates, files present only in `fromV` are delete candidates, and
    * a row-level multiset difference (`exceptAll`, both ways) cancels the
    * rows a copy-on-write rewrite carried over unchanged — so the feed is
    * the NET row changes (an update surfaces as its delete + insert pair,
    * the CDF-without-change-files contract). Only files that differ
    * between the versions are ever read: a CDC batch that rewrote one
    * file produces a two-file scan regardless of table size — the shuffle
    * the exceptAll pays is bounded by CHANGED bytes, not the table.
    * Requires both versions (and their files) to still be retained;
    * vacuumed versions fail loudly via readVersionLines. */
  def changes(spark: SparkSession, pathStr: String,
              fromV: Int, toV: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    val root = new Path(pathStr)
    val fsys = fs(root)
    // tokens, not names: a merge-on-read delete keeps the file name and
    // changes its VECTOR — the (name, dv) pair is what the diff must see
    def names(v: Option[Int]): Seq[String] = (v match {
      case Some(n) => readVersionLines(root, fsys, n)
      case None    => readManifestLines(root, fsys)
    }).filterNot(_.startsWith("#")).map(parseEntry(_).token)
    val from = names(Some(fromV))
    val to = names(toV)
    // SCHEMA-AWARE across REPLACE/rename/drop boundaries: each side's
    // files are read under the schema THEY were committed with (the
    // `atVersion` read option resolves the archived `_schema.v<V>` —
    // decoding an old generation under the new trailing layout is exactly
    // the ordinal-misread the snapshot-scoped archive exists to prevent),
    // then both sides PROJECT BY NAME onto the consumer's schema — the one
    // at `toV` — null-padding columns that didn't exist yet and dropping
    // ones that no longer do. The feed is therefore always shaped like the
    // destination view, which is what an IVM consumer folds into; changes
    // to since-dropped columns are invisible BY CONSTRUCTION (they cannot
    // affect any aggregate over the surviving schema). A REPLACE surfaces
    // as delete-all-old + insert-all-new less whatever nets out — cost
    // O(both generations), inherent: everything changed.
    val target = tableSchema(pathStr, toV)
    def readFiles(files: Seq[String],
                  at: Option[Int]): org.apache.spark.sql.DataFrame = {
      val projected =
        if (files.isEmpty)
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            tableSchema(pathStr, at))
        else {
          val r = spark.read.format("graft.sources.StoreSink")
            .option("path", pathStr).option("files", files.mkString(","))
          at.fold(r)(v => r.option("atVersion", v.toString)).load()
        }
      projected.select(target.fields.toSeq.map { f =>
        if (projected.columns.contains(f.name))
          org.apache.spark.sql.functions.col(f.name)
        else org.apache.spark.sql.functions.lit(null)
          .cast(f.dataType).as(f.name)
      }: _*)
    }
    val added = readFiles(to.diff(from), toV)
    val removed = readFiles(from.diff(to), Some(fromV))
    added.exceptAll(removed).withColumn("op", lit("insert"))
      .union(removed.exceptAll(added).withColumn("op", lit("delete")))
      .select(("op" +: target.fieldNames.toSeq).map(org.apache.spark.sql.functions.col): _*)
  }

  /** COMMIT LOCK — the concurrency primitive every multi-writer table
    * format needs: commits from DIFFERENT drivers/queries interleave
    * (Spark's output commit coordinator only serializes tasks within one
    * job), and the read-manifest → build → swap sequence is a classic
    * lost-update window (two appends both read generation N, the second
    * swap erases the first's files — reproduced in StoreSinkSpec before
    * this lock existed). `create(lock, overwrite = false)` is atomic on
    * POSIX (O_EXCL) and HDFS, so it is the mutex; every commit path runs
    * promote + rebuild-from-FRESH-manifest + swap inside it, making
    * manifest updates serializable with a metadata-sized critical section
    * (data rewrites stay outside). A dead committer leaves a stale lock:
    * acquisition fails loudly after 30 s naming the file to delete —
    * auditable recovery, never a silent takeover. */
  /** Stale-lock timeout (test hook: the spec shrinks it to prove loudness). */
  @volatile private[sources] var lockTimeoutNanos: Long = 30L * 1000 * 1000 * 1000

  /** Conf key selecting the commit-arbitration provider: `fs` (default),
    * `cas`, or a fully-qualified [[StoreLockProvider]] class name. */
  val LockProviderKey = "spark.graft.store.lock.provider"

  private val providerCache =
    new java.util.concurrent.ConcurrentHashMap[String, StoreLockProvider]()

  private val casWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  private[sources] def lockProvider(): StoreLockProvider = {
    val mode =
      try org.apache.spark.sql.internal.SQLConf.get
        .getConfString(LockProviderKey, "fs")
      catch { case _: Exception => "fs" }
    mode match {
      case "fs"  => FsLockProvider
      case "cas" =>
        // the built-in cas coordinator is PROCESS-LOCAL: selecting it in a
        // multi-driver deployment silently provides no mutual exclusion
        // across JVMs (unlike fs, which is correct on POSIX/HDFS). Warn
        // loudly once — a real object-store deployment must supply a
        // lock-service-backed StoreLockProvider class name instead.
        if (casWarned.compareAndSet(false, true))
          org.slf4j.LoggerFactory.getLogger("graft.store").warn(
            s"$LockProviderKey=cas selects the IN-PROCESS coordinator: " +
              "commit arbitration holds within this driver JVM only. For " +
              "multi-driver deployments supply a StoreLockProvider class " +
              "backed by a real CAS service (S3 conditional PUT, DynamoDB " +
              "lock table, catalog CAS).")
        CasLockProvider
      case cls => providerCache.computeIfAbsent(cls, c =>
        Class.forName(c).getDeclaredConstructor().newInstance()
          .asInstanceOf[StoreLockProvider])
    }
  }

  private[sources] def withCommitLock[T](root: Path, fsys: FileSystem)(body: => T): T = {
    val raw = manifestFs(fsys)
    if (!raw.exists(root)) raw.mkdirs(root)
    val provider = lockProvider()
    val deadline = System.nanoTime + lockTimeoutNanos
    while (!provider.tryClaim(root, raw)) {
      if (System.nanoTime > deadline)
        throw new IllegalStateException(
          s"graft-store commit lock held too long " +
            s"(${provider.describe(root, raw)}) — a dead " +
            "committer leaves a stale lock; delete the claim to recover")
      Thread.sleep(10)
    }
    try body finally provider.release(root, raw)
  }

  /** Default arbitration: a `_commit.lock` file claimed CREATE-EXCLUSIVE on
    * the table directory itself. Atomic where the filesystem gives an
    * atomic exclusive create: O_EXCL on POSIX (via NIO on `file://` —
    * Hadoop's RawLocalFileSystem.create(overwrite = false) is
    * check-then-create, the observed round-13 race), namenode-atomic on
    * HDFS. NOT safe on S3-class object stores without conditional PUT —
    * that is exactly what [[StoreLockProvider]] exists to swap out. */
  object FsLockProvider extends StoreLockProvider {
    private def lockPath(root: Path): Path = new Path(root, "_commit.lock")
    override def tryClaim(root: Path, raw: FileSystem): Boolean = {
      val qualified = raw.makeQualified(lockPath(root))
      try {
        if (qualified.toUri.getScheme == "file")
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(qualified.toUri.getPath))
        else raw.create(lockPath(root), false).close()
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    }
    override def release(root: Path, raw: FileSystem): Unit =
      raw.delete(lockPath(root), false)
    override def describe(root: Path, raw: FileSystem): String =
      raw.makeQualified(lockPath(root)).toString
  }

  /** Conditional-swap arbitration for object stores: the claim is an
    * atomic compare-and-swap AGAINST A COORDINATOR, never a filesystem
    * operation — `putIfAbsent(table, owner)` is semantically the
    * conditional PUT (`If-None-Match: *`) S3 offers, the
    * `attribute_not_exists` conditional write of a DynamoDB lock table,
    * and the CAS a catalog service (the Iceberg commit model) performs.
    * This in-process registry IS that coordinator for a single driver —
    * the seam a deployment fills with its lock-service client — and it
    * makes commit safety INDEPENDENT of the store's filesystem semantics:
    * the fault-injection spec runs the 8-way commit race on a filesystem
    * whose create-exclusive and rename are deliberately non-atomic, and
    * every commit still lands. At 100 TB on S3 this is not optional:
    * object listings are eventually consistent windows and there is no
    * O_EXCL — arbitration must come from a CAS primitive. */
  object CasLockProvider extends StoreLockProvider {
    private val held =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    private def key(root: Path, raw: FileSystem): String =
      raw.makeQualified(root).toUri.toString
    override def tryClaim(root: Path, raw: FileSystem): Boolean =
      held.putIfAbsent(key(root, raw),
        java.lang.Long.valueOf(System.nanoTime())) == null
    override def release(root: Path, raw: FileSystem): Unit =
      held.remove(key(root, raw))
    override def describe(root: Path, raw: FileSystem): String =
      s"cas-coordinator claim on ${key(root, raw)}"
  }

  /** Remove ONLY this query's staging leftovers (losing task attempts).
    * The staging dir is shared by concurrent writers — the old
    * delete-the-whole-dir cleanup would erase a racing commit's staged
    * files out from under it. The trailing empty-dir removal is
    * check-then-act, so it runs ONLY when the caller holds the commit lock
    * (`underLock = true`, the commit paths); abort() runs lockless and must
    * leave the dir — a concurrent writer may have just staged its first
    * file into the listing window. */
  private[sources] def cleanStaging(root: Path, fsys: FileSystem,
                                    queryId: String,
                                    underLock: Boolean = false): Unit = {
    val staging = new Path(root, Staging)
    if (!fsys.exists(staging)) return
    fsys.listStatus(staging).map(_.getPath)
      .filter(_.getName.contains(queryId))
      .foreach(fsys.delete(_, false))
    if (underLock && fsys.listStatus(staging).isEmpty) fsys.delete(staging, true)
  }

  /** ORPHAN-FILE CLEANUP (`CALL graft.remove_orphans(path, older_ms)` —
    * the Iceberg remove_orphan_files procedure): delete data-shaped files
    * under the table root that NO retained version, live branch, or
    * current manifest references AND whose modification time predates the
    * cutoff — crashed writers' leftovers (a staged file whose JVM died
    * before abort, a promoted file whose commit never published). The age
    * cutoff is the safety margin: a LIVE writer's staged/promoted-but-
    * unpublished files are younger than any sane cutoff (Iceberg defaults
    * to 3 days), so the sweep can run while writers run. Under the commit
    * lock — a concurrent commit between "read manifests" and "delete"
    * could otherwise publish a file this sweep considers orphaned.
    * Returns (orphans deleted, files examined). */
  def removeOrphans(pathStr: String, olderThanMs: Long): (Int, Int) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    var res = (0, 0)
    withCommitLock(root, fsys) {
      val versions = listVersions(root, fsys)
      val physicals = versions.map(v => readVersionPhysical(root, fsys, v)) :+
        readListLines(root, fsys)
      val branchLines = listBranches(root, fsys)
        .flatMap(b => readBranchLines(root, fsys, b))
      val referenced = (physicals.flatMap(expand(root, fsys, _)) ++ branchLines)
        .filterNot(_.startsWith("#")).map(parseEntry)
        .flatMap(e => e.name +: (e.dv.toSeq ++ e.eq.toSeq)).toSet
      val candidates = listDataFiles(root, fsys) ++ {
        val staging = new Path(root, Staging)
        if (!fsys.exists(staging)) Nil
        else fsys.listStatus(staging).toSeq
          .map(st => s"$Staging/${st.getPath.getName}")
      }
      var deleted = 0
      candidates.foreach { n =>
        val p = new Path(root, n)
        if (!referenced.contains(n) &&
            fsys.getFileStatus(p).getModificationTime < olderThanMs) {
          fsys.delete(p, false)
          deleted += 1
        }
      }
      res = (deleted, candidates.size)
    }
    res
  }

  /** Promote acknowledged staged files to their committed locations
    * (partitioned payloads land in their partition directory). Caller holds
    * the commit lock. */
  private[sources] def promote(root: Path, fsys: FileSystem, staging: Path,
                               committed: Seq[StoreFilePayload]): Unit =
    committed.foreach { m =>
      val dst = new Path(root, m.name)
      if (m.dir.nonEmpty) fsys.mkdirs(dst.getParent)
      require(fsys.rename(new Path(staging, m.staged), dst),
        s"failed to promote ${m.staged} -> ${m.name}")
    }

  // ------------------------------------------------- WAP branches
  /** WRITE-AUDIT-PUBLISH branches: an append targeted at a branch commits
    * its entries to a side manifest (`_manifest.b<name>`) instead of the
    * main list — the data files promote into the table directory as
    * usual but stay INVISIBLE to main readers (visibility is manifest
    * membership, the protocol's core invariant doing double duty). An
    * audit reads `option("branch", name)` — main ∪ staged — and
    * `CALL graft.publish(path, name)` folds the branch's entries into the
    * main manifest in one ordinary versioned swap (pure-append branches
    * cannot conflict); `CALL graft.abandon` deletes the side manifest and
    * vacuum GCs the orphaned files. This is the Iceberg/Nessie WAP
    * pattern: bad data is auditable and discardable WITHOUT ever having
    * been visible, and publish is metadata-only. Branch manifests are
    * FLAT (publish folds them through the ordinary tree-building swap)
    * and branch writes are append-only by contract. */
  private[sources] def branchFile(name: String): String = {
    require(name.matches("[A-Za-z0-9_-]+"), s"invalid branch name: $name")
    s"_manifest.b$name"
  }

  private[sources] def readBranchLines(root: Path, fsys: FileSystem,
                                       name: String): Seq[String] = {
    val raw = manifestFs(fsys)
    val bf = new Path(root, branchFile(name))
    if (!raw.exists(bf)) return Nil
    val in = raw.open(bf)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    finally in.close()
  }

  private[sources] def writeBranchAtomic(root: Path, fsys: FileSystem,
                                         name: String, lines: Seq[String]): Unit = {
    val raw = manifestFs(fsys)
    val tmp = new Path(root, branchFile(name) + ".tmp")
    val out = raw.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = raw.makeQualified(new Path(root, branchFile(name)))
    if (dst.toUri.getScheme == "file")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(raw.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, raw.getConf)
      fc.rename(raw.makeQualified(tmp), dst,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  private[sources] def branchExists(root: Path, fsys: FileSystem,
                                    name: String): Boolean =
    name.matches("[A-Za-z0-9_-]+") &&
      manifestFs(fsys).exists(new Path(root, branchFile(name)))

  private[sources] def listBranches(root: Path, fsys: FileSystem): Seq[String] =
    manifestFs(fsys).listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("_manifest.b") && !n.endsWith(".tmp"))
      .map(_.stripPrefix("_manifest.b")).toSeq.sorted

  /** Fold a branch into main: one versioned manifest swap; the branch ref
    * dies with the publish. Returns (files, rows) published. */
  def publish(pathStr: String, name: String): (Long, Long) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    var stats = (0L, 0L)
    withCommitLock(root, fsys) {
      val entries = readBranchLines(root, fsys, name)
      require(entries.nonEmpty, s"branch $name does not exist or is empty")
      writeManifestAtomic(root, fsys, readManifestLines(root, fsys) ++ entries)
      // fold sketches BEFORE the branch delete (a crash in between then
      // replays the idempotent fold instead of stranding the sidecar) —
      // but NON-THROWING: plain publish has no txn-marker idempotency
      // guard, so a fold error surfacing here would leave the branch
      // file behind a completed swap and a user RETRY would append the
      // same entries twice (second review catch). NDV is advisory;
      // losing one fold is the acceptable failure, double-publishing
      // rows is not.
      try foldBranchNdv(root, fsys, name) // published rows enter the NDV
      catch { case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"branch NDV fold failed for $name at $pathStr — estimates " +
            s"may lag until ANALYZE: $e")
      }
      manifestFs(fsys).delete(new Path(root, branchFile(name)), false)
      stats = (entries.size.toLong,
        entries.map(l => math.max(parseEntry(l).rows, 0L)).sum)
    }
    stats
  }

  // ------------------------------------------- multi-table atomic publish
  /** Test hooks for the 2PC window (crash injection in specs). */
  @volatile private[sources] var onTxnSwapped: String => Unit = _ => ()
  @volatile private[sources] var onTxnPrepared: () => Unit = () => ()

  /** Applied-transaction manifest marker (`#txn=<id>`): written IN the
    * APPLY swap itself, so "did this table already apply txn X" is one
    * atomic fact — the roll-forward idempotency key that survives later
    * commits mutating or replacing the applied entries. One short line
    * per multi-table txn, the `#epoch=` ledger precedent. */
  private def txnMarker(id: String): String = s"#txn=$id"

  /** MULTI-TABLE ATOMIC PUBLISH (verdict r9 #8): fold a WAP branch into
    * main on N stores ALL-OR-NOTHING — the cross-table transaction a
    * multi-table pipeline needs at publish time (facts + their dimension
    * must go live together). Two-phase commit with presumed abort:
    *
    *  1. PREPARE — under every table's commit lock (taken in path order,
    *     deadlock-free), validate the branches and write a `_txn.<id>` WAL
    *     into each table dir naming the COORDINATOR and the branch;
    *  2. DECIDE — one atomic create of `_txn.<id>.commit` at the
    *     coordinator table: the single durable commit point;
    *  3. APPLY — fold each branch (idempotency key: the branch file's
    *     existence) and clean the WALs/marker up.
    *
    * A crash anywhere leaves recoverable state, never a torn outcome:
    * [[recoverTxn]] rolls FORWARD when the marker exists (some tables may
    * already show the publish — durability, not read atomicity: readers
    * that must see N tables move together read through a catalog pin) and
    * ABORTS otherwise (branches stay staged, WAP semantics). This is the
    * Iceberg/Nessie catalog-transaction shape with the decision record
    * living next to the data. Returns (tables, files published). */
  // ------------------------------------------- catalog snapshot pointer
  /** MULTI-TABLE READ ATOMICITY (round-11 verdict #2b — the upgrade path
    * SCALE.md named): publish_all's 2PC makes the OUTCOME atomic, but a
    * reader racing the APPLY phase can still see table A's new version next
    * to table B's old one — the Iceberg-on-HMS limit. The fix is the same
    * one Iceberg's catalogs use: a SNAPSHOT POINTER — one `_catalog` file
    * mapping table path → pinned version, swapped in ONE atomic write.
    * Readers resolve the whole map in ONE read ([[readCatalogSnapshot]])
    * and read every table AT its pinned version (`atVersion` /
    * VERSION AS OF — versions are immutable), so any snapshot they obtain
    * is all-old or all-new by construction, regardless of where a
    * concurrent publish is in its APPLY. publishAll advances the pointer
    * only AFTER every swap landed; a crash before that leaves the catalog
    * consistently old (tables roll forward on recovery, and the pointer
    * catches up on the next publish or [[catalogSync]]). */
  val CatalogFile = "_catalog"

  /** The pinned (table path → version) map — ONE control-file read. */
  def readCatalogSnapshot(catalogPath: String): Map[String, Int] = {
    val root = new Path(catalogPath)
    readSmall(root, fs(root), CatalogFile) match {
      case None => Map.empty
      case Some(txt) => txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .map { l =>
          val Array(p, v) = l.split("\\|", 2)
          (java.net.URLDecoder.decode(p, "UTF-8"), v.toInt)
        }.toMap
    }
  }

  /** Merge `updates` into the catalog pointer under its own commit lock
    * (concurrent publishes of DISJOINT table sets serialize here). */
  private def advanceCatalog(catalogPath: String,
                             updates: Map[String, Int]): Unit = {
    val root = new Path(catalogPath)
    val fsys = fs(root)
    withCommitLock(root, fsys) {
      val merged = readCatalogSnapshot(catalogPath) ++ updates
      atomicWriteSmall(root, fsys, CatalogFile,
        merged.toSeq.sortBy(_._1).map { case (p, v) =>
          s"${java.net.URLEncoder.encode(p, "UTF-8")}|$v"
        }.mkString("\n"))
    }
  }

  /** Pin each table's CURRENT head version into the catalog — the initial
    * registration (and the catch-up after a crash-recovered publish). */
  def catalogSync(catalogPath: String, tables: Seq[String]): Unit =
    advanceCatalog(catalogPath, tables.map { p =>
      p -> listVersions(new Path(p), fs(new Path(p))).lastOption.getOrElse(0)
    }.toMap)

  def publishAll(tables: Seq[(String, String)],
                 catalog: Option[String] = None): (Long, Long) = {
    require(tables.size >= 2,
      "publish_all is the multi-table form; CALL graft.publish for one table")
    require(tables.map(_._1).distinct.size == tables.size,
      s"duplicate table paths: ${tables.map(_._1).mkString(",")}")
    val sorted = tables.sortBy(_._1)
    val coord = sorted.head._1
    val peers = sorted.map(_._1).mkString(",")
    val txnId = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    def locked[T](ps: Seq[String])(body: => T): T = ps match {
      case Seq() => body
      case h +: t => withCommitLock(new Path(h), fs(new Path(h)))(locked(t)(body))
    }
    var published = 0L
    locked(sorted.map(_._1)) {
      // a crashed predecessor must resolve before new 2PC state stacks up
      sorted.foreach { case (p, _) => recoverLocked(new Path(p), fs(new Path(p))) }
      sorted.foreach { case (p, b) =>
        require(readBranchLines(new Path(p), fs(new Path(p)), b).nonEmpty,
          s"branch $b of $p does not exist or is empty")
      }
      sorted.foreach { case (p, b) => // PREPARE: durable intent per table
        val root = new Path(p); val raw = manifestFs(fs(root))
        val out = raw.create(new Path(root, s"_txn.$txnId"), true)
        try out.write(s"coord=$coord\nbranch=$b\npeers=$peers"
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
      }
      onTxnPrepared()
      // DECIDE: the commit point — one atomic create at the coordinator
      val croot = new Path(coord)
      manifestFs(fs(croot)).create(new Path(croot, s"_txn.$txnId.commit"),
        false).close()
      sorted.foreach { case (p, b) => // APPLY: ordinary versioned swaps
        val root = new Path(p); val fsys = fs(root)
        val entries = readBranchLines(root, fsys, b)
        // the branch file's existence is the roll-forward idempotency KEY,
        // but the swap and the branch delete are two FS ops — a crash
        // between them leaves both halves. The swap therefore records the
        // txn id as a MANIFEST MARKER (`#txn=<id>`, the epoch-ledger
        // precedent): recovery skips re-appending when the marker is
        // already in head. Exact-line matching is NOT enough — a commit
        // between the crash and the recovery can mutate an applied entry's
        // line (dv/eq attach) or replace its file outright (COW,
        // compaction), and the resurrected original would double-count.
        val head = readManifestLines(root, fsys)
        if (!head.contains(txnMarker(txnId)))
          writeManifestAtomic(root, fsys,
            head ++ entries :+ txnMarker(txnId))
        foldBranchNdv(root, fsys, b) // idempotent: fold precedes the delete
        manifestFs(fsys).delete(new Path(root, branchFile(b)), false)
        published += entries.size
        onTxnSwapped(p)
      }
      sorted.foreach { case (p, _) =>
        manifestFs(fs(new Path(p))).delete(new Path(new Path(p), s"_txn.$txnId"), false)
      }
      manifestFs(fs(croot)).delete(new Path(croot, s"_txn.$txnId.commit"), false)
      // advance the snapshot pointer LAST: catalog readers flip from the
      // all-old snapshot to the all-new one in this single write — the only
      // instant the publish becomes visible to them
      catalog.foreach(c => catalogSync(c, sorted.map(_._1)))
    }
    (sorted.size.toLong, published)
  }

  /** Resolve this table's crashed multi-table transactions: roll forward
    * committed ones (decision marker present at their coordinator), abort
    * the rest (presumed abort — the branch stays staged and auditable).
    * Returns (rolled forward, aborted). */
  def recoverTxn(pathStr: String): (Long, Long) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    withCommitLock(root, fsys)(recoverLocked(root, fsys))
  }

  private def recoverLocked(root: Path, fsys: FileSystem): (Long, Long) = {
    val raw = manifestFs(fsys)
    if (!raw.exists(root)) return (0L, 0L)
    var forward = 0L; var aborted = 0L
    raw.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("_txn.") && !n.endsWith(".commit") &&
        !n.endsWith(".tmp"))
      .foreach { w =>
        val id = w.stripPrefix("_txn.")
        val in = raw.open(new Path(root, w))
        val kv = (try new String(org.apache.commons.io.IOUtils.toByteArray(in),
            StandardCharsets.UTF_8)
          finally in.close())
          .split("\n").map(_.split("=", 2)).collect {
            case Array(k, v) => (k, v) }.toMap
        if (!kv.contains("coord") || !kv.contains("branch")) {
          // torn WAL (crash mid-write): the decision marker cannot exist —
          // it is only created after every WAL is durably complete — so
          // this is a presumed abort, never a recovery wedge
          raw.delete(new Path(root, w), false)
          aborted += 1
        } else {
        val croot = new Path(kv("coord"))
        val marker = new Path(croot, s"_txn.$id.commit")
        if (manifestFs(fs(croot)).exists(marker)) {
          val b = kv("branch")
          if (branchExists(root, fsys, b)) { // not yet applied: roll forward
            val entries = readBranchLines(root, fsys, b)
            // idempotent application (same rule as publishAll's APPLY):
            // the `#txn=` marker in head — not line equality, which a
            // mask-attach or COW rename between crash and recovery
            // defeats — decides whether the swap already landed
            val head = readManifestLines(root, fsys)
            if (!head.contains(txnMarker(id)))
              writeManifestAtomic(root, fsys,
                head ++ entries :+ txnMarker(id))
            foldBranchNdv(root, fsys, b)
            raw.delete(new Path(root, branchFile(b)), false)
          }
          raw.delete(new Path(root, w), false)
          // the marker dies when the LAST peer's WAL is gone
          val peersLeft = kv.get("peers").toSeq.flatMap(_.split(','))
            .filter(_.nonEmpty).exists { p =>
              manifestFs(fs(new Path(p))).exists(new Path(new Path(p), s"_txn.$id"))
            }
          if (!peersLeft) manifestFs(fs(croot)).delete(marker, false)
          forward += 1
        } else { // no decision: presumed abort, the branch stays staged
          raw.delete(new Path(root, w), false)
          aborted += 1
        }
        }
      }
    (forward, aborted)
  }

  /** ROLLBACK: restore the table to an archived generation by publishing
    * that version's PHYSICAL list as a NEW version — history is never
    * erased (the bad generation stays time-travelable and auditable; the
    * rollback itself is a ledger-stamped commit), which is the
    * Iceberg-rollback contract and the difference between "undo" and
    * "rewrite history". Metadata-only: segment pointers are content-
    * addressed, so the restored list reuses the old segments byte-for-
    * byte. Returns (restored version, new version). */
  def rollback(pathStr: String, toVersion: Int): (Long, Long) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    withCommitLock(root, fsys) {
      // readVersionLines fails loudly on a vacuumed/unknown version; the
      // swap reseals the logical lines — content-addressed segments make
      // the reseal reuse the old generation's segment files byte-for-byte
      val target = readVersionLines(root, fsys, toVersion)
      writeManifestAtomic(root, fsys, target)
      (toVersion.toLong, listVersions(root, fsys).last.toLong)
    }
  }

  /** CHERRY-PICK: re-apply one archived APPEND commit's file delta onto the
    * current head as a NEW commit — the selective-redo companion to
    * [[rollback]] (roll the bad load out, cherry-pick the good loads back).
    * The picked delta is version v's data lines minus v-1's (line identity,
    * the MoR-aware witness); the pick REFUSES loudly when v was not
    * append-only (it removed or rewrote lines — replaying those against a
    * diverged head would resurrect or double-delete rows) and when any
    * picked file name already sits at head (the commit is already there).
    * Metadata-only: content-addressed segments and promoted data files are
    * reused byte-for-byte, so picking a terabyte load costs one list swap.
    * Returns (files re-applied, new head version). */
  def cherryPick(pathStr: String, v: Int): (Long, Long) = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    withCommitLock(root, fsys) {
      val prev = if (v <= 1) Nil else readVersionLines(root, fsys, v - 1)
      val target = readVersionLines(root, fsys, v)
      val prevData = prev.filterNot(_.startsWith("#")).toSet
      val vData = target.filterNot(_.startsWith("#"))
      val removed = prevData -- vData.toSet
      require(removed.isEmpty,
        s"cherry-pick source v$v is not append-only; it removed or rewrote: " +
          removed.take(3).mkString(","))
      val added = vData.filterNot(prevData)
      val head = readManifestLines(root, fsys)
      val headNames = head.filterNot(_.startsWith("#"))
        .map(parseEntry(_).name).toSet
      val dup = added.map(parseEntry(_).name).filter(headNames)
      require(dup.isEmpty,
        s"cherry-pick conflict: files already at head: ${dup.take(3).mkString(",")}")
      writeManifestAtomic(root, fsys, head ++ added)
      (added.size.toLong, listVersions(root, fsys).last.toLong)
    }
  }

  /** Discard a branch: delete its ref; the staged files become
    * unreferenced and the next vacuum GCs them. Returns files dropped. */
  def abandon(pathStr: String, name: String): Long = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    withCommitLock(root, fsys) {
      val n = readBranchLines(root, fsys, name).size.toLong
      manifestFs(fsys).delete(new Path(root, branchFile(name)), false)
      // abandoned rows never existed: their stashed sketches die too
      manifestFs(fsys).delete(new Path(root, branchNdvFile(name)), false)
      n
    }
  }

  /** Serializable manifest update: under the commit lock, hand the FRESH
    * manifest lines to `build` and swap in its result. Every concurrent
    * committer rebases on the state the previous one published. */
  private[sources] def commitUpdate(root: Path, fsys: FileSystem)(
      build: Seq[String] => Seq[String]): Unit =
    withCommitLock(root, fsys) {
      writeManifestAtomic(root, fsys, build(readManifestLines(root, fsys)))
    }

  /** Commit-time ledger line (first line of every physical list): the
    * timestamp `TIMESTAMP AS OF` resolves against. Deliberately NOT file
    * mtime — regenerated testdata or a copied table must not move history.
    * Strictly monotone (commits are serialized by the lock, and a clock
    * step backwards still bumps by 1 ms), so every version has a unique,
    * ordered instant. */
  private val TsMark = "#ts="

  /** Commit timestamp (epoch millis) of an archived version; 0 for
    * pre-ledger manifests. */
  private[sources] def versionTs(root: Path, fsys: FileSystem, v: Int): Long =
    readVersionPhysical(root, fsys, v)
      .find(_.startsWith(TsMark)).map(_.stripPrefix(TsMark).toLong).getOrElse(0L)

  /** (version, commit ts millis, data files, live rows) per archived
    * generation — computed from LIST metadata only (pointer aggregates),
    * no segment or data reads. */
  def history(pathStr: String): Seq[(Int, Long, Long, Long)] = {
    val root = new Path(pathStr)
    val fsys = fs(root)
    listVersions(root, fsys).map { v =>
      val phys = readVersionPhysical(root, fsys, v)
      var files = 0L; var rows = 0L
      phys.filterNot(_.startsWith("#")).foreach { l =>
        if (l.startsWith(SegMark)) {
          val sp = parseSeg(l); files += sp.nData; rows += math.max(sp.rows, 0L)
        } else { files += 1; rows += math.max(parseEntry(l).rows, 0L) }
      }
      (v, versionTs(root, fsys, v), files, rows)
    }
  }

  /** Latest version committed at or before `tsMillis`; loud when the
    * instant predates the table (or every version up to it was vacuumed —
    * history must never silently resolve to a LATER state). */
  private[sources] def versionAt(root: Path, fsys: FileSystem,
                                 tsMillis: Long): Int = {
    val vs = listVersions(root, fsys)
      .map(v => (v, versionTs(root, fsys, v))).filter(_._2 <= tsMillis)
    require(vs.nonEmpty,
      s"graft-store has no version committed at or before ts=$tsMillis ms " +
        "(the instant predates the table, or those versions were vacuumed)")
    vs.maxBy(_._2)._1
  }

  /** Atomically publish a SMALL control file (pointer/catalog): write a
    * sidecar-free tmp, then ONE namespace op into place — the same swap
    * discipline as the manifest (readers see the old content or the new,
    * never a missing or torn file). */
  private[sources] def atomicWriteSmall(root: Path, fsys: FileSystem,
                                        name: String, content: String): Unit = {
    val raw = manifestFs(fsys)
    val tmp = new Path(root, s"$name.tmp")
    val out = raw.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = raw.makeQualified(new Path(root, name))
    raw.delete(new Path(root, s".$name.crc"), false)
    raw.delete(new Path(root, s".$name.tmp.crc"), false)
    if (dst.toUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(raw.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        dst.toUri, raw.getConf)
      fc.rename(raw.makeQualified(tmp), dst,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Read a small control file as trimmed text; None when absent. */
  private[sources] def readSmall(root: Path, fsys: FileSystem,
                                 name: String): Option[String] = {
    val raw = manifestFs(fsys)
    val p = new Path(root, name)
    if (!raw.exists(p)) None
    else {
      val in = raw.open(p)
      Some(try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8).trim
        finally in.close())
    }
  }

  private[sources] def writeManifestAtomic(
      root: Path, fsys: FileSystem, lines: Seq[String]): Unit = {
    val raw = manifestFs(fsys)
    // seal into the manifest TREE: unchanged segments carry over by
    // pointer, touched/new lines become loose or freshly sealed segments —
    // the physical rewrite is O(changed metadata), not O(files).
    // Any #ts line riding in from a rebase is stripped — the commit stamps
    // its OWN instant as the physical head line.
    val prevTs = listVersions(root, fsys).lastOption
      .map(v => versionTs(root, fsys, v)).getOrElse(0L)
    val ts = math.max(System.currentTimeMillis(), prevTs + 1)
    val physical = (TsMark + ts) +:
      sealLines(root, fsys, lines.filterNot(_.startsWith(TsMark)))
    val tmp = new Path(root, Manifest + ".tmp")
    val out = raw.create(tmp, true)
    try out.write(physical.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // archive this generation (commits are serialized by the commit lock,
    // so the next version number cannot race); archives are PHYSICAL — a
    // version shares its segments with every other generation that kept
    // them, so history is O(deltas), not O(versions × files)
    val nextV = listVersions(root, fsys).lastOption.getOrElse(0) + 1
    val vout = raw.create(versionPath(root, nextV), true)
    try vout.write(physical.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally vout.close()
    val mf = new Path(root, Manifest)
    // drop any sidecar a pre-raw-IO build left behind (stale crc would
    // mispair with raw-written content for checksum-FS readers)
    raw.delete(new Path(root, "." + Manifest + ".crc"), false)
    raw.delete(new Path(root, "." + Manifest + ".tmp.crc"), false)
    // The swap must be ONE namespace op — any delete-then-rename pair
    // leaves a window with no manifest, where a concurrent reader plans an
    // empty table (observed: the store-tail stream polling during an
    // append saw 0 entries — LocalFs's Rename.OVERWRITE is internally
    // delete+rename). On a local FS use POSIX rename(2) via NIO
    // ATOMIC_MOVE; elsewhere (HDFS et al.) FileContext's OVERWRITE rename
    // is the atomic primitive.
    val qualifiedMf = raw.makeQualified(mf)
    if (qualifiedMf.toUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(raw.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(qualifiedMf.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        qualifiedMf.toUri, raw.getConf)
      fc.rename(raw.makeQualified(tmp), qualifiedMf,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** `base` shifts past leading non-table columns: 0 for plain batch /
    * streaming writes; 1 for group-based ReplaceData rows, whose layout is
    * `(__row_operation, table columns...)` — Spark's row-level rewrite
    * prepends RowDeltaUtils.OPERATION_COLUMN (observed value 6 =
    * WRITE_WITH_METADATA_OPERATION) and the LogicalWriteInfo schema does
    * NOT include it, so the writer must detect it by field count. */
  /** Encode the table columns of `row` (skipping `base` leading protocol
    * columns) under `types` — the WRITE-TIME table schema, so a file's
    * width records the schema generation it was written under. `slots` is
    * the physical emission order (physical slot → logical column, −1 for a
    * tombstoned slot, which writes a null placeholder so slot positions
    * stay id-stable — see [[StoreLayout]]); null means the layouts
    * coincide. */
  private[sources] def encode(row: InternalRow, base: Int,
                              types: Array[DataType],
                              slots: Array[Int] = null): String = {
    val sb = new StringBuilder
    val width = if (slots == null) types.length else slots.length
    var s = 0
    while (s < width) {
      if (s > 0) sb.append(',')
      val i = if (slots == null) s else slots(s)
      if (i < 0 || row.isNullAt(base + i)) sb.append(NullMark)
      else types(i) match {
        case LongType => sb.append(row.getLong(base + i))
        case IntegerType => sb.append(row.getInt(base + i))
        case StringType =>
          sb.append(java.net.URLEncoder.encode(row.getString(base + i), "UTF-8"))
        case dt if isFarr(dt) =>
          sb.append(floatsToHex(row.getArray(base + i)))
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
      s += 1
    }
    sb.result()
  }

  /** Decode a line under the CURRENT table types, padding columns the file
    * predates with their declared DEFAULT (else NULL — schema evolution:
    * old files never rewrite). An explicit null mark decodes to NULL
    * regardless of defaults. */
  private[sources] def decode(line: String,
                              types: Array[DataType] = baseTypes,
                              defaults: Array[Any] = null): InternalRow = {
    val parts = line.split(",", -1)
    InternalRow.fromSeq((0 until types.length).map { i =>
      if (i >= parts.length) (if (defaults == null) null else defaults(i))
      else if (parts(i) == NullMark) null
      else types(i) match {
        // an int slot later WIDENED to bigint decodes under LongType: the
        // text encoding makes physical widening a pure metadata change
        case LongType => java.lang.Long.valueOf(parts(i).toLong)
        case IntegerType => java.lang.Integer.valueOf(parts(i).toInt)
        case StringType =>
          UTF8String.fromString(java.net.URLDecoder.decode(parts(i), "UTF-8"))
        case dt if StoreSink.isFarr(dt) => StoreSink.hexToFloats(parts(i))
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
    })
  }

  private[sources] val baseTypes: Array[DataType] =
    schema.fields.map(_.dataType)

  /** Physical emission order for a write against `pathStr` (see
    * [[StoreLayout.slots]]): resolved on the DRIVER at write-factory
    * construction. Falls back to the identity layout when the sidecar's
    * live width disagrees with the write schema — raw writes to a
    * sidecar-less directory keep their round-13 behavior. */
  private[sources] def writeSlots(pathStr: String,
                                  dataSchema: StructType): Array[Int] = {
    val layout = layoutAt(pathStr, None)
    if (layout.proj.length == dataSchema.fields.length && !layout.identity)
      layout.slots
    else null
  }

  // ------------------------------------------------- delete-filter evaluator
  /** SQL three-valued predicate over a decoded store row: rows evaluating
    * TRUE are deleted; FALSE/UNKNOWN survive (the DELETE contract). Only
    * filters [[canEvaluate]] accepted resolves; anything else must have
    * been declined in canDeleteWhere. */
  private[sources] def canEvaluate(f: Filter): Boolean = f match {
    case EqualTo(a, _) => colIdx(a) >= 0
    case GreaterThan(a, _) => colIdx(a) >= 0
    case GreaterThanOrEqual(a, _) => colIdx(a) >= 0
    case LessThan(a, _) => colIdx(a) >= 0
    case LessThanOrEqual(a, _) => colIdx(a) >= 0
    case In(a, _) => colIdx(a) >= 0
    case IsNull(a) => colIdx(a) >= 0
    case IsNotNull(a) => colIdx(a) >= 0
    case And(l, r) => canEvaluate(l) && canEvaluate(r)
    case Or(l, r) => canEvaluate(l) && canEvaluate(r)
    case Not(c) => canEvaluate(c)
    case _: AlwaysTrue | _: AlwaysFalse => true
    case _ => false
  }

  private def colIdx(name: String): Int = name match {
    case "k" => 0
    case "grp" => 1
    case "amt_cents" => 2
    case _ => -1
  }

  /** Row value as a comparable; None for NULL. */
  private def valueOf(row: InternalRow, idx: Int): Option[Any] =
    if (row.isNullAt(idx)) None
    else Some(idx match {
      case 1 => row.getString(1)
      case i => row.getLong(i)
    })

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case i: java.lang.Integer => Some(i.longValue())
    case l: java.lang.Long => Some(l.longValue())
    case _ => None
  }

  /** Compare a row value with a literal; None when either side is null or
    * the literal type is foreign (UNKNOWN). */
  private def cmp(row: InternalRow, col: Int, lit: Any): Option[Int] =
    valueOf(row, col).flatMap { v =>
      (v, col) match {
        case (s: String, 1) => lit match {
          case ls: String => Some(s.compareTo(ls))
          case lu: UTF8String => Some(s.compareTo(lu.toString))
          case _ => None
        }
        case (l: Long, _) => asLong(lit).map(ll => java.lang.Long.compare(l, ll))
        case _ => None
      }
    }

  /** Three-valued eval: Some(true/false) or None (UNKNOWN). */
  private[sources] def eval(f: Filter, row: InternalRow): Option[Boolean] = f match {
    case EqualTo(a, v) => cmp(row, colIdx(a), v).map(_ == 0)
    case GreaterThan(a, v) => cmp(row, colIdx(a), v).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(row, colIdx(a), v).map(_ >= 0)
    case LessThan(a, v) => cmp(row, colIdx(a), v).map(_ < 0)
    case LessThanOrEqual(a, v) => cmp(row, colIdx(a), v).map(_ <= 0)
    case In(a, vs) =>
      val i = colIdx(a)
      if (valueOf(row, i).isEmpty) None
      else {
        val hits = vs.map(v => cmp(row, i, v))
        if (hits.exists(_.contains(0))) Some(true)
        else if (hits.forall(_.isDefined)) Some(false)
        else None // null literal in the list: x IN (..., NULL) is UNKNOWN
      }
    case IsNull(a) => Some(valueOf(row, colIdx(a)).isEmpty)
    case IsNotNull(a) => Some(valueOf(row, colIdx(a)).nonEmpty)
    case And(l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(c) => eval(c, row).map(!_)
    case _: AlwaysTrue => Some(true)
    case _: AlwaysFalse => Some(false)
    case _ => None
  }

  /** Conjunct key bounds over top-level filters — the zone-map pruning
    * predicate. OR-rooted filters contribute nothing (no sound bound). */
  private[sources] def kBounds(filters: Array[Filter]): (Option[Long], Option[Long]) =
    colBounds(filters, "k")

  /** [[kBounds]] generalized to any long zone column (`k` or the second
    * zone column `amt_cents`). */
  private[sources] def colBounds(filters: Array[Filter],
                                 c: String): (Option[Long], Option[Long]) = {
    var lo: Option[Long] = None; var hi: Option[Long] = None
    def raise(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def lower(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    filters.foreach {
      case EqualTo(`c`, v) => asLong(v).foreach { x => raise(x); lower(x) }
      case GreaterThan(`c`, v) => asLong(v).foreach(x => raise(x + 1))
      case GreaterThanOrEqual(`c`, v) => asLong(v).foreach(raise)
      case LessThan(`c`, v) => asLong(v).foreach(x => lower(x - 1))
      case LessThanOrEqual(`c`, v) => asLong(v).foreach(lower)
      case In(`c`, vs) =>
        val ls = vs.flatMap(v => asLong(v))
        if (ls.nonEmpty && ls.length == vs.length) { raise(ls.min); lower(ls.max) }
      case _ => ()
    }
    (lo, hi)
  }

  /** Compile a filter ONCE per delete into a per-row closure. The payoff is
    * `In`: a CDC key list is thousands of literals, and the naive
    * interpret-per-row walk is O(rows × |list|) (measured 12 s on a 150k-row
    * store × 3.2k-key delete); the compiled form hashes the literal set once
    * — O(rows). Semantics identical to [[eval]], three-valued In included
    * (x IN (..., incomparable) is UNKNOWN when unmatched). */
  private[sources] def compile(f: Filter): InternalRow => Option[Boolean] = f match {
    case In(a, vs) =>
      val i = colIdx(a)
      if (i == 1) {
        val anyBad = vs.exists(v => !(v.isInstanceOf[String] || v.isInstanceOf[UTF8String]))
        val set: Set[String] = vs.collect {
          case s: String => s
          case u: UTF8String => u.toString
        }.toSet
        row => valueOf(row, i) match {
          case None => None
          case Some(v) =>
            if (set.contains(v.asInstanceOf[String])) Some(true)
            else if (anyBad) None else Some(false)
        }
      } else {
        val anyBad = vs.exists(v => asLong(v).isEmpty)
        val set: Set[Long] = vs.flatMap(v => asLong(v)).toSet
        row => valueOf(row, i) match {
          case None => None
          case Some(v) =>
            if (set.contains(v.asInstanceOf[Long])) Some(true)
            else if (anyBad) None else Some(false)
        }
      }
    case And(l, r) =>
      val cl = compile(l); val cr = compile(r)
      row => (cl(row), cr(row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    case Or(l, r) =>
      val cl = compile(l); val cr = compile(r)
      row => (cl(row), cr(row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    case Not(c) =>
      val cc = compile(c)
      row => cc(row).map(!_)
    case other => row => eval(other, row)
  }
}

private class StoreTable(pathStr: String, version: Option[Int] = None,
                         requested: Array[Transform] = Array.empty,
                         viaCatalog: Boolean = false,
                         branchView: Option[String] = None,
                         mergeCap: Boolean = false)
    extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsAtomicPartitionManagement {

  /** TABLE PROPERTIES from the `_props` sidecar — `SHOW TBLPROPERTIES` /
    * `DESCRIBE EXTENDED` read this map; maintenance reads its operational
    * keys (see [[StoreSink.PropsFile]]). */
  override def properties(): java.util.Map[String, String] = {
    val root = new Path(pathStr)
    val m = new java.util.HashMap[String, String]()
    StoreSink.readProps(root, StoreSink.fs(root)).foreach { case (k, v) =>
      m.put(k, v)
    }
    m
  }

  // ---------------------------------------------- partition management DDL
  // `SHOW PARTITIONS graft.store`, `ALTER TABLE ... DROP PARTITION (...)`,
  // `TRUNCATE TABLE ... PARTITION (...)`: the partition inventory IS the
  // manifest's distinct part values (no directory listing), and dropping a
  // partition is a METADATA operation — one manifest swap removing its
  // entries; the data files stay referenced by archived versions until
  // vacuum. Partitions materialize on write, so ADD PARTITION is refused
  // loudly. At 100 TB: drop-a-partition costs one list rewrite regardless
  // of partition bytes — the retention story every date/bucket layout
  // needs.
  private lazy val partSpec: Option[StoreSink.PartSpec] = {
    val root = new Path(pathStr)
    StoreSink.readPartSpec(root, StoreSink.fs(root))
  }

  override def partitionSchema(): StructType = partSpec match {
    case Some(sp) if sp.kind == "bucket" =>
      StructType(Seq(StructField(s"${sp.col}_bucket", IntegerType, nullable = false)))
    case Some(sp) => StructType(Seq(StructField(sp.col, StringType, nullable = true)))
    case None => new StructType()
  }

  private def identValue(ident: InternalRow): String = partSpec.get.kind match {
    case "bucket" => ident.getInt(0).toString
    case _ => if (ident.isNullAt(0)) "\\N" else ident.getString(0)
  }

  /** Partition values of the CURRENT spec generation (tags stripped).
    * Partition DDL addresses the current spec; files under earlier specs
    * belong to retired partition universes (see [[requireUniformSpec]]). */
  private def partValues(): Seq[String] = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val curId = partSpec.map(_.id).getOrElse(1)
    (version match {
      case Some(v) => StoreSink.readVersionLines(root, fsys, v)
        .filterNot(_.startsWith("#")).map(StoreSink.parseEntry)
      case None => StoreSink.readEntries(root, fsys)
    }).flatMap(_.part).map(StoreSink.partTag)
      .filter(_._1 == curId).map(_._2).distinct.sorted
  }

  /** DROP/TRUNCATE PARTITION on a mid-evolution table would leave the same
    * logical partition's rows alive in old-spec files — refuse loudly until
    * a compacting rewrite unifies the generations. */
  private def requireUniformSpec(what: String): Unit = {
    val root = new Path(pathStr)
    val curId = partSpec.map(_.id).getOrElse(1)
    val foreign = StoreSink.readEntries(root, StoreSink.fs(root))
      .flatMap(_.part).map(StoreSink.partTag(_)._1).filter(_ != curId)
    require(foreign.isEmpty,
      s"cannot $what: table holds files under retired partition spec(s) " +
        s"${foreign.distinct.sorted.mkString(",")} — rewrite (overwrite/" +
        "replace) under the current spec first")
  }

  override def listPartitionIdentifiers(names: Array[String],
                                        ident: InternalRow): Array[InternalRow] =
    partSpec match {
      case None => Array.empty
      case Some(sp) =>
        val isBucket = sp.kind == "bucket"
        val vs = partValues()
        val wanted = if (names.isEmpty) vs else vs.filter(_ == identValue(ident))
        wanted.map(v => StoreSink.partKeyRow(v, isBucket)).toArray
    }

  override def partitionExists(ident: InternalRow): Boolean =
    partSpec.isDefined && partValues().contains(identValue(ident))

  override def dropPartition(ident: InternalRow): Boolean = {
    requireCurrent("drop partition")
    partSpec match {
      case None => false
      case Some(sp) =>
        requireUniformSpec("drop partition")
        val v = sp.tagged(identValue(ident))
        val root = new Path(pathStr)
        val fsys = StoreSink.fs(root)
        var dropped = false
        StoreSink.withCommitLock(root, fsys) {
          val lines = StoreSink.readManifestLines(root, fsys)
          val keep = lines.filter(l =>
            l.startsWith("#") || !StoreSink.parseEntry(l).part.contains(v))
          dropped = keep.size != lines.size
          if (dropped) StoreSink.writeManifestAtomic(root, fsys, keep)
        }
        dropped
    }
  }

  /** TRUNCATE ... PARTITION: value-derived partitions make "empty the
    * partition" and "drop the partition" the same metadata operation. */
  override def truncatePartition(ident: InternalRow): Boolean = {
    dropPartition(ident); true
  }

  override def createPartition(ident: InternalRow,
                               properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft-store partitions materialize on write; ADD PARTITION is not a store operation")

  // -------------------------- SupportsAtomicPartitionManagement (multi-DDL)
  /** `ALTER TABLE ... DROP PARTITION (grp='a'), (grp='b')`: ALL named
    * partitions leave in ONE manifest swap — all-or-nothing (any missing
    * partition ⇒ nothing dropped, `false` back to Spark's loud
    * NoSuchPartition path), never a prefix. The multi-partition retention
    * job this serves (expire 30 dates nightly) must not be observable
    * half-done: one swap = one version = one atomic visibility change. */
  override def dropPartitions(idents: Array[InternalRow]): Boolean = {
    requireCurrent("drop partitions")
    partSpec match {
      case None => false
      case Some(sp) =>
        requireUniformSpec("drop partitions")
        val vs = idents.map(i => sp.tagged(identValue(i))).toSet
        val root = new Path(pathStr)
        val fsys = StoreSink.fs(root)
        var dropped = false
        StoreSink.withCommitLock(root, fsys) {
          val lines = StoreSink.readManifestLines(root, fsys)
          val present = lines.filterNot(_.startsWith("#"))
            .flatMap(l => StoreSink.parseEntry(l).part).toSet
          if (vs.subsetOf(present)) {
            val keep = lines.filter(l => l.startsWith("#") ||
              !StoreSink.parseEntry(l).part.exists(vs.contains))
            StoreSink.writeManifestAtomic(root, fsys, keep)
            dropped = true
          }
        }
        dropped
    }
  }

  override def createPartitions(idents: Array[InternalRow],
                                properties: Array[util.Map[String, String]]): Unit =
    throw new UnsupportedOperationException(
      "graft-store partitions materialize on write; ADD PARTITION is not a store operation")

  override def replacePartitionMetadata(ident: InternalRow,
                                        properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft-store partitions carry no mutable metadata")

  /** Per-partition audit from the manifest: file and live-row counts. */
  override def loadPartitionMetadata(ident: InternalRow): util.Map[String, String] = {
    val v = partSpec.fold(identValue(ident))(_.tagged(identValue(ident)))
    val root = new Path(pathStr)
    val entries = StoreSink.readEntries(root, StoreSink.fs(root))
      .filter(_.part.contains(v))
    val m = new util.HashMap[String, String]()
    m.put("files", entries.size.toString)
    m.put("rows", entries.map(e => math.max(e.rows, 0L)).sum.toString)
    m
  }

  /** The table's declared layout: the persisted spec (or, before the first
    * commit fixes one, the write's requested transforms). Spark validates
    * INSERT partitioning against this and DESCRIBE shows it. */
  override def partitioning(): Array[Transform] = {
    val root = new Path(pathStr)
    StoreSink.readPartSpec(root, StoreSink.fs(root))
      .orElse(StoreSink.specOf(requested))
      .map(_.toTransform).toArray
  }

  /** `_file` METADATA COLUMN (SupportsMetadataColumns): provenance for
    * audits/debugging — `SELECT k, _file FROM graft.store` names the
    * committed data file each row came from, without the column existing
    * in the table schema (the Iceberg/Delta _file contract). The reader
    * materializes it only when the pruned schema asks. */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(StoreFileColumn, StorePosColumn)
  require(pathStr != null, "graft-store requires a path option")

  private def requireCurrent(op: String): Unit = {
    require(version.isEmpty,
      s"graft-store $op is not allowed on a pinned snapshot (VERSION AS OF " +
        s"${version.get}) — snapshots are read-only")
    require(branchView.isEmpty,
      s"graft-store $op is not allowed on a branch AUDIT view (VERSION AS " +
        s"OF '${branchView.get}') — stage more data with " +
        "option(\"branch\", ...), then publish or abandon")
  }

  /** Full row-level SQL (UPDATE / MERGE INTO, and DELETE whose predicate
    * SupportsDelete can't translate) via the GROUP-BASED (copy-on-write)
    * protocol: Spark rewrites the command into a ReplaceData plan — read the
    * affected groups through THIS operation's scan, compute their complete
    * replacement rows, write them through THIS operation's write — and the
    * connector's job is the commit: swap exactly the scanned group set for
    * the newly written files in one atomic manifest publish. The scan and
    * write are created from ONE operation instance, which is the channel
    * coordinating "what was read" with "what must be replaced" (the
    * Iceberg-style contract). This store's group set is the whole manifest
    * (no runtime group filtering yet), so row-level SQL is a table-granular
    * copy-on-write — correct first, file-granular later. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    requireCurrent("row-level operation")
    // MERGE-ON-READ twin (scoped conf, mirrors the delete-mode knob): the
    // SupportsDelta protocol executes the same statements as per-row
    // deltas — deleted/updated row ids become equality-delete sidecars,
    // inserts append — so a MERGE rewrites ZERO data files
    val mode = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.store.rowlevel.mode", "group")
    () =>
      if (mode == "delta") new StoreDeltaOperation(pathStr, info.command())
      else new StoreRowLevelOperation(pathStr, info.command())
  }

  // resolution-time schema binding: base + any ALTER-added trailing
  // columns — AT the pinned version for time travel (a REPLACE may have
  // changed the trailing set since; see StoreSink.readExtrasAt)
  private lazy val tblSchema: StructType = StoreSink.tableSchema(pathStr, version)

  /** Enforced CHECK constraints from the sidecar — Spark injects their
    * validation into every write plan against this table. */
  override def constraints(): Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    val root = new Path(pathStr)
    StoreSink.readConstraints(root, StoreSink.fs(root)).map { case (n, sql) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint.check(n)
        .predicateSql(sql).enforced(true)
        .validationStatus(
          org.apache.spark.sql.connector.catalog.constraints.Constraint
            .ValidationStatus.VALID)
        .build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray
  }

  override def name(): String =
    s"graft_store($pathStr${version.map(v => s"@v$v").getOrElse("")}" +
      s"${branchView.map(b => s"@branch=$b").getOrElse("")})"
  /** Under the scoped delta-mode conf the row-id column `k` is declared
    * NOT NULL (Iceberg identifier-field semantics — Spark refuses nullable
    * row ids, correctly: an equality mask cannot address a null key). The
    * conf is the opt-in; outside it the store stays fully nullable (the
    * null-round-trip spec relies on that). */
  override def schema(): StructType =
    if (org.apache.spark.sql.internal.SQLConf.get
          .getConfString("spark.graft.store.rowlevel.mode", "group") == "delta")
      StructType(tblSchema.fields.zipWithIndex.map {
        case (f, 0) => f.copy(nullable = false)
        case (f, _) => f
      })
    else tblSchema
  override def capabilities(): util.Set[TableCapability] = {
    val caps =
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
                    TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
                    TableCapability.MICRO_BATCH_READ,
                    TableCapability.OVERWRITE_DYNAMIC,
                    TableCapability.OVERWRITE_BY_FILTER)
    // mergeSchema writes carry columns the table does not know yet — the
    // analyzer's arity check must stand down; the write builder performs
    // the STRICTER validation itself (positional prefix + typed trailing
    // adds) in mergeWriteSchema, so this never weakens a plain write
    // (the capability is granted only when the option was passed)
    if (mergeCap) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StoreScanBuilder(pathStr, version,
      Option(options.get("files")).map(_.split(",").toSeq.filter(_.nonEmpty)),
      tblSchema, Option(options.get("branch")).orElse(branchView),
      Option(options.get("maxFilesPerTrigger")).map(_.toInt))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireCurrent("write")
    new StoreWriteBuilder(pathStr, info, requested, viaCatalog)
  }

  // ------------------------------------------------------- row-level DELETE
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(StoreSink.canEvaluate)

  /** Row-level DELETE with a per-file strategy choice: files with NO match
    * carry over by NAME (zero bytes); a file whose matched fraction of
    * live rows is ≤ [[StoreSink.MorMaxFraction]] takes MERGE-ON-READ — a
    * deletion-vector sidecar of line ordinals, zero data bytes rewritten
    * (the GDPR single-row shape); above the threshold the file rewrites
    * COPY-ON-WRITE to a filtered `-d<n>` sibling, absorbing any existing
    * vector. Either way ONE manifest swap publishes the new generation;
    * any failure before it leaves the previous generation bit-for-bit
    * intact (vectors staged for an aborted delete are unreferenced and
    * vacuum GCs them). */
  override def deleteWhere(filters: Array[Filter]): Unit = {
    requireCurrent("delete")
    require(filters.forall(StoreSink.canEvaluate),
      s"untranslatable delete predicate: ${filters.mkString(", ")}")
    // EQUALITY-delete mode (scoped conf): metadata-only keyed delete —
    // zone-matched files get a key sidecar, zero data files read or
    // written (the streaming-retraction / cold-table GDPR shape)
    val mode = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.store.delete.mode", "auto")
    if (mode == "equality") {
      StoreSink.equalityDelete(pathStr, filters)
      return
    }
    // OPTIMISTIC RETRY (the Iceberg commit model): the data rewrite runs
    // OUTSIDE the lock, so a concurrent rewrite of one of our input files
    // surfaces at publish as a conflict. Instead of failing the statement,
    // recompute the rewrite against the FRESH manifest and publish again —
    // bounded (3 attempts), then loud. Correct because deletionRewrite is
    // a pure function of (current manifest, predicate): re-running it
    // against the winner's state applies our delete on top of theirs.
    // Files staged by a losing attempt are unreferenced; vacuum/
    // remove_orphans GC them.
    var attempts = 0
    var done = false
    while (!done) {
      val (origLine, replacedLine, anyChange) =
        StoreTableDeleteBody.deletionRewrite(pathStr, filters)
      if (!anyChange) done = true
      else {
        StoreSink.onDeleteComputed()
        try {
          // replaced files stay for archived versions; vacuum is the GC
          StoreTableDeleteBody.publishDeletion(pathStr, origLine, replacedLine)
          done = true
        } catch {
          case e: java.util.ConcurrentModificationException =>
            attempts += 1
            if (attempts >= 3) throw e
        }
      }
    }
  }
}

private object StoreTableDeleteBody {
  import org.apache.hadoop.fs.Path

  /** Publish a deletion rewrite alone: rebase on the manifest AS PUBLISHED
    * at commit time (appends that landed meanwhile survive; a concurrent
    * rewrite of one of OUR files conflicts loudly — the LINE is the
    * witness, names survive merge-on-read). */
  def publishDeletion(pathStr: String, origLine: Map[String, String],
                      replacedLine: Map[String, String]): Unit = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    StoreSink.withCommitLock(root, fsys) {
      val fresh = StoreSink.readManifestLines(root, fsys)
      StoreSink.writeManifestAtomic(root, fsys,
        rebase(fresh, origLine, replacedLine))
    }
  }

  /** Rebase `fresh` manifest lines through a deletion rewrite; loud
    * conflict when a rewritten file's fresh line is not the one the
    * rewrite was computed against. CALLER HOLDS the commit lock. */
  def rebase(fresh: Seq[String], origLine: Map[String, String],
             replacedLine: Map[String, String]): Seq[String] = {
    val freshByName = fresh.filterNot(_.startsWith("#"))
      .map(l => StoreSink.parseEntry(l).name -> l).toMap
    val conflicted = replacedLine.keys.filter(n =>
      !freshByName.get(n).contains(origLine(n)))
    if (conflicted.nonEmpty) throw new java.util.ConcurrentModificationException(
      s"delete lost a write-write race on: ${conflicted.mkString(",")}")
    fresh.map { l =>
      if (l.startsWith("#")) l
      else replacedLine.getOrElse(StoreSink.parseEntry(l).name, l)
    }
  }

  /** The per-file delete transformation, shared by DELETE WHERE and the
    * REPLACE WHERE commit: for every manifest entry, compute its
    * replacement line under `filters` — carried over UNREAD when the zone
    * misses, masked merge-on-read when few rows die, rewritten
    * copy-on-write otherwise. Returns (name → line-we-based-on,
    * name → replacement, anything changed); PUBLISHING is the caller's
    * job (deleteWhere swaps alone; REPLACE WHERE swaps together with its
    * appended files — one atomic commit). */
  def deletionRewrite(pathStr: String, filters: Array[Filter])
      : (Map[String, String], Map[String, String], Boolean) = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val lines = StoreSink.readManifestLines(root, fsys)
    val entries = lines.filterNot(_.startsWith("#")).map(StoreSink.parseEntry)
    val preds = filters.map(StoreSink.compile)
    def deletes(row: InternalRow): Boolean =
      preds.forall(_(row).contains(true))
    // zone-map short circuit: a conjunct k-bound the file's zone misses
    // means NO row can satisfy the whole predicate — carry over UNREAD
    val (kLo, kHi) = StoreSink.kBounds(filters)
    // COW replacements are written under the table's CURRENT encoding,
    // INCLUDING dictionary blocks and the full group-stat slot set —
    // maintenance must not silently degrade the layout (review catch)
    val colEnc = StoreSink.columnarAt(pathStr)
    val zipEnc = StoreSink.compressAt(pathStr)
    val grpRows = StoreSink.groupRowsAt(pathStr)
    val (cowDictSlots, cowStatSlots, cowRleSlots)
        : (Set[Int], Seq[Int], Set[Int]) =
      if (!colEnc) (Set.empty, Seq(0), Set.empty)
      else {
        val layout = StoreSink.layoutAt(pathStr, None)
        val dicts =
          if (!StoreSink.dictAt(pathStr)) Set.empty[Int]
          else layout.physTypes.indices
            .filter(i => layout.physTypes(i) == StringType).toSet
        // RLE follows the same COW re-derivation discipline as dict and
        // stats: a rewrite must not silently degrade the at-rest layout
        // (dict slots join the set for the `e` ordinal-RLE composition)
        val rles =
          if (!StoreSink.rleAt(pathStr)) Set.empty[Int]
          else layout.physTypes.indices
            .filter(i => layout.physTypes(i) == LongType ||
              layout.physTypes(i) == IntegerType).toSet ++ dicts
        val declared = StoreSink.declaredStatCols(root, fsys,
            StoreSink.tableSchema(pathStr))
          .map { case (_, li) => layout.proj(li) }.filter(_ >= 0)
        val amt =
          if (layout.physTypes.length > 2 && layout.physTypes(2) == LongType)
            Seq(2)
          else Nil
        (dicts, (Seq(0) ++ amt ++ declared).distinct, rles)
      }
    var processed = 0
    val gen = System.nanoTime().toHexString
    var anyChange = false
    val newLines = entries.map { e =>
      if (!e.mayContain(kLo, kHi)) e.line
      else {
        val existingDv: Set[Int] =
          e.dv.map(d => StoreSink.readDv(root, fsys, d).toSet).getOrElse(Set.empty)
        // rows already equality-deleted are DEAD: excluded from live
        // counts and from any COW rewrite (which thereby absorbs the eq
        // sidecar); under a merge-on-read outcome the entry keeps its eq
        // field, so the reader's key mask still applies
        val existingEq: Array[Long] =
          e.eq.map(q => StoreSink.readEq(root, fsys, q).sorted)
            .getOrElse(Array.emptyLongArray)
        val p = new Path(root, e.name)
        // encoding-agnostic row view (the rewrite reads every column);
        // the replacement file is written under the table's CURRENT
        // encoding, so a COW pass doubles as format migration
        val (dataLines, closer) = StoreSink.openDataLines(fsys, p)
        var nMin = Long.MaxValue; var nMax = Long.MinValue; var nRows = 0L
        var nBloom = 0L
        var nMinA = Long.MaxValue; var nMaxA = Long.MinValue
        val newDel = Seq.newBuilder[Int]; var nDel = 0
        val kept =
          try {
            val keep = Seq.newBuilder[String]
            var ord = 0
            while (dataLines.hasNext) {
              val line = dataLines.next()
              if (!existingDv.contains(ord)) { // already-deleted rows are gone
                val row = StoreSink.decode(line)
                val eqDead = existingEq.nonEmpty && !row.isNullAt(0) &&
                  java.util.Arrays.binarySearch(existingEq, row.getLong(0)) >= 0
                if (eqDead) () // masked by the equality sidecar: not live
                else if (deletes(row)) { newDel += ord; nDel += 1 }
                else {
                  keep += line
                  nRows += 1
                  if (!row.isNullAt(0)) {
                    val k = row.getLong(0)
                    if (k < nMin) nMin = k
                    if (k > nMax) nMax = k
                  }
                  if (!row.isNullAt(1))
                    nBloom |= StoreSink.grpSig(row.getUTF8String(1).toString)
                  if (!row.isNullAt(2)) { // second zone column survives COW
                    val a = row.getLong(2)
                    if (a < nMinA) nMinA = a
                    if (a > nMaxA) nMaxA = a
                  }
                }
              }
              ord += 1
            }
            keep.result()
          } finally closer()
        processed += 1
        if (StoreSink.failDeleteAfterOneFile && processed == 1)
          throw new RuntimeException("injected delete failure (test hook)")
        if (nDel == 0) e.line // untouched file carries over by name
        else if (nDel.toDouble / math.max(1L, nDel.toLong + nRows) <=
                   StoreSink.MorMaxFraction) {
          // merge-on-read: one small sidecar, zero data bytes; zones/bloom
          // stay conservative (pruning-safe, and MIN/MAX agg pushdown
          // declines on vectored entries)
          anyChange = true
          val dvName = s"${e.name}.dv-$gen"
          StoreSink.writeDv(root, fsys, dvName,
            existingDv.toSeq ++ newDel.result())
          e.copy(rows = nRows, dv = Some(dvName)).line
        } else {
          // copy-on-write: the rewrite skipped existing-vector ordinals, so
          // the new file is CLEAN — the vector is absorbed
          anyChange = true
          val nf = s"${e.name}-d$gen"
          val nBytes =
            StoreSink.writeDataFile(fsys, new Path(root, nf), kept, colEnc,
              zipEnc, grpRows, cowDictSlots, cowStatSlots, cowRleSlots)
          StoreSink.StoreFileEntry(nf, nRows,
            if (nMin == Long.MaxValue) None else Some(nMin),
            if (nMax == Long.MinValue) None else Some(nMax),
            Some(nBloom), Some(nBytes), None, e.part, None,
            if (nMinA == Long.MaxValue) None else Some(nMinA),
            if (nMaxA == Long.MinValue) None else Some(nMaxA)).line
        }
      }
    }
    // map oldName -> (line we based on, replacement) so the publish can
    // rebase on the manifest as it stands at COMMIT time (the data rewrite
    // above ran outside the lock — appends that landed meanwhile must
    // survive, and a concurrent rewrite of one of OUR files must conflict
    // loudly: for merge-on-read the name is unchanged, so the LINE is the
    // conflict witness, not the name)
    val origLine: Map[String, String] = entries.map(e => e.name -> e.line).toMap
    val replacedLine: Map[String, String] = entries.map(_.name).zip(newLines)
      .filter { case (n, l) => l != origLine(n) }.toMap
    (origLine, replacedLine, anyChange)
  }
}

// ------------------------------------------------------- row-level protocol

/** One UPDATE/MERGE/DELETE execution. The scan RECORDS the files it planned
  * (the replaced group set); the write's commit publishes
  * `(manifest − scanned) + new files` atomically. A concurrent append
  * between scan and commit is preserved — only the scanned generation is
  * replaced. */
private class StoreRowLevelOperation(pathStr: String, cmd: Command)
    extends RowLevelOperation {

  @volatile private var scanned: Seq[String] = Nil

  override def command(): Command = cmd
  override def description(): String = s"graft-store $cmd (copy-on-write)"

  /** The op's scan inherits SupportsRuntimeFiltering, so Spark's runtime
    * GROUP FILTER (the matched-keys In-subquery the rewrite rule plans)
    * narrows the planned — and therefore REPLACED — file set through the
    * zone maps: a CDC batch touching one file's key range rewrites ONE
    * file, not the table (file-granular copy-on-write; spec-pinned). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val tbl = StoreSink.tableSchema(pathStr)
    () => new StoreScan(pathStr, required = tbl, table = tbl) {
      override def planInputPartitions(): Array[InputPartition] = {
        val parts = super.planInputPartitions()
        // idempotent across re-planning: always the files of THIS plan —
        // the execution-time call runs after the runtime filter arrives.
        // Names are manifest-relative (partition dir INCLUDED — a bare
        // getName would miss the replaced file under `grp=F/`).
        scanned = parts.map(_.asInstanceOf[StoreFilePartition].rel).toSeq
        parts
      }
      // TRAP: a row-level op's runtime GROUP FILTER is built over ALL
      // advertised filter attributes AT ONCE — with (k, grp) advertised,
      // Spark emits a named_struct(k, grp) IN <subquery> no source filter
      // can translate, the filter silently drops, and the op rewrites
      // EVERY file (caught by the file-granular COW specs). The group
      // filter key here is the zone column alone.
      override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions.column("k"))
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new StoreGroupReplaceWrite(pathStr, info.queryId(), () => scanned,
            info.schema())
      }
    }
}

/** Commit half of the group-based rewrite: replace exactly the scanned
  * files with the acknowledged new ones in one manifest swap; GC the
  * replaced generation after. Epoch markers (the streaming ledger) are
  * carried over — row-level rewrites do not re-open epochs. */
private class StoreGroupReplaceWrite(pathStr: String, queryId: String,
                                     replaced: () => Seq[String],
                                     dataSchema: StructType = StoreSink.schema)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val root = new Path(pathStr)
    StoreWriterFactory(pathStr, queryId, dataSchema,
      StoreSink.readPartSpec(root, StoreSink.fs(root)))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val staging = new Path(root, StoreSink.Staging)
    val committed = messages.map(_.asInstanceOf[StoreCommitMessage])
      .flatMap(_.files).toSeq
    require(committed.map(_.staged).distinct.size == committed.size,
      s"duplicate commit messages: ${committed.map(_.staged)}")
    StoreSink.withCommitLock(root, fsys) {
      StoreSink.promote(root, fsys, staging, committed)
      val gone = replaced().toSet
      val lines = StoreSink.readManifestLines(root, fsys)
      // our replacement rows were computed FROM the scanned group set; if a
      // concurrent commit already replaced one of those files, publishing
      // ours would resurrect/duplicate rows — loud conflict instead
      val freshNames = lines.filterNot(_.startsWith("#"))
        .map(StoreSink.parseEntry(_).name).toSet
      val missing = gone.diff(freshNames)
      if (missing.nonEmpty) throw new java.util.ConcurrentModificationException(
        s"row-level operation lost a write-write race on: ${missing.mkString(",")}")
      val visible = lines.filterNot(l =>
        !l.startsWith("#") && gone.contains(StoreSink.parseEntry(l).name)) ++
        committed.map(_.entry.line)
      StoreSink.writeManifestAtomic(root, fsys, visible)
      // the replaced group set stays on disk for archived versions (vacuum GCs)
      StoreSink.cleanStaging(root, fsys, queryId, underLock = true)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    StoreSink.cleanStaging(root, StoreSink.fs(root), queryId)
  }
}

/** MERGE-ON-READ row-level operations via the [[SupportsDelta]] protocol
  * (the Iceberg v2 delta-write path): instead of rewriting every scanned
  * group, Spark hands this writer PER-ROW verbs — delete(id), update(id,
  * row), insert(row) — keyed by the declared row identity (`k`, the
  * store's MERGE convention). Deleted/updated ids become EQUALITY-DELETE
  * sidecars on the zone-matched pre-existing entries (zero data bytes,
  * the .eq- machinery q_store_delete_eq pinned); updated/inserted rows
  * append as ordinary new files. A CDC MERGE therefore rewrites NOTHING:
  * cost = changed rows + metadata, vs group COW's changed FILES — the
  * difference between a 1 GB and a 1 TB commit on a wide-zoned 100 TB
  * table. COUNT/MIN/MAX pushdown declines on masked entries (rows become
  * an upper bound) until compaction absorbs the sidecars. */
private class StoreDeltaOperation(pathStr: String, cmd: Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): Command = cmd
  override def description(): String = s"graft-store $cmd (merge-on-read delta)"

  /** Row identity = the key column: the house MERGE contract (ON t.k =
    * s.k), and what the equality-delete sidecar masks by. Declaring it IS
    * the Iceberg identifier-field assertion that k uniquely identifies a
    * row: an equality mask kills EVERY row carrying the key, so on a
    * duplicate-key table a partially-matching row-level op (e.g. MERGE ON
    * t.k = s.k AND t.grp = 'x') would over-delete the non-matching
    * duplicates — exactly why the protocol takes a rowId declaration
    * instead of masking arbitrary predicates. Group mode (the default)
    * has no such requirement. */
  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("k"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val tbl = StoreSink.tableSchema(pathStr)
    () => new StoreScan(pathStr, required = tbl, table = tbl) {
      // same struct-IN trap as the group-based op: advertise the row-id
      // zone column alone so the runtime group filter stays translatable
      override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions.column("k"))
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new StoreDeltaBatchWrite(pathStr, info.queryId(),
            StoreSink.tableSchema(pathStr))
      }
    }
}

/** Task payload of a delta write: staged insert files + the row ids this
  * task deleted or updated. */
private case class StoreDeltaCommitMessage(files: Seq[StoreFilePayload],
                                           deletedKeys: Array[Long])
    extends WriterCommitMessage

private case class StoreDeltaWriterFactory(pathStr: String, queryId: String,
                                           dataSchema: StructType,
                                           spec: Option[StoreSink.PartSpec])
    extends DeltaWriterFactory {
  private val slots: Array[Int] = StoreSink.writeSlots(pathStr, dataSchema)
  private val columnar: Boolean = StoreSink.columnarAt(pathStr)
  // the table's compression/grouping properties apply to delta-mode
  // inserts too (they were silently dropped here — files stayed correct,
  // self-identifying, but uncompressed single-group; advice catch)
  private val compress: Boolean = StoreSink.compressAt(pathStr)
  private val groupRows: Int = StoreSink.groupRowsAt(pathStr)
  private val dictEnc: Boolean = StoreSink.dictAt(pathStr)
  private val rleEnc: Boolean = StoreSink.rleAt(pathStr)
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new StoreDeltaWriter(pathStr, s"part-$queryId-$partitionId-$taskId",
      dataSchema, spec, slots, columnar, compress, groupRows, dictEnc,
      rleEnc)
}

/** Per-task delta writer: inserts ride the ordinary staged-file writer;
  * delete/update additionally record the row id for the commit's equality
  * masks. An update is delete + insert by construction (the old row is
  * masked, the new row appends) — exactly merge-on-read semantics. */
private class StoreDeltaWriter(pathStr: String, fileName: String,
                               dataSchema: StructType,
                               spec: Option[StoreSink.PartSpec],
                               slots: Array[Int] = null,
                               columnar: Boolean = false,
                               compress: Boolean = false,
                               groupRows: Int = 1 << 20,
                               dictEnc: Boolean = false,
                               rleEnc: Boolean = false)
    extends DeltaWriter[InternalRow] {

  private val inserts =
    new StoreDataWriter(pathStr, fileName, dataSchema, spec, slots,
      columnar = columnar, compress = compress, groupRows = groupRows,
      dictEnc = dictEnc, rleEnc = rleEnc)
  private val deleted = scala.collection.mutable.ArrayBuffer.empty[Long]

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    if (!id.isNullAt(0)) deleted += id.getLong(0)

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def insert(row: InternalRow): Unit = inserts.write(row)

  override def commit(): WriterCommitMessage = {
    val m = inserts.commit().asInstanceOf[StoreCommitMessage]
    StoreDeltaCommitMessage(m.files, deleted.toArray)
  }

  override def abort(): Unit = inserts.abort()
  override def close(): Unit = inserts.close()
}

/** Commit half of the delta write: ONE locked manifest swap that (a)
  * attaches the deleted row ids as equality sidecars to the zone-matched
  * PRE-EXISTING entries only — the same fresh-lines semantics as the
  * metadata equality delete, so concurrent same-key rows are superseded
  * under the lock's serialization — and (b) appends the staged insert
  * files afterwards, so re-inserted (updated) keys in the NEW files are
  * never masked by their own commit. Zero data files read or written. */
private class StoreDeltaBatchWrite(pathStr: String, queryId: String,
                                   dataSchema: StructType)
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val root = new Path(pathStr)
    StoreDeltaWriterFactory(pathStr, queryId, dataSchema,
      StoreSink.readPartSpec(root, StoreSink.fs(root)))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val staging = new Path(root, StoreSink.Staging)
    val ms = messages.map(_.asInstanceOf[StoreDeltaCommitMessage])
    val committed = ms.flatMap(_.files).toSeq
    require(committed.map(_.staged).distinct.size == committed.size,
      s"duplicate commit messages: ${committed.map(_.staged)}")
    val keys = ms.flatMap(_.deletedKeys).distinct.sorted
    val gen = System.nanoTime().toHexString
    StoreSink.withCommitLock(root, fsys) {
      StoreSink.promote(root, fsys, staging, committed)
      val lines = StoreSink.readManifestLines(root, fsys)
      val masked = lines.map { l =>
        if (l.startsWith("#")) l
        else {
          val e = StoreSink.parseEntry(l)
          val mine = keys.filter(k => e.mayContain(Some(k), Some(k)))
          if (mine.isEmpty) l
          else {
            val prev = e.eq.map(q => StoreSink.readEq(root, fsys, q).toSeq)
              .getOrElse(Nil)
            val eqName = s"${e.name}.eq-$gen"
            StoreSink.writeEq(root, fsys, eqName, prev ++ mine)
            e.copy(eq = Some(eqName)).line
          }
        }
      }
      // a MERGE that matched nothing commits nothing: no empty versions
      if (masked != lines || committed.nonEmpty)
        StoreSink.writeManifestAtomic(root, fsys,
          masked ++ committed.map(_.entry.line))
      StoreSink.cleanStaging(root, fsys, queryId, underLock = true)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    StoreSink.cleanStaging(root, StoreSink.fs(root), queryId)
  }
}

// ---------------------------------------------------------------- write path

private class StoreWriteBuilder(pathStr: String, info: LogicalWriteInfo,
                                requested: Array[Transform] = Array.empty,
                                viaCatalog: Boolean = false)
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {

  private var doTruncate = false
  private var doDynamic = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  /** Full overwrite (AlwaysTrue → truncate) or PREDICATE overwrite
    * (`INSERT INTO ... REPLACE WHERE cond SELECT ...` — the Delta
    * replaceWhere shape): delete-matching + append-new as ONE atomic
    * commit (see StoreBatchWrite). Only predicates the store can evaluate
    * row-wise are accepted — Spark falls back loudly otherwise. */
  private var replaceWhere: Option[Array[Filter]] = None

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[AlwaysTrue])) { doTruncate = true; this }
    else {
      require(filters.forall(StoreSink.canEvaluate),
        s"untranslatable REPLACE WHERE predicate: ${filters.mkString(",")}")
      replaceWhere = Some(filters); this
    }
  }

  /** DYNAMIC PARTITION OVERWRITE (`INSERT OVERWRITE` under
    * `spark.sql.sources.partitionOverwriteMode=dynamic`, or
    * `DataFrameWriterV2.overwritePartitions()`): replace exactly the
    * partitions the incoming rows land in, keep every other partition's
    * files UNTOUCHED BY NAME — the daily-reload primitive (re-load two
    * dates of a 5-year table without rewriting, or even listing, the other
    * 1823). On an unpartitioned store there is no partition to scope the
    * replacement, so it degrades to a full overwrite (the Hive/Iceberg
    * semantic). The commit is the same one-manifest swap as every other
    * shape; cost is new-partition bytes + metadata, never table size. */
  override def overwriteDynamicPartitions(): WriteBuilder = { doDynamic = true; this }

  /** EFFECTIVE partition spec, resolved once on the driver at build time:
    * the write's requested transforms (CTAS PARTITIONED BY / partitionBy /
    * a `partitionedBy` option) if any, else the persisted sidecar. A
    * request that CONTRADICTS the sidecar is refused unless the write is a
    * full overwrite — the spec is table metadata, not a per-write choice. */
  private def resolveSpec(): Option[StoreSink.PartSpec] = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val persisted = StoreSink.readPartSpec(root, fsys)
    val req = StoreSink.specOf(requested)
      .orElse(Option(info.options().get("partitionedBy"))
        .map(StoreSink.parsePartSpec))
    require(req.isEmpty || persisted.isEmpty ||
        req.map(_.line) == persisted.map(_.line) || doTruncate,
      s"graft-store partitioning mismatch: table is " +
        s"${persisted.map(_.line).getOrElse("unpartitioned")}, write requested " +
        s"${req.map(_.line).getOrElse("unpartitioned")} (full overwrite may re-partition)")
    req match {
      case Some(r) if persisted.exists(_.line == r.line) =>
        persisted // same spec: keep its registered id
      case Some(r) =>
        // a NEW spec on a table with registry history gets the next id —
        // assigned here at build, validated at commit under the lock
        val specs = StoreSink.readPartSpecs(root, fsys)
        if (specs.isEmpty) Some(r)
        else Some(r.copy(id = (1 +: specs.map(_._1)).max + 1))
      case None => persisted
    }
  }

  /** REQUIRED WRITE DISTRIBUTION + ORDERING
    * ([[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]]):
    * a partitioned store asks Spark to CLUSTER incoming rows by the
    * partition transform (and, for buckets, to plan exactly n write
    * tasks) and to SORT each task by the key. Without this, every task
    * writes one file per partition value it happens to see — at 1000
    * executors a bucket(256) table gets 256,000 files per commit; with
    * it, each bucket lands whole in one task → one file per bucket per
    * commit, key-sorted so its zone map is tight. This is the connector
    * telling the PLANNER the layout contract instead of hoping the user
    * repartitioned (the Iceberg write-distribution-mode story). */
  override def build(): Write = {
    val spec = resolveSpec()
    new Write with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
      // a bucket transform in a distribution resolves through the table's
      // FUNCTION CATALOG; a path-based write has none (Spark: "bucket(n, k)
      // is not currently supported"), so the bucket clustering is requested
      // only for catalog-resolved writes — the path API keeps working, its
      // layout guaranteed by the writer's per-value routing instead of the
      // planner. Identity clustering is a plain column reference and
      // resolves everywhere.
      private def distributable: Option[StoreSink.PartSpec] =
        spec.filter(sp => sp.kind == "identity" || viaCatalog)
      // ORDERED (range) write distribution (`option("orderedBy", col)`):
      // an identity-partitioned write that wants its files to hold
      // CONTIGUOUS BANDS of a second column — e.g. impact-ordered posting
      // lists — asks for a GLOBAL sort on (partition value, col) instead
      // of value clustering: Spark range-partitions the input, each task
      // holds one (value, band) slice, and the per-file zone stats of
      // `col` become tight disjoint ranges a top-k probe can prune on.
      // File count = write tasks (`option("writeTasks", n)`), not values
      // × tasks.
      private def orderedBy: Option[String] =
        Option(info.options().get("orderedBy")).filter(_ => spec.isDefined)
      private def sortAsc(c: String) =
        org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)
      override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
        (orderedBy, distributable) match {
          case (Some(oc), _) =>
            org.apache.spark.sql.connector.distributions.Distributions.ordered(
              Array(sortAsc(spec.get.col), sortAsc(oc)))
          case (None, Some(sp)) =>
            org.apache.spark.sql.connector.distributions.Distributions.clustered(
              Array(sp.toTransform))
          case _ =>
            org.apache.spark.sql.connector.distributions.Distributions.unspecified()
        }
      // bucket(n): exactly n write tasks = one committed file per bucket
      override def requiredNumPartitions(): Int =
        orderedBy.flatMap(_ =>
            Option(info.options().get("writeTasks")).map(_.toInt))
          .getOrElse(distributable.filter(_.kind == "bucket").map(_.n).getOrElse(0))
      override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
        orderedBy match {
          case Some(oc) => Array(sortAsc(spec.get.col), sortAsc(oc))
          case None if spec.isDefined =>
            Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
              org.apache.spark.sql.connector.expressions.Expressions.column("k"),
              org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
          case None => Array.empty
        }
      override def toBatch: BatchWrite = {
        // SCHEMA MERGE ON WRITE: register any new trailing columns BEFORE
        // the writer factory resolves the layout (it reads the sidecar at
        // factory construction, after this point). Plain append/truncate
        // only — branch (publish-time visibility), replaceWhere and
        // dynamic overwrite each interleave schema state with data state
        // in ways a silent merge would make ambiguous; loud over subtle.
        if (info.options().getBoolean("mergeSchema", false)) {
          require(info.options().get("branch") == null &&
              replaceWhere.isEmpty && !doDynamic,
            "mergeSchema composes with plain append/truncate writes only")
          StoreSink.mergeWriteSchema(pathStr, info.schema())
        }
        new StoreBatchWrite(pathStr, info.queryId(),
          // dynamic overwrite of an UNPARTITIONED store degrades to a
          // full overwrite — no partition exists to scope the replacement
          doTruncate || (doDynamic && spec.isEmpty),
          info.options().getBoolean("preserveMarkers", false), info.schema(),
          Option(info.options().get("replace"))
            .map(_.split(",").filter(_.nonEmpty).toSet), spec,
          Option(info.options().get("branch")),
          dynamic = doDynamic && spec.isDefined,
          replaceWhere = replaceWhere,
          orderedByCol = orderedBy)
      }
      override def toStreaming: StreamingWrite = {
        require(!doTruncate && !doDynamic && replaceWhere.isEmpty,
          "graft-store streaming write is append-only (no Complete-mode truncate)")
        require(info.options().get("branch") == null,
          "graft-store branch writes are batch appends (WAP); streaming targets main")
        // mergeSchema is batch-only: the option's ACCEPT_ANY_SCHEMA grant
        // reaches STREAMING table resolution too (writeStream options flow
        // into getTable), so without this refusal a wider streaming frame
        // would slip past the analyzer and emit raw-width rows under a
        // narrower persisted layout — silent corruption far from its
        // cause. Evolve the table with a batch merge (or ALTER) first.
        require(!info.options().getBoolean("mergeSchema", false),
          "mergeSchema is a batch-write option; streaming writes must " +
            "match the table schema (ALTER or a batch mergeSchema write " +
            "evolves it first)")
        new StoreStreamingWrite(pathStr, info.queryId(), info.schema(), spec)
      }
    }
  }
}

private class StoreBatchWrite(pathStr: String, queryId: String, truncate: Boolean,
                              preserveMarkers: Boolean = false,
                              dataSchema: StructType = StoreSink.schema,
                              replaceFiles: Option[Set[String]] = None,
                              spec: Option[StoreSink.PartSpec] = None,
                              branch: Option[String] = None,
                              dynamic: Boolean = false,
                              replaceWhere: Option[Array[Filter]] = None,
                              orderedByCol: Option[String] = None)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    StoreWriterFactory(pathStr, queryId, dataSchema, spec) // standalone class: serializable task closure

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val committed = messages.map(_.asInstanceOf[StoreCommitMessage])
      .flatMap(_.files).toSeq
    // promote exactly the acknowledged files; duplicates would mean the
    // commit coordinator failed us — refuse rather than double-count
    require(committed.map(_.staged).distinct.size == committed.size,
      s"duplicate commit messages: ${committed.map(_.staged)}")
    // WAP: a branch-targeted append commits its entries to the branch
    // manifest — the promoted files stay invisible to main until publish
    branch.foreach { b =>
      require(!truncate && !dynamic && replaceFiles.isEmpty,
        "graft-store branch writes are append-only (write-audit-publish)")
      // orderedBy must not compose with a branch write: this commit path
      // returns before the OrderedByProp write below, so the k-ASC file-
      // ordering claim (SupportsReportOrdering) would never be withdrawn
      // and a merge join could drop Sorts over files sorted by the
      // orderedBy column instead — wrong results (advice catch; same
      // refusal discipline as truncate/dynamic above)
      require(orderedByCol.isEmpty,
        "orderedBy does not compose with branch (WAP) writes")
      StoreSink.withCommitLock(root, fsys) {
        val staging = new Path(root, StoreSink.Staging)
        StoreSink.promote(root, fsys, staging, committed)
        // a branch-first partitioned write still fixes the TABLE's spec:
        // publish must not surface partition-valued entries into a store
        // whose sidecar says "unpartitioned"
        spec.foreach { sp =>
          if (StoreSink.readPartSpec(root, fsys).isEmpty)
            StoreSink.persistResolvedSpec(root, fsys, sp)
        }
        StoreSink.writeBranchAtomic(root, fsys, b,
          StoreSink.readBranchLines(root, fsys, b) ++ committed.map(_.entry.line))
        // writer sketches stash beside the branch (folded at publish,
        // dropped at abandon) — never into the table NDV early
        StoreSink.stashBranchNdv(root, fsys, b,
          messages.map(_.asInstanceOf[StoreCommitMessage]).flatMap(_.ndv).toSeq)
        StoreSink.cleanStaging(root, fsys, queryId, underLock = true)
      }
      return
    }
    // PREDICATE OVERWRITE (REPLACE WHERE): run the shared deletion rewrite
    // OUTSIDE the lock (it reads/rewrites matching data files — the
    // deleteWhere cost model), then publish delete + append as ONE swap:
    // a reader sees the old state or the fully-replaced one, never the
    // deleted-but-not-yet-inserted middle.
    replaceWhere.foreach { filters =>
      require(!truncate && !dynamic && replaceFiles.isEmpty,
        "REPLACE WHERE does not compose with truncate/dynamic/compaction commits")
      // same ordering-claim hazard as the branch path: this commit
      // returns before the OrderedByProp write (advice catch)
      require(orderedByCol.isEmpty,
        "orderedBy does not compose with REPLACE WHERE commits")
      val (origLine, replacedLine, _) =
        StoreTableDeleteBody.deletionRewrite(pathStr, filters)
      StoreSink.withCommitLock(root, fsys) {
        val staging = new Path(root, StoreSink.Staging)
        StoreSink.promote(root, fsys, staging, committed)
        val fresh = StoreSink.readManifestLines(root, fsys)
        val visible = StoreTableDeleteBody.rebase(fresh, origLine, replacedLine) ++
          committed.map(_.entry.line)
        StoreSink.writeManifestAtomic(root, fsys, visible)
        StoreSink.cleanStaging(root, fsys, queryId, underLock = true)
      }
      // appended rows still feed NDV (deletes never subtract — upper bound)
      StoreSink.mergeNdv(root, fsys,
        messages.map(_.asInstanceOf[StoreCommitMessage]).flatMap(_.ndv).toSeq,
        reset = false)
      return
    }
    val ndvIncoming =
      messages.map(_.asInstanceOf[StoreCommitMessage]).flatMap(_.ndv).toSeq
    var ndvResetDone = false // set under the lock, read by the post-lock fold
    StoreSink.withCommitLock(root, fsys) {
      val staging = new Path(root, StoreSink.Staging)
      StoreSink.promote(root, fsys, staging, committed)
      // a first/overwrite commit fixes the table's partition spec; appends
      // resolved their spec against the sidecar at build time. A truncate
      // that RE-partitions an evolved table registers a new spec id — ids
      // are append-only, so archived generations keep resolving theirs.
      spec.foreach { sp =>
        if (truncate || StoreSink.readPartSpec(root, fsys).isEmpty)
          StoreSink.persistResolvedSpec(root, fsys, sp)
      }
      // an orderedBy write permanently withdraws the k-sorted-file claim
      // (SupportsReportOrdering) — recorded once, under this lock
      orderedByCol.foreach { oc =>
        val ps = StoreSink.readProps(root, fsys).toMap
        if (!ps.contains(StoreSink.OrderedByProp))
          StoreSink.writeProps(root, fsys,
            (ps + (StoreSink.OrderedByProp -> oc)).toSeq)
      }
      val fresh = StoreSink.readManifestLines(root, fsys)
      // three commit shapes, each rebased on the manifest AS PUBLISHED by
      // whatever committed before us (the lock serializes):
      //  - replaceFiles (compaction): swap exactly the files this job READ
      //    for the new layout — a concurrent append lands untouched, and a
      //    concurrent rewrite of one of our inputs is a loud conflict
      //  - truncate: a new generation (epoch ledger dies, EXCEPT under
      //    preserveMarkers — maintenance is not a logical truncate)
      //  - append: union
      val visible = replaceFiles match {
        case Some(replace) =>
          val freshNames = fresh.filterNot(_.startsWith("#"))
            .map(StoreSink.parseEntry(_).name).toSet
          val missing = replace.diff(freshNames)
          if (missing.nonEmpty) throw new java.util.ConcurrentModificationException(
            s"files replaced by a concurrent commit: ${missing.mkString(",")} " +
              "— re-run the compaction against the current snapshot")
          // FULL rewrite (whole-table compaction / absorb): the commit's
          // writer sketches describe EVERY live row — re-baseline the NDV
          // from them instead of unioning (round-12 verdict #8: deletes
          // stop being a permanent upper bound the first time maintenance
          // rewrites the table, no manual ANALYZE needed). Marker (`#`)
          // lines are not entries and must carry over regardless.
          ndvResetDone = fresh
            .filter(l => !l.startsWith("#") &&
              !replace.contains(StoreSink.parseEntry(l).name))
            .forall(l => StoreSink.parseEntry(l).rows == 0)
          fresh.filterNot(l => !l.startsWith("#") &&
            replace.contains(StoreSink.parseEntry(l).name)) ++
            committed.map(_.entry.line)
        case None if dynamic =>
          // DYNAMIC PARTITION OVERWRITE: drop the manifest entries of
          // exactly the partitions the new files land in (their deletion
          // masks die with them); every other partition — and any
          // pre-partitioning legacy entry — carries over BY LINE. An
          // empty input touches no partition and commits nothing (the
          // no-op guard below).
          val touched = committed.flatMap(_.entry.part).toSet
          // replacing "the partitions the new files land in" is only sound
          // when every live file speaks the same partition language: a
          // retired-spec file may HOLD rows of a touched partition without
          // carrying its tag — refuse until a rewrite unifies generations
          val curId = spec.map(_.id).getOrElse(1)
          val foreign = fresh.filterNot(_.startsWith("#"))
            .flatMap(StoreSink.parseEntry(_).part)
            .map(StoreSink.partTag(_)._1).filter(_ != curId)
          if (foreign.nonEmpty) throw new UnsupportedOperationException(
            "dynamic partition overwrite over mixed partition-spec " +
              s"generations (retired spec(s) ${foreign.distinct.sorted.mkString(",")}" +
              ") — rewrite under the current spec first")
          fresh.filter(l => l.startsWith("#") ||
            !StoreSink.parseEntry(l).part.exists(touched.contains)) ++
            committed.map(_.entry.line)
        case None if truncate =>
          (if (preserveMarkers) fresh.filter(_.startsWith("#")) else Nil) ++
            committed.map(_.entry.line)
        case None => fresh ++ committed.map(_.entry.line)
      }
      if (dynamic && committed.isEmpty) {
        // `INSERT OVERWRITE ... WHERE false` replaces nothing — commit no
        // empty generation (the no-match delta-MERGE precedent)
        StoreSink.cleanStaging(root, fsys, queryId, underLock = true)
        return
      }
      StoreSink.writeManifestAtomic(root, fsys, visible)
      // RESET-merge (logical truncate, or a FULL replace-set rewrite whose
      // written rows ARE the live rows) re-baselines the NDV INSIDE this
      // critical section: run after the lock, a concurrent append that
      // committed and merged its sketches in between would have them
      // wiped by the reset, leaving the NDV an UNDER-estimate of live
      // rows — violating the deletes-are-only-an-upper-bound contract
      // broadcast decisions rely on (advice catch). Plain unions stay
      // outside: HLL union is idempotent and order-free.
      if (truncate && !preserveMarkers) ndvResetDone = true
      if (ndvResetDone)
        StoreSink.mergeNdvUnlocked(root, fsys, ndvIncoming, reset = true)
      // replaced generations are NOT deleted here: their files stay
      // referenced by archived version manifests (time travel) until an
      // explicit StoreSink.vacuum expires them
      StoreSink.cleanStaging(root, fsys, queryId, underLock = true)
    }
    // incremental NDV: union this commit's writer sketches into the
    // stored ones (no-op until ANALYZE establishes tracking); the reset
    // shapes already folded under the lock above
    if (!ndvResetDone)
      StoreSink.mergeNdv(root, fsys, ndvIncoming, reset = false)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    StoreSink.cleanStaging(root, StoreSink.fs(root), queryId)
  }
}

/** Micro-batch streaming write: same staging/manifest protocol, plus an
  * EPOCH LEDGER in the manifest. Recovery can re-deliver a committed epoch
  * (checkpoint wrote the offset but died before the commit log); the ledger
  * makes the second delivery a no-op — the exactly-once half Structured
  * Streaming delegates to the sink. */
private class StoreStreamingWrite(pathStr: String, queryId: String,
                                  dataSchema: StructType = StoreSink.schema,
                                  spec: Option[StoreSink.PartSpec] = None)
    extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    StoreStreamingWriterFactory(pathStr, queryId, dataSchema, spec)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val staging = new Path(root, StoreSink.Staging)
    val committed = messages.map(_.asInstanceOf[StoreCommitMessage])
      .flatMap(_.files).toSeq
    require(committed.map(_.staged).distinct.size == committed.size,
      s"duplicate commit messages: ${committed.map(_.staged)}")
    StoreSink.withCommitLock(root, fsys) {
      // the epoch-ledger check lives INSIDE the lock: a replayed epoch and
      // its original delivery racing from two runs must serialize
      val lines = StoreSink.readManifestLines(root, fsys)
      if (StoreSink.committedEpochs(lines).contains(epochId)) {
        // replayed epoch: drop the re-staged files, change nothing visible
        StoreSink.cleanStaging(root, fsys, queryId, underLock = true)
        return
      }
      StoreSink.promote(root, fsys, staging, committed)
      StoreSink.writeManifestAtomic(root, fsys,
        lines ++ committed.map(_.entry.line) :+ StoreSink.epochLine(epochId))
      StoreSink.cleanStaging(root, fsys, queryId, underLock = true)
    }
    // incremental NDV per epoch (a replayed epoch returned above; even a
    // racing replay is harmless — HLL union is idempotent per value)
    StoreSink.mergeNdv(root, fsys,
      messages.map(_.asInstanceOf[StoreCommitMessage]).flatMap(_.ndv).toSeq,
      reset = false)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(pathStr)
    StoreSink.cleanStaging(root, StoreSink.fs(root), queryId)
  }
}

/** One staged file's commit payload. `staged` is its flat name in
  * `_staging/`; `dir` is the partition directory it promotes into ("" =
  * table root); `part` is its exact partition value for the manifest. */
private case class StoreFilePayload(staged: String, rows: Long,
                                    minK: Option[Long], maxK: Option[Long],
                                    bloom: Long, bytes: Long,
                                    part: Option[String] = None,
                                    dir: String = "",
                                    minA: Option[Long] = None,
                                    maxA: Option[Long] = None,
                                    stats: Seq[(String, Long, Long)] = Nil,
                                    sstats: Seq[(String, String, String)] = Nil,
                                    nullK: Option[Long] = None) {
  /** Manifest name (partition-dir-relative). */
  def name: String = if (dir.isEmpty) staged else s"$dir/$staged"
  def entry: StoreSink.StoreFileEntry =
    StoreSink.StoreFileEntry(name, rows, minK, maxK, Some(bloom), Some(bytes),
      None, part, None, minA, maxA, stats, sstats, nullK)
}

/** A task's commit message: one payload per staged file (a partitioned
  * writer stages one file per partition value it saw). */
private case class StoreCommitMessage(files: Seq[StoreFilePayload],
                                      ndv: Seq[(String, Array[Byte])] = Nil)
    extends WriterCommitMessage

/** Standalone (serializable) factory — same rule as RangeSource: an
  * anonymous inner factory would drag the driver-side write object into the
  * task closure. */
private case class StoreWriterFactory(pathStr: String, queryId: String,
                                      dataSchema: StructType = StoreSink.schema,
                                      spec: Option[StoreSink.PartSpec] = None)
    extends DataWriterFactory {
  // driver-side (factory construction): the physical emission layout for
  // tombstoned slots, plus the declared stat columns — serialized into the
  // task closure with the factory
  private val slots: Array[Int] = StoreSink.writeSlots(pathStr, dataSchema)
  private val statCols: Seq[(String, Int)] = {
    val root = new Path(pathStr)
    StoreSink.declaredStatCols(root, StoreSink.fs(root), dataSchema)
  }
  private val strStatCols: Seq[(String, Int)] = {
    val root = new Path(pathStr)
    StoreSink.declaredStrStatCols(root, StoreSink.fs(root), dataSchema)
  }
  private val columnar: Boolean = StoreSink.columnarAt(pathStr)
  private val ndvTrack: Boolean = StoreSink.ndvTracking(pathStr)
  private val compress: Boolean = StoreSink.compressAt(pathStr)
  private val groupRows: Int = StoreSink.groupRowsAt(pathStr)
  private val dictEnc: Boolean = StoreSink.dictAt(pathStr)
  private val rleEnc: Boolean = StoreSink.rleAt(pathStr)
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StoreDataWriter(pathStr, s"part-$queryId-$partitionId-$taskId", dataSchema,
      spec, slots, statCols, strStatCols, columnar, ndvTrack, compress,
      groupRows, dictEnc, rleEnc)
}

/** Streaming twin: epoch identity joins the task identity in the staged
  * file name, so two deliveries of one epoch stage DISJOINT files and the
  * replay-skip path can discard the second cleanly. */
private case class StoreStreamingWriterFactory(pathStr: String, queryId: String,
                                               dataSchema: StructType = StoreSink.schema,
                                               spec: Option[StoreSink.PartSpec] = None)
    extends StreamingDataWriterFactory {
  private val slots: Array[Int] = StoreSink.writeSlots(pathStr, dataSchema)
  private val statCols: Seq[(String, Int)] = {
    val root = new Path(pathStr)
    StoreSink.declaredStatCols(root, StoreSink.fs(root), dataSchema)
  }
  private val strStatCols: Seq[(String, Int)] = {
    val root = new Path(pathStr)
    StoreSink.declaredStrStatCols(root, StoreSink.fs(root), dataSchema)
  }
  private val columnar: Boolean = StoreSink.columnarAt(pathStr)
  private val ndvTrack: Boolean = StoreSink.ndvTracking(pathStr)
  private val compress: Boolean = StoreSink.compressAt(pathStr)
  private val groupRows: Int = StoreSink.groupRowsAt(pathStr)
  private val dictEnc: Boolean = StoreSink.dictAt(pathStr)
  private val rleEnc: Boolean = StoreSink.rleAt(pathStr)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new StoreDataWriter(pathStr, s"part-$queryId-e$epochId-$partitionId-$taskId",
      dataSchema, spec, slots, statCols, strStatCols, columnar, ndvTrack,
      compress, groupRows, dictEnc, rleEnc)
}

private class StoreDataWriter(pathStr: String, fileName: String,
                              dataSchema: StructType = StoreSink.schema,
                              spec: Option[StoreSink.PartSpec] = None,
                              slots: Array[Int] = null,
                              statCols: Seq[(String, Int)] = Nil,
                              strStatCols: Seq[(String, Int)] = Nil,
                              columnar: Boolean = false,
                              ndvTrack: Boolean = false,
                              compress: Boolean = false,
                              groupRows: Int = 1 << 20,
                              dictEnc: Boolean = false,
                              rleEnc: Boolean = false)
    extends DataWriter[InternalRow] {

  private val types = dataSchema.fields.map(_.dataType)
  // physical emission width (tombstoned slots included)
  private val physWidth = if (slots == null) types.length else slots.length
  // incremental NDV: one sketch per LOGICAL column, fed per row (O(1)),
  // shipped in the commit message and unioned into the stored sketches
  private val ndvSks =
    if (ndvTrack) Array.fill(types.length)(StoreSink.Ndv.empty()) else null

  // executor side: build the Hadoop conf locally (no SparkSession.active on
  // a bare task thread is guaranteed; a fresh Configuration resolves the
  // same local/HDFS filesystems)
  private val stagingDir = new Path(pathStr, StoreSink.Staging)
  private val fsys = StoreSink.fs(stagingDir, new Configuration())

  /** One open staged file per partition value this task has seen (a single
    * "" sink when unpartitioned). Staged names stay FLAT and per-task
    * unique — the partition value decides the PROMOTION directory at
    * commit, so staging cleanup never needs to recurse. */
  private class Sink(val staged: Path, val partValue: Option[String]) {
    val out: org.apache.hadoop.fs.FSDataOutputStream = fsys.create(staged, true)
    // columnar mode buffers one builder per PHYSICAL slot and writes
    // header+blocks at commit (one row group per file — the buffer is the
    // row group, exactly what a parquet writer holds before a flush)
    val colBufs: Array[StringBuilder] =
      if (columnar) Array.fill(physWidth)(new StringBuilder) else null
    var grows = 0 // rows in the CURRENT group (the flush counter)
    var rows = 0L; var bytes = 0L
    // per-GROUP zone stats for the tracked stat columns (k, amt, declared)
    // — the parquet row-group-stats shape; reset at each flush
    val gMinS: Array[Long] = Array.fill(gStatCols.size)(Long.MaxValue)
    val gMaxS: Array[Long] = Array.fill(gStatCols.size)(Long.MinValue)
    /** Flush the buffered group as one header+blocks section (ordinals
      * run across groups, so file-wide dv masks are untouched). */
    def flushGroup(compress: Boolean): Unit = if (grows > 0) {
      val gs = gStatCols.indices.flatMap { gi =>
        if (gMinS(gi) == Long.MaxValue) None
        else Some((gStatCols(gi)._2, gMinS(gi), gMaxS(gi)))
      }
      val b = StoreSink.columnarBytes(grows, colBufs, compress, gs, dictSlots,
        rleSlots)
      out.write(b)
      bytes += b.length
      colBufs.foreach(_.setLength(0))
      java.util.Arrays.fill(gMinS, Long.MaxValue)
      java.util.Arrays.fill(gMaxS, Long.MinValue)
      grows = 0
    }
    var minK: Long = Long.MaxValue; var maxK: Long = Long.MinValue
    var bloom = 0L
    var minA: Long = Long.MaxValue; var maxA: Long = Long.MinValue
    // declared-stat-column bounds, parallel to statCols
    val minS: Array[Long] = Array.fill(statCols.size)(Long.MaxValue)
    val maxS: Array[Long] = Array.fill(statCols.size)(Long.MinValue)
    // declared STRING stat bounds, parallel to strStatCols; a non-ASCII
    // value poisons the column for this file (comparator-safety guard)
    val minT: Array[String] = Array.fill(strStatCols.size)(null)
    val maxT: Array[String] = Array.fill(strStatCols.size)(null)
    val asciiOk: Array[Boolean] = Array.fill(strStatCols.size)(true)
    var nullK = 0L // exact null-key rows (Iceberg null_value_counts)
  }

  /** The second zone column (`amt_cents`) is tracked only when the write
    * schema actually carries it at its conventional ordinal with its
    * conventional type — an evolved/foreign schema just writes stat-less
    * amt fields (never-pruning, always correct). */
  private val trackA = types.length > 2 && types(2) == LongType &&
    dataSchema.fields(2).name == "amt_cents"
  /** Columns that get PER-GROUP zone stats in columnar files — the same
    * set the per-file manifest stats track (k, amt when conventional,
    * declared stat columns) — as (logical ordinal, physical slot). */
  private val gStatCols: Seq[(Int, Int)] =
    if (!columnar) Nil
    else (Seq(0) ++ (if (trackA) Seq(2) else Nil) ++ statCols.map(_._2)).distinct
      .map(ci => (ci, if (slots == null) ci else slots.indexOf(ci)))
      .filter(_._2 >= 0)
  /** Physical slots eligible for per-block dictionary encoding: the
    * string-typed live slots, when the table opted in. */
  private val dictSlots: Set[Int] =
    if (!columnar || !dictEnc) Set.empty
    else (0 until physWidth).filter { si =>
      val i = if (slots == null) si else slots(si)
      i >= 0 && i < types.length && types(i) == StringType
    }.toSet
  /** Physical slots eligible for per-block run-length encoding: the
    * integer-typed live slots, when the table opted in — plus the dict
    * slots (a string slot in BOTH sets opts its dictionary's ORDINAL
    * stream into run encoding, the `e` composition — never raw-string
    * RLE). */
  private val rleSlots: Set[Int] =
    if (!columnar || !rleEnc) Set.empty
    else (0 until physWidth).filter { si =>
      val i = if (slots == null) si else slots(si)
      i >= 0 && i < types.length &&
        (types(i) == LongType || types(i) == IntegerType)
    }.toSet ++ dictSlots
  private val sinks = scala.collection.mutable.LinkedHashMap[String, Sink]()

  private def sinkFor(record: InternalRow, base: Int): Sink =
    spec match {
      case None => sinks.getOrElseUpdate("", new Sink(
        new Path(stagingDir, fileName), None))
      case Some(sp) =>
        val v = sp.valueOf(record, base)
        sinks.getOrElseUpdate(v, new Sink(
          new Path(stagingDir, s"$fileName-p${sinks.size}"), Some(v)))
    }

  override def write(record: InternalRow): Unit = {
    // width == schema = plain write; +1 = ReplaceData's leading
    // __row_operation column (not in LogicalWriteInfo.schema) — see
    // StoreSink.encode
    val base = record.numFields - types.length
    require(base == 0 || base == 1,
      s"unexpected write row width ${record.numFields} for ${types.length} columns")
    val s = sinkFor(record, base)
    if (!record.isNullAt(base)) { // zone map over the key column
      val k = record.getLong(base)
      if (k < s.minK) s.minK = k
      if (k > s.maxK) s.maxK = k
    } else s.nullK += 1
    if (!record.isNullAt(base + 1)) // grp bloom, alongside the zones
      s.bloom |= StoreSink.grpSig(record.getUTF8String(base + 1).toString)
    if (trackA && !record.isNullAt(base + 2)) { // second zone column
      val a = record.getLong(base + 2)
      if (a < s.minA) s.minA = a
      if (a > s.maxA) s.maxA = a
    }
    var si = 0 // declared stat columns: generalized zones
    while (si < statCols.size) {
      val ci = statCols(si)._2
      if (!record.isNullAt(base + ci)) {
        val v = record.getLong(base + ci)
        if (v < s.minS(si)) s.minS(si) = v
        if (v > s.maxS(si)) s.maxS(si) = v
      }
      si += 1
    }
    var ti = 0 // declared STRING stat columns
    while (ti < strStatCols.size) {
      val ci = strStatCols(ti)._2
      if (s.asciiOk(ti) && !record.isNullAt(base + ci)) {
        val v = record.getUTF8String(base + ci).toString
        if (!v.forall(_ < 128)) s.asciiOk(ti) = false
        else {
          if (s.minT(ti) == null || v.compareTo(s.minT(ti)) < 0) s.minT(ti) = v
          if (s.maxT(ti) == null || v.compareTo(s.maxT(ti)) > 0) s.maxT(ti) = v
        }
      }
      ti += 1
    }
    if (ndvSks != null) {
      var ni = 0
      while (ni < types.length) {
        StoreSink.Ndv.update(ndvSks(ni), record, base + ni, types(ni))
        ni += 1
      }
    }
    if (columnar) {
      var gi = 0 // per-group zone stats over the tracked columns
      while (gi < gStatCols.size) {
        val ci = gStatCols(gi)._1
        if (!record.isNullAt(base + ci)) {
          val v = record.getLong(base + ci)
          if (v < s.gMinS(gi)) s.gMinS(gi) = v
          if (v > s.gMaxS(gi)) s.gMaxS(gi) = v
        }
        gi += 1
      }
      // transposed emission: same per-field codec, fields land in their
      // slot's column buffer instead of a row line
      var si = 0
      while (si < physWidth) {
        val i = if (slots == null) si else slots(si)
        val buf = s.colBufs(si)
        if (s.grows > 0) buf.append(',')
        if (i < 0) buf.append("\\N") // tombstoned slot: null placeholder
        else buf.append(StoreSink.fieldString(record, base + i, types(i)))
        si += 1
      }
      s.rows += 1
      s.grows += 1
      if (s.grows >= groupRows) s.flushGroup(compress)
    } else {
      val b = (StoreSink.encode(record, base, types, slots) + "\n")
        .getBytes(StandardCharsets.UTF_8)
      s.out.write(b)
      s.rows += 1
      s.bytes += b.length
    }
  }

  override def commit(): WriterCommitMessage = {
    val payloads = sinks.values.toSeq.map { s =>
      if (columnar) s.flushGroup(compress) // the tail group
      s.out.close()
      StoreFilePayload(s.staged.getName, s.rows,
        if (s.minK == Long.MaxValue) None else Some(s.minK),
        if (s.maxK == Long.MinValue) None else Some(s.maxK),
        s.bloom, s.bytes, s.partValue.map(v => spec.get.tagged(v)),
        s.partValue.map(v => spec.get.dirOf(v)).getOrElse(""),
        if (s.minA == Long.MaxValue) None else Some(s.minA),
        if (s.maxA == Long.MinValue) None else Some(s.maxA),
        statCols.indices.flatMap { si =>
          if (s.minS(si) == Long.MaxValue) None
          else Some((statCols(si)._1, s.minS(si), s.maxS(si)))
        },
        strStatCols.indices.flatMap { ti =>
          if (!s.asciiOk(ti) || s.minT(ti) == null) None
          else StoreSink.truncUpper(s.maxT(ti)).map(up =>
            (strStatCols(ti)._1, StoreSink.truncLower(s.minT(ti)), up))
        },
        Some(s.nullK))
    }
    StoreCommitMessage(payloads,
      if (ndvSks == null) Nil
      else dataSchema.fieldNames.toSeq.zip(ndvSks.map(_.toCompactByteArray).toSeq))
  }

  override def abort(): Unit = {
    sinks.values.foreach { s =>
      try s.out.close() catch { case _: Exception => () }
      fsys.delete(s.staged, false)
    }
  }

  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read path

private class StoreScanBuilder(pathStr: String, version: Option[Int] = None,
                               explicitFiles: Option[Seq[String]] = None,
                               table: StructType = StoreSink.schema,
                               branch: Option[String] = None,
                               maxFilesPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsPushDownOffset {

  private var zoneFilters: Array[Filter] = Array.empty
  private var kLo: Option[Long] = None
  private var kHi: Option[Long] = None
  private var aLo: Option[Long] = None
  private var aHi: Option[Long] = None
  private var grpConjuncts: Seq[Array[Long]] = Nil
  private var grpValues: Seq[Array[String]] = Nil
  private var kValues: Seq[Array[Long]] = Nil
  private var required: StructType = table
  private var aggFuncs: Seq[String] = Nil
  private var aggValues: Seq[Long] = Nil
  // generalized zone bounds on trailing bigint columns (the 12th manifest
  // field); populated only for columns the filters actually constrain
  private var statBounds: Seq[(String, Option[Long], Option[Long])] = Nil
  // string twin (13th field): equality/range/prefix bounds on trailing
  // string columns, compared against truncated-prefix file stats
  private var strBounds: Seq[(String, Option[String], Option[String])] = Nil
  private var strPrefixes: Seq[(String, String)] = Nil

  /** Trailing bigint columns — every one is a POTENTIAL stat column: a
    * predicate on it prunes exactly the files whose manifest lines carry a
    * declared stat for it, and never prunes the rest. */
  private def trailingLongCols: Seq[String] =
    table.fields.drop(3).filter(_.dataType == LongType).map(_.name).toSeq

  private def trailingStrCols: Seq[String] =
    table.fields.drop(3).filter(_.dataType == StringType).map(_.name).toSeq

  /** Conjunct string bounds on `c`: equality/range literals plus LIKE
    * 'p%' (Spark pushes StringStartsWith) as the [p, inc(p)] range. */
  private def strColBounds(filters: Array[Filter],
                           c: String): (Option[String], Option[String]) = {
    var lo: Option[String] = None; var hi: Option[String] = None
    def raise(v: String): Unit =
      lo = Some(lo.fold(v)(x => if (v.compareTo(x) > 0) v else x))
    def lower(v: String): Unit =
      hi = Some(hi.fold(v)(x => if (v.compareTo(x) < 0) v else x))
    filters.foreach {
      case EqualTo(`c`, v: String) => raise(v); lower(v)
      case GreaterThan(`c`, v: String) => raise(v)
      case GreaterThanOrEqual(`c`, v: String) => raise(v)
      case LessThan(`c`, v: String) => lower(v)
      case LessThanOrEqual(`c`, v: String) => lower(v)
      case In(`c`, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        val ss = vs.collect { case s: String => s }
        raise(ss.min); lower(ss.max)
      case org.apache.spark.sql.sources.StringStartsWith(`c`, p) if p.nonEmpty =>
        raise(p); StoreSink.incrementLast(p).foreach(lower)
      case _ => ()
    }
    (lo, hi)
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private var limitN: Option[Int] = None
  // TOP-N pushdown (ORDER BY k [ASC|DESC] LIMIT n): direction + the sort's
  // null placement — the planner's coverage arithmetic differs per case
  private var topNDesc: Option[Boolean] = None
  private var topNNullsFirst: Boolean = false
  // IS [NOT] NULL on the key column: prunes via the per-file null counts
  private var kNullPred: Option[Boolean] = None
  // OFFSET pushdown (full semantics: the source DROPS exactly m live rows)
  private var offsetN: Option[Int] = None

  /** LIMIT pushdown, PARTIAL (isPartiallyPushed stays true, so Spark keeps
    * its own Limit): the scan plans only a PREFIX of files whose exact
    * live-row counts already cover the limit — `LIMIT 10` over a
    * million-file table opens one file, not a million (planning itself is
    * already sublinear via the segment tree; this cuts the rows READ).
    * Applied conservatively at plan time: every candidate entry must carry
    * an exact live count (legacy stat-less lines and equality-masked
    * entries — whose counts are upper bounds — fall back to the full
    * plan), and runtime-filtered scans are left alone. Spark only pushes a
    * Limit sitting DIRECTLY on the scan, and every filter this source
    * "pushes" remains a residual Filter node, so a filtered query can
    * never under-produce through this path. */
  override def pushLimit(limit: Int): Boolean = {
    limitN = Some(limit)
    true
  }

  /** TOP-N pushdown, PARTIAL (Spark keeps its Sort+Limit): `ORDER BY k
    * LIMIT n` plans only the files whose zones could hold the top n keys —
    * sort candidates by zone edge, accumulate EXACT NON-NULL coverage
    * (rows − nullK) to n, then widen to every overlapping zone. Null
    * placement is honored through the per-file null counts: NULLS FIRST
    * covers nulls before values, NULLS LAST adds null-bearing files only
    * when the non-null total falls short. Like pushLimit, Spark only asks
    * when the sort sits DIRECTLY on the scan (our filters stay residual),
    * and planning falls back to the full candidate set whenever any entry
    * lacks exact counts (masks, legacy lines) — partial push means a
    * superset is always sound. */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        limit: Int): Boolean = {
    if (explicitFiles.isDefined || branch.isDefined) return false
    if (orders.length != 1) return false
    val o = orders(0)
    if (o.expression().toString.replace("`", "") != "k") return false
    limitN = Some(limit)
    topNDesc = Some(o.direction() ==
      org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING)
    topNNullsFirst = o.nullOrdering() ==
      org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST
    true
  }

  override def isPartiallyPushed: Boolean = true

  /** OFFSET pushdown — FULL semantics (Spark removes its Offset node), so
    * the promise is made only when it is provable at pushdown time: an
    * unfiltered, unmasked, exactly-counted manifest. The drop is whole
    * leading files in manifest order plus a row-skip in the boundary file
    * — pagination over a million-file table opens the page's files only.
    * OFFSET without ORDER BY is nondeterministic by SQL semantics; the
    * manifest order is this source's deterministic choice. Declined under
    * a pushed top-n (the planned coverage is re-sorted above — dropping
    * unordered rows there would be wrong; Spark keeps its own offset). */
  override def pushOffset(offset: Int): Boolean = {
    if (explicitFiles.isDefined || branch.isDefined || version.isDefined)
      return false
    if (topNDesc.isDefined) return false
    if (zoneFilters.nonEmpty || kLo.isDefined || kHi.isDefined ||
        aLo.isDefined || aHi.isDefined || statBounds.nonEmpty ||
        strBounds.nonEmpty || grpConjuncts.nonEmpty || kNullPred.nonEmpty)
      return false
    val root = new Path(pathStr)
    val entries = StoreSink.readEntries(root, StoreSink.fs(root))
    if (entries.isEmpty ||
        entries.exists(e => e.rows < 0 || e.eq.isDefined)) return false
    offsetN = Some(offset)
    true
  }

  /** AGGREGATE PUSHDOWN from manifest metadata: an unfiltered, ungrouped
    * COUNT(*)/MIN(k)/MAX(k) is already summed in the manifest — per-file
    * live row counts and key zones — so the scan answers it WITHOUT
    * planning a single data file (metadata reads only; segment contents
    * come from the content-hash cache). The partial-aggregation contract
    * (like RangeSource's): one row of partial values, Spark's final
    * aggregate merges it. DECLINES, falling back to the row scan, whenever
    * metadata can't answer exactly: any pushed filter or explicit file
    * set, a GROUP BY, any entry without an exact row count (legacy bare
    * lines), or min/max with no zoned entry. Spark itself never asks when
    * a residual filter remains above the scan — the guards are
    * belt-and-braces. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (explicitFiles.isDefined) return false
    if (branch.isDefined) return false // branch view: manifest totals lie
    if (zoneFilters.nonEmpty || kLo.isDefined || kHi.isDefined ||
        aLo.isDefined || aHi.isDefined || statBounds.nonEmpty ||
        strBounds.nonEmpty || grpConjuncts.nonEmpty ||
        kNullPred.nonEmpty) return false
    if (agg.groupByExpressions.nonEmpty) return false
    def ref(e: org.apache.spark.sql.connector.expressions.Expression,
            c: String): Boolean =
      e.toString.replace("`", "") == c
    // MIN/MAX on a DECLARED-stat trailing column answers from the 12th
    // manifest field the same way k/amt answer from their zones
    def statRef(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      trailingLongCols.find(c => ref(e, c))
    val fs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar                           => Some("count")
      case m: Min if ref(m.column, "k")           => Some("min")
      case m: Max if ref(m.column, "k")           => Some("max")
      case m: Min if ref(m.column, "amt_cents")   => Some("min_a")
      case m: Max if ref(m.column, "amt_cents")   => Some("max_a")
      case m: Min if statRef(m.column).isDefined  => Some("min_s:" + statRef(m.column).get)
      case m: Max if statRef(m.column).isDefined  => Some("max_s:" + statRef(m.column).get)
      case _ => None
    }
    if (fs.contains(None) || fs.isEmpty) return false
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val entries = (version match {
      case Some(v) => StoreSink.readVersionLines(root, fsys, v)
        .filterNot(_.startsWith("#")).map(StoreSink.parseEntry)
      case None => StoreSink.readEntries(root, fsys)
    })
    if (entries.exists(_.rows < 0)) return false // no exact count recorded
    if (entries.exists(_.eq.isDefined))
      return false // equality-deleted entries: rows are an UPPER BOUND and
                   // zones may bracket dead keys — every aggregate declines
    val zoned = entries.filter(_.minK.isDefined)
    val zonedA = entries.filter(_.minA.isDefined)
    val minMaxWanted = fs.flatten.exists(f => f != "count")
    if (minMaxWanted && zoned.isEmpty)
      return false // MIN/MAX of an all-null (or empty) key column: fall back
    if (minMaxWanted && entries.exists(_.dv.isDefined))
      return false // vectored entries: zones are conservative, not exact
    // amt MIN/MAX additionally needs EVERY row-bearing entry to carry amt
    // zones (a stat-less file could hide the extremum; k tolerates absent
    // zones only because zone-less entries are also row-count-less legacy
    // lines, already declined above)
    if (fs.flatten.exists(f => f == "min_a" || f == "max_a") &&
        entries.exists(e => e.rows > 0 && e.minA.isEmpty))
      return false
    // a declared-stat MIN/MAX likewise needs EVERY row-bearing entry to
    // carry that column's stat (a stat-less file could hide the extremum)
    val statWanted = fs.flatten.collect {
      case f if f.startsWith("min_s:") || f.startsWith("max_s:") => f.substring(6)
    }.distinct
    if (statWanted.exists(c => entries.exists(e =>
        e.rows > 0 && !e.stats.exists(_._1 == c))))
      return false
    if (statWanted.exists(c => !entries.exists(_.stats.exists(_._1 == c))))
      return false // all-null (or never-written) column: fall back
    aggValues = fs.flatten.map {
      case "count" => entries.map(_.rows).sum
      case "min"   => zoned.flatMap(_.minK).min
      case "max"   => zoned.flatMap(_.maxK).max
      case "min_a" => zonedA.flatMap(_.minA).min
      case "max_a" => zonedA.flatMap(_.maxA).max
      case f if f.startsWith("min_s:") =>
        entries.flatMap(_.stats.find(_._1 == f.substring(6)).map(_._2)).min
      case f if f.startsWith("max_s:") =>
        entries.flatMap(_.stats.find(_._1 == f.substring(6)).map(_._3)).max
    }
    aggFuncs = fs.flatten
    StoreSink.lastAggPush = Some(aggFuncs)
    true
  }

  /** Zone-map + bloom pushdown, parquet-style: key-bound conjuncts narrow
    * FILE planning via the manifest's per-file min/max, grp point/IN
    * conjuncts narrow it via the per-file bloom, but every filter is
    * returned as a post-scan residual — file skipping never replaces row
    * evaluation. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (lo, hi) = StoreSink.kBounds(filters)
    kLo = lo; kHi = hi
    val (alo, ahi) = StoreSink.colBounds(filters, "amt_cents")
    aLo = alo; aHi = ahi
    grpConjuncts = filters.toSeq.collect {
      case EqualTo("grp", v: String) => Array(StoreSink.grpSig(v))
      case In("grp", vs) if vs.forall(_.isInstanceOf[String]) =>
        vs.collect { case s: String => StoreSink.grpSig(s) }
    }.filter(_.nonEmpty)
    // exact literal sets alongside the lossy bloom signatures: partition
    // pruning needs the VALUES (identity dirs match exactly; point keys
    // map to their bucket)
    grpValues = filters.toSeq.collect {
      case EqualTo("grp", v: String) => Array(v)
      case In("grp", vs) if vs.forall(_.isInstanceOf[String]) =>
        vs.collect { case s: String => s }
    }.filter(_.nonEmpty)
    kValues = filters.toSeq.collect {
      case EqualTo("k", v: java.lang.Long) => Array(v.longValue)
      case EqualTo("k", v: java.lang.Integer) => Array(v.longValue)
      case In("k", vs) if vs.forall(v =>
          v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Integer]) =>
        vs.map(_.asInstanceOf[Number].longValue)
    }.filter(_.nonEmpty)
    // generalized per-column zones: bounds on ANY trailing bigint column
    statBounds = trailingLongCols.flatMap { c =>
      val (lo, hi) = StoreSink.colBounds(filters, c)
      if (lo.isDefined || hi.isDefined) Some((c, lo, hi)) else None
    }
    strBounds = trailingStrCols.flatMap { c =>
      val (lo, hi) = strColBounds(filters, c)
      if (lo.isDefined || hi.isDefined) Some((c, lo, hi)) else None
    }
    // LIKE-prefix literals for the dictionary pre-check (round-12 verdict
    // #7): a group whose dictionary holds NO value starting with a pushed
    // prefix cannot satisfy `col LIKE 'p%'` on any row — sound because
    // every filter returns residual below. grp included: dict blocks
    // encode any qualifying string slot.
    strPrefixes = filters.toSeq.collect {
      case org.apache.spark.sql.sources.StringStartsWith(c, p)
          if p.nonEmpty && (c == "grp" || trailingStrCols.contains(c)) =>
        (c, p)
    }
    kNullPred = filters.collectFirst {
      case IsNull("k") => true
      case IsNotNull("k") => false
    }
    val statNames = statBounds.map(_._1).toSet
    val strNames = strBounds.map(_._1).toSet
    zoneFilters = filters.filter {
      case EqualTo("k", _) | GreaterThan("k", _) | GreaterThanOrEqual("k", _)
           | LessThan("k", _) | LessThanOrEqual("k", _) | In("k", _) => true
      case EqualTo("amt_cents", _) | GreaterThan("amt_cents", _)
           | GreaterThanOrEqual("amt_cents", _) | LessThan("amt_cents", _)
           | LessThanOrEqual("amt_cents", _) | In("amt_cents", _) => true
      case EqualTo("grp", _: String) => true
      case In("grp", vs) => vs.forall(_.isInstanceOf[String])
      case EqualTo(c, _) if statNames(c) || strNames(c) => true
      case GreaterThan(c, _) if statNames(c) || strNames(c) => true
      case GreaterThanOrEqual(c, _) if statNames(c) || strNames(c) => true
      case LessThan(c, _) if statNames(c) || strNames(c) => true
      case LessThanOrEqual(c, _) if statNames(c) || strNames(c) => true
      case In(c, _) if statNames(c) || strNames(c) => true
      case org.apache.spark.sql.sources.StringStartsWith(c, _) if strNames(c) => true
      case IsNull("k") | IsNotNull("k") => true
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[Filter] = zoneFilters

  override def build(): Scan =
    if (aggFuncs.nonEmpty) new StoreAggScan(pathStr, aggFuncs, aggValues)
    else new StoreScan(pathStr, kLo, kHi, version, required, grpConjuncts,
      explicitFiles, table, grpValues, kValues, branch, aLo, aHi, limitN,
      maxFilesPerTrigger, statBounds, strBounds, topNDesc, topNNullsFirst,
      kNullPred, offsetN, strPrefixes)
}

/** Metadata-answered aggregate scan: the values were computed at pushdown
  * time from the manifest; ONE synthetic partition carries them — zero data
  * files are ever planned or opened. */
private class StoreAggScan(pathStr: String, funcs: Seq[String],
                           values: Seq[Long])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(funcs.zipWithIndex.map { case (f, i) =>
      StructField(s"${f}_$i", LongType, nullable = false)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftStoreAggScan($pathStr) agg=${funcs.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(StoreAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    StoreAggReaderFactory()
}

private case class StoreAggPartition(values: Seq[Long]) extends InputPartition

private case class StoreAggReaderFactory()
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val vs = partition.asInstanceOf[StoreAggPartition].values
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(vs)
      override def close(): Unit = ()
    }
  }
}

/** Driver-side metric definitions for the store scan (sum across the one
  * driver report; the aggregate is just the latest value rendered).
  * Concrete zero-arg classes, NOT a parameterized case class: the SQL
  * metrics listener re-instantiates CustomMetric implementations
  * REFLECTIVELY by class name to aggregate values, and a class without a
  * no-arg constructor makes every query over the store log a
  * SparkException per metric (observed; the metrics still rendered, but
  * the log noise buried real failures). */
private sealed class StoreMetric(mName: String, mDesc: String)
    extends org.apache.spark.sql.connector.metric.CustomMetric {
  override def name(): String = mName
  override def description(): String = mDesc
  override def aggregateTaskMetrics(taskMetrics: Array[Long]): String =
    taskMetrics.sum.toString
}

private class ManifestFilesMetric
  extends StoreMetric("manifestFiles", "store: files in manifest")

private class PlannedFilesMetric
  extends StoreMetric("plannedFiles", "store: files planned after zone pruning")

private case class StoreMetricValue(name: String, value: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric

/** The `_file` metadata column definition. */
private object StoreFileColumn extends MetadataColumn {
  override def name(): String = "_file"
  override def dataType(): DataType = StringType
  override def isNullable: Boolean = false
  override def comment(): String = "committed data file this row came from"
}

/** The `_pos` metadata column: the row's PHYSICAL ordinal within its data
  * file — the same ordinal space deletion vectors mask, so a surviving
  * row's `_pos` never renumbers under merge-on-read deletes (the
  * Iceberg `_pos` contract; it is what positional delete files would
  * reference). */
private object StorePosColumn extends MetadataColumn {
  override def name(): String = "_pos"
  override def dataType(): DataType = LongType
  override def isNullable: Boolean = false
  override def comment(): String = "physical row ordinal within _file"
}

private class StoreScan(pathStr: String,
                        kLo: Option[Long] = None, kHi: Option[Long] = None,
                        version: Option[Int] = None,
                        required: StructType = StoreSink.schema,
                        grpConjuncts: Seq[Array[Long]] = Nil,
                        explicitFiles: Option[Seq[String]] = None,
                        table: StructType = StoreSink.schema,
                        grpValues: Seq[Array[String]] = Nil,
                        kValues: Seq[Array[Long]] = Nil,
                        branch: Option[String] = None,
                        aLo: Option[Long] = None, aHi: Option[Long] = None,
                        limitN: Option[Int] = None,
                        maxFilesPerTrigger: Option[Int] = None,
                        statBounds: Seq[(String, Option[Long], Option[Long])] = Nil,
                        strBounds: Seq[(String, Option[String], Option[String])] = Nil,
                        topNDesc: Option[Boolean] = None,
                        topNNullsFirst: Boolean = false,
                        kNullPred: Option[Boolean] = None,
                        offsetN: Option[Int] = None,
                        strPrefixes: Seq[(String, String)] = Nil)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeFiltering
    with SupportsReportPartitioning with SupportsReportOrdering {

  /** SORT-ORDER report (SupportsReportOrdering): partitioned-store files
    * are key-sorted by construction (the write's required ordering), so
    * when every partition VALUE holds exactly one file — the layout the
    * required write distribution produces and compaction restores — the
    * scan declares per-partition `k ASC` and a storage-partitioned merge
    * join drops its Sort nodes too: fully exchange-free AND sort-free.
    * Multiple files per value would concatenate unordered inside a key
    * group, so the claim is withdrawn (empty) the moment the layout
    * fragments — correctness first, the report is pure opportunity. */
  // an orderedBy write ever landing means files may be sorted by a
  // DIFFERENT column than k — the claim withdraws permanently. Resolved
  // once per scan (planning calls this repeatedly; the flag is immutable
  // once set).
  private lazy val orderedByMarked: Boolean = {
    val root = new Path(pathStr)
    StoreSink.readProps(root, StoreSink.fs(root)).toMap
      .contains(StoreSink.OrderedByProp)
  }

  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    val ok = spec.isDefined && explicitFiles.isEmpty && !orderedByMarked && {
      val entries = currentEntries(root, fsys)
      entries.nonEmpty && entries.forall(_.part.exists(p =>
          StoreSink.partTag(p)._1 == spec.get.id)) && // one spec generation
        entries.groupBy(_.part.get).values.forall(_.size == 1)
    }
    if (ok)
      Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions.column("k"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    else Array.empty
  }

  /** Branch (WAP audit) view: the staged side manifest's entries, spliced
    * after main's. Flat lines, full zone/bloom stats — every pruning path
    * applies to staged files too. */
  private def branchEntries(root: Path, fsys: FileSystem): Seq[StoreSink.StoreFileEntry] =
    branch.toSeq.flatMap(b => StoreSink.readBranchLines(root, fsys, b))
      .filterNot(_.startsWith("#")).map(StoreSink.parseEntry)

  /** Table partition spec, bound once per scan. */
  private lazy val spec: Option[StoreSink.PartSpec] = {
    val root = new Path(pathStr)
    StoreSink.readPartSpec(root, StoreSink.fs(root))
  }

  /** The full spec registry (spec evolution): id → spec, bound once. */
  private lazy val specRegistry: Map[Int, Option[StoreSink.PartSpec]] = {
    val root = new Path(pathStr)
    StoreSink.readPartSpecs(root, StoreSink.fs(root)).toMap
  }

  /** Partition values the pushed (and runtime) predicates allow UNDER ONE
    * SPEC, None = unconstrained. Identity partitions answer grp point/IN
    * predicates EXACTLY; bucket partitions map point keys (including
    * DPP-realized join keys) to their bucket. Conjuncts intersect.
    * Memoized per spec id — a mixed-generation table prunes each file
    * under the spec it was written with. */
  private val allowedCache =
    scala.collection.mutable.HashMap.empty[Int, Option[Set[String]]]
  private def allowedFor(sp: StoreSink.PartSpec): Option[Set[String]] =
    allowedCache.getOrElseUpdate(sp.id, {
      val conjuncts: Seq[Set[String]] =
        if (sp.kind == "identity")
          grpValues.map(_.toSet) ++ runtimeGrps.map(_.toSet).toSeq
        else (kValues ++ runtimeKeys.toSeq).map(
          _.map(v => java.lang.Math.floorMod(v, sp.n.toLong).toString).toSet)
      conjuncts.reduceOption(_ intersect _)
    })

  /** May a file whose manifest part field is `p` match the predicates?
    * Resolves `<id>~<value>` under the file's OWN spec generation; unknown
    * ids (foreign manifests) never prune — conservative. An UNTAGGED
    * spec-1 identity value could itself start with `<digits>~` (the tag
    * separator is not escaped in legacy values), so any tagged-looking
    * field is ALSO read as a literal spec-1 value and the file prunes only
    * when BOTH interpretations prune. */
  private def partMayMatch(p: String): Boolean = {
    def under(pid: Int, v: String): Boolean =
      specRegistry.get(pid).flatten match {
        case Some(sp) => allowedFor(sp).forall(_.contains(v))
        case None => true
      }
    val (pid, v) = StoreSink.partTag(p)
    if (pid == 1) under(1, p)
    else under(pid, v) || under(1, p)
  }

  /** STORAGE-PARTITIONED layout report: when every current entry carries a
    * partition value, the scan declares KeyGroupedPartitioning over the
    * spec's transform and each input partition carries its key — two
    * stores bucketed the same way join on k with ZERO exchanges (the
    * BucketSource SPJ contract, now on real committed data). Declines
    * (UnknownPartitioning) for explicit-file reads and mixed/legacy
    * manifests. */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    (spec, explicitFiles) match {
      case (Some(sp), None) =>
        // every live file must belong to the CURRENT spec generation — a
        // mixed-spec table (mid-evolution) withdraws the report and the
        // join re-plans with exchanges, graceful never wrong
        val entries = currentEntries(root, fsys)
        if (entries.nonEmpty && entries.forall(_.part.exists(p =>
            StoreSink.partTag(p)._1 == sp.id)))
          new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
            Array(sp.toTransform), entries.flatMap(_.part).distinct.size)
        else new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }
  }

  /** Last planning's (manifest, kept) file counts — surfaced as DRIVER
    * metrics so zone-map effectiveness shows in the SQL UI per scan (the
    * operational half of the zone-map story: "did the layout help THIS
    * query" without reading logs). */
  @volatile private var plannedCounts: Option[(Int, Int)] = None

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new ManifestFilesMetric, new PlannedFilesMetric)

  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    plannedCounts.map { case (m, p) =>
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric](
        StoreMetricValue("manifestFiles", m.toLong),
        StoreMetricValue("plannedFiles", p.toLong))
    }.getOrElse(Array.empty)

  /** PHYSICAL list of the pinned snapshot, or the current manifest. */
  private def currentPhysical(root: Path, fsys: FileSystem): Seq[String] =
    version match {
      case Some(v) => StoreSink.readVersionPhysical(root, fsys, v)
      case None => StoreSink.readListLines(root, fsys)
    }

  /** Plan over the manifest TREE: walk the list, skip whole segments whose
    * key range misses the pushed bounds (their aggregate counts still feed
    * the totals — no read), expand only matched segments. Returns
    * (total data files, candidate entries). Driver cost is O(list +
    * matched segments), the tree's point. */
  protected def plannedCandidates(root: Path, fsys: FileSystem): (Int, Seq[StoreSink.StoreFileEntry]) = {
    val items = currentPhysical(root, fsys).filterNot(_.startsWith("#"))
    var total = 0
    var segsTotal = 0; var segsRead = 0
    val candidates = items.flatMap { l =>
      if (l.startsWith("@seg|")) {
        val sp = StoreSink.parseSeg(l)
        total += sp.nData; segsTotal += 1
        if (!sp.mayContain(kLo, kHi)) Nil
        else {
          segsRead += 1
          StoreSink.readSegment(root, fsys, sp.name)
            .filterNot(_.startsWith("#")).map(StoreSink.parseEntry)
        }
      } else {
        total += 1
        Seq(StoreSink.parseEntry(l))
      }
    }
    StoreSink.lastSegPlan = Some((segsTotal, segsRead))
    val staged = branchEntries(root, fsys)
    (total + staged.size, candidates ++ staged)
  }

  /** Entries of the pinned snapshot, or the current manifest (plus the
    * audited branch's staged entries, when reading a branch view). */
  protected def currentEntries(root: Path, fsys: FileSystem): Seq[StoreSink.StoreFileEntry] =
    (version match {
      case Some(v) => StoreSink.readVersionLines(root, fsys, v)
        .filterNot(_.startsWith("#")).map(StoreSink.parseEntry)
      case None => StoreSink.readEntries(root, fsys)
    }) ++ branchEntries(root, fsys)

  /** Realized runtime join keys (sorted), when DPP handed any. */
  @volatile private var runtimeKeys: Option[Array[Long]] = None

  private def runtimeGrpSigs: Option[Array[Long]] =
    runtimeGrps.map(_.map(StoreSink.grpSig))

  /** Realized runtime GRP join values — runtime BLOOM-filter pruning on
    * the non-zone dimension column: a selective fact⋈dim join on `grp`
    * realizes the dim side's values, and files whose per-file bloom says
    * "cannot contain any of them" are skipped — file skipping from a JOIN,
    * on a column zones can't order. Values kept verbatim too: on an
    * identity-partitioned store they prune whole partition DIRS. */
  @volatile private var runtimeGrps: Option[Array[String]] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val z = (kLo, kHi) match {
      case (None, None) => ""
      case _ => s" zones=[${kLo.getOrElse("-inf")}, ${kHi.getOrElse("+inf")}]"
    }
    s"GraftStoreScan($pathStr)$z"
  }

  // ---- runtime filtering (DPP into the store via zone maps AND blooms)
  // Only columns the PRUNED read schema still carries: Spark resolves the
  // declared attributes against readSchema(), so advertising a column the
  // projection dropped fails analysis ("Unable to resolve k given [...]").
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // a fully-pushed OFFSET already promised to drop exactly m rows of the
    // UNfiltered scan — runtime pruning would shift which rows the drop
    // hits after the promise, so the scan offers no filterable attributes
    if (offsetN.isDefined) Array.empty
    else Seq("k", "grp").filter(required.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray

  override def filter(filters: Array[Filter]): Unit = {
    StoreSink.lastRuntimeFilter =
      Some(filters.map(f => f.toString + " [" +
        f.references.mkString(",") + "]").mkString("; "))
    filters.foreach {
    case In(a, vs) if a == "k" =>
      val ks = vs.collect {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long    => l.longValue()
      }.sorted
      // prune ONLY when every In value converted: a partially-converted key
      // array would make mayContainAny drop files that hold the unconverted
      // keys — a silently wrong (possibly empty) scan. Skipping runtime
      // pruning is always safe; the join itself still filters rows.
      if (ks.length == vs.length) runtimeKeys = Some(ks)
    case In(a, vs) if a == "grp" =>
      val gs = vs.collect {
        case s: String => s
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      }
      // same every-value-converted rule; NULL join keys never match an
      // equi-join, so dropping them from the realized set is safe
      if (gs.length == vs.count(_ != null)) runtimeGrps = Some(gs)
    case _ => ()
  } }

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    // EXPLICIT FILE PLANNING (the change-data-feed read path): plan exactly
    // the named tokens (`name` or `name@dv` — the vector is part of a
    // file's logical identity), bypassing the manifest — the caller
    // (changes()/compact) already resolved its file set from version
    // manifests, and the named generation may no longer be current
    explicitFiles match {
      case Some(tokens) =>
        return tokens.filter(_.nonEmpty).map { t =>
          val (pre, eqF) = t.split("#", 2) match {
            case Array(a, b) => (a, Some(new Path(root, b).toString))
            case Array(a)    => (a, None)
          }
          val (n, dv) = pre.split("@", 2) match {
            case Array(a, b) => (a, Some(new Path(root, b).toString))
            case Array(a)    => (a, None)
          }
          StoreFilePartition(new Path(root, n).toString, dv, n,
            eqFile = eqF): InputPartition
        }.toArray
      case None => ()
    }
    // manifest-only planning: uncommitted/stray files cannot be scanned;
    // segment ranges, then zone maps / blooms, then partition values drop
    // files the pushed bounds / grp literals / runtime keys cannot touch
    val (total, candidates) = plannedCandidates(root, fsys)
    val kept = candidates
      .filter(_.mayContain(kLo, kHi))
      .filter(_.mayContainA(aLo, aHi))
      .filter(e => statBounds.forall { case (c, lo, hi) =>
        e.mayContainStat(c, lo, hi) })
      .filter(e => strBounds.forall { case (c, lo, hi) =>
        e.mayContainStrStat(c, lo, hi) })
      .filter(e => grpConjuncts.forall(e.mayContainGrp))
      .filter(e => runtimeKeys.forall(e.mayContainAny))
      .filter(e => runtimeGrpSigs.forall(e.mayContainGrp))
      // IS [NOT] NULL on k: exact per-file null counts prune — masks only
      // REMOVE rows, so nullK == 0 (no nulls, ever) and rows == nullK with
      // no masks (all null) are both safe witnesses; countless files keep
      .filter(e => kNullPred match {
        case Some(true)  => e.nullK.forall(_ > 0)
        case Some(false) =>
          !(e.nullK.isDefined && e.rows >= 0 && e.eq.isEmpty &&
            e.dv.isEmpty && e.nullK.get == e.rows)
        case None => true
      })
    val keptP = kept.filter(_.part.forall(partMayMatch))
    if (spec.isDefined)
      StoreSink.lastPartPrune = Some((kept.size, keptP.size))
    // LIMIT prefix cut (partial pushdown — Spark's Limit still runs): only
    // when every candidate's live count is exact (no legacy stat-less
    // lines, no equality masks whose counts are upper bounds) and no
    // runtime filter narrowed the scan after pushdown
    val keptL = (topNDesc, limitN) match {
      // TOP-N: zone-ordered coverage — sound only over mask-free entries
      // with exact rows, null counts, and (where non-null rows exist)
      // zones; anything else plans the full candidate set (partial push)
      case (Some(desc), Some(n)) if keptP.nonEmpty &&
          keptP.forall(e => e.rows >= 0 && e.eq.isEmpty && e.dv.isEmpty &&
            e.nullK.isDefined &&
            (e.rows - e.nullK.get == 0 || (e.minK.isDefined && e.maxK.isDefined))) &&
          runtimeKeys.isEmpty && runtimeGrps.isEmpty =>
        def nonNull(e: StoreSink.StoreFileEntry) = e.rows - e.nullK.get
        def valueCover(need: Long): Seq[StoreSink.StoreFileEntry] = {
          val es = keptP.filter(nonNull(_) > 0)
          val sorted = if (desc) es.sortBy(e => -e.maxK.get)
                       else es.sortBy(_.minK.get)
          var acc = 0L
          val prefix = sorted.takeWhile { e =>
            val more = acc < need; acc += nonNull(e); more
          }
          if (acc < need) sorted // fewer than n non-null keys exist: all
          else {
            val thr = if (desc) prefix.map(_.minK.get).min
                      else prefix.map(_.maxK.get).max
            sorted.filter(e =>
              if (desc) e.maxK.get >= thr else e.minK.get <= thr)
          }
        }
        val nullFiles = keptP.filter(_.nullK.get > 0)
        val totalNulls = keptP.map(_.nullK.get).sum
        val plan =
          if (topNNullsFirst) {
            if (totalNulls >= n) {
              var acc = 0L
              nullFiles.takeWhile { e =>
                val more = acc < n; acc += e.nullK.get; more }
            } else nullFiles ++ valueCover(n - totalNulls)
          } else {
            val nnTotal = keptP.map(nonNull).sum
            if (nnTotal >= n) valueCover(n)
            else valueCover(n) ++ nullFiles
          }
        val planned = plan.map(_.name).toSet
        val out = keptP.filter(e => planned(e.name))
        StoreSink.lastTopNPlan = Some((keptP.size, out.size))
        out
      case (Some(_), _) => // guards unmet: the full set stays sound
        StoreSink.lastTopNPlan = Some((keptP.size, keptP.size))
        keptP
      case (None, Some(n)) if keptP.forall(e => e.rows >= 0 && e.eq.isEmpty) &&
          runtimeKeys.isEmpty && runtimeGrps.isEmpty =>
        var acc = 0L
        val prefix = keptP.takeWhile { e =>
          val need = acc < n; acc += e.rows; need
        }
        StoreSink.lastLimitPlan = Some((keptP.size, prefix.size))
        prefix
      case _ => keptP
    }
    // OFFSET cut (pushOffset promised full semantics): drop whole leading
    // files in manifest order, row-skip the boundary file
    val keptO: Seq[(StoreSink.StoreFileEntry, Long)] = offsetN match {
      case Some(m) =>
        // pushOffset validated exact-counts/mask-free against the manifest
        // AT PUSHDOWN TIME, but planning re-reads the manifest — a commit
        // landing in between (e.g. an equality-delete sidecar) turns
        // entry.rows into an upper bound. Spark's Offset node is already
        // gone (full-semantics push), so falling back would silently
        // return wrong rows: re-verify here and fail LOUDLY instead.
        if (keptL.exists(e => e.rows < 0 || e.eq.isDefined))
          throw new IllegalStateException(
            s"store $pathStr changed between OFFSET pushdown and planning " +
            "(an entry lost its exact live count); re-run the query")
        var remaining = m.toLong
        val out = keptL.flatMap { e =>
          if (remaining <= 0L) Some((e, 0L))
          else if (e.rows <= remaining) { remaining -= e.rows; None }
          else { val j = remaining; remaining = 0L; Some((e, j)) }
        }
        StoreSink.lastOffsetPlan = Some((keptL.size, out.size))
        out
      case None => keptL.map((_, 0L))
    }
    StoreSink.lastZonePrune = Some((total, keptO.size))
    plannedCounts = Some((total, keptO.size))
    val isBucket = spec.exists(_.kind == "bucket")
    keptO.map { case (e, skip) => StoreFilePartition(
        new Path(root, e.name).toString,
        e.dv.map(d => new Path(root, d).toString), e.name,
        // the SPJ partition key is the raw value — tags are planning-only
        e.part.map(p => StoreSink.partTag(p)._2), isBucket,
        e.eq.map(q => new Path(root, q).toString), skip): InputPartition }
      .toArray
  }

  /** Manifest-derived stats: committed bytes (one listStatus per entry at
    * PLAN time) + exact row counts when every entry carries a zone map, so
    * broadcast decisions over the store are stats-driven. */
  override def estimateStatistics(): Statistics = {
    val root = new Path(pathStr)
    val fsys = StoreSink.fs(root)
    explicitFiles match {
      case Some(tokens) =>
        val bytes = tokens.filter(_.nonEmpty).map(_.split("[@#]")(0)).map { n =>
          try fsys.getFileStatus(new Path(root, n)).getLen catch {
            case _: java.io.FileNotFoundException => 0L
          }
        }.sum
        return new Statistics {
          override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
          override def numRows(): util.OptionalLong = util.OptionalLong.empty()
        }
      case None => ()
    }
    val entries = plannedCandidates(root, fsys)._2
      .filter(_.mayContain(kLo, kHi))
      .filter(_.mayContainA(aLo, aHi))
      .filter(e => statBounds.forall { case (c, lo, hi) =>
        e.mayContainStat(c, lo, hi) })
      .filter(e => strBounds.forall { case (c, lo, hi) =>
        e.mayContainStrStat(c, lo, hi) })
      .filter(e => grpConjuncts.forall(e.mayContainGrp))
      .filter(_.part.forall(partMayMatch))
    // manifest-carried byte counts — listStatus per file at plan time was
    // itself an O(files) driver cost; the RPC fallback only covers legacy
    // lines written before bytes rode the manifest
    val bytes = entries.map { e =>
      e.bytes.getOrElse(
        try fsys.getFileStatus(new Path(root, e.name)).getLen catch {
          case _: java.io.FileNotFoundException => 0L
        })
    }.sum
    val rows = if (entries.forall(_.rows >= 0)) Some(entries.map(_.rows).sum) else None
    // analyze-persisted NDV sketches → V2 column statistics: with CBO on,
    // the optimizer turns these into equality-filter selectivities
    // (rows/ndv) and hint-free broadcast decisions — the role ANALYZE
    // TABLE column stats play for catalog tables. Advisory: a stale sketch
    // skews estimates, never results.
    val ndv: Map[String, Long] = StoreSink.readProps(root, fsys).toMap
      .get(StoreSink.NdvProp).map(_.split(';').toSeq.flatMap { kv =>
        val i = kv.lastIndexOf(':')
        if (i <= 0) None else Some((kv.substring(0, i), kv.substring(i + 1).toLong))
      }.toMap).getOrElse(Map.empty)
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
      override def numRows(): util.OptionalLong =
        rows.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty())
      override def columnStats(): util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        readSchema().fields.foreach { f =>
          ndv.get(f.name).foreach { n =>
            m.put(org.apache.spark.sql.connector.expressions.Expressions
                .column(f.name),
              new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                override def distinctCount(): util.OptionalLong =
                  util.OptionalLong.of(n)
              })
          }
        }
        m
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // field-id layout resolution, driver-side at the PINNED version: a
    // renamed/dropped column reads correctly from every file generation
    val layout = StoreSink.layoutAt(pathStr, version)
    // statically-pushed bounds ride to the reader for WITHIN-FILE group
    // skipping (columnar files' per-group zone stats — the row-group
    // layer below manifest file pruning)
    val gBounds =
      (if (kLo.isDefined || kHi.isDefined) Seq(("k", kLo, kHi)) else Nil) ++
      (if (aLo.isDefined || aHi.isDefined) Seq(("amt_cents", aLo, aHi)) else Nil) ++
      statBounds
    // string equality/IN value sets for the dictionary pre-check: grp
    // conjuncts (exact literal sets) + trailing-string equalities
    val gStrSets =
      grpValues.map(vs => ("grp", vs.toSeq)) ++
      strBounds.collect { case (c, Some(lo), Some(hi)) if lo == hi =>
        (c, Seq(lo)) }
    StoreReaderFactory(required, table,
      layout.physTypes, layout.physDefaults, layout.proj, gBounds, gStrSets,
      strPrefixes)
  }

  /** Streaming READ: tail the manifest as an offset log. The manifest is
    * append-ordered (append/epoch commits extend it; only overwrite and
    * row-level rewrites rewrite history), so "files consumed so far" is a
    * valid offset — each micro-batch plans exactly the NEW manifest
    * entries, restart resumes from the committed file index, and a
    * history rewrite mid-tail (entry count shrinking below the consumed
    * prefix) fails loudly instead of silently re-reading. This closes the
    * store's log-structured loop: the same table is a batch source/sink,
    * a streaming sink (epoch ledger), and a streaming source (manifest
    * tail) — the CDC-feed shape every warehouse store grows eventually. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new StoreMicroBatchStream(pathStr, required, table, maxFilesPerTrigger)
}

/** File-count offset over the append-ordered manifest, plus the IDENTITY of
  * the consumed prefix (md5 over the first `files` entry names). Count alone
  * cannot see a history rewrite that preserves entry count: a copy-on-write
  * DELETE/UPDATE substitutes manifest lines IN PLACE, and an overwrite or
  * compaction can publish >= count files — either way a count-only guard
  * would silently hand a tailing reader rewritten or new-generation files
  * at already-consumed positions. The signature makes any prefix mutation a
  * loud failure. `sig` is None only for offsets deserialized from a
  * pre-signature checkpoint (legacy `<int>` JSON), which degrade to the
  * count-only check. */
private case class StoreStreamOffset(files: Int, sig: Option[String] = None)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = sig.fold(files.toString)(s => s"$files:$s")
}

private class StoreMicroBatchStream(pathStr: String,
                                    required: StructType = StoreSink.schema,
                                    table: StructType = StoreSink.schema,
                                    maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  private def root = new Path(pathStr)

  private def prefixSig(entries: Seq[StoreSink.StoreFileEntry], n: Int): String =
    // the TOKEN (name@dv), not the name: a merge-on-read delete of consumed
    // rows keeps the file name but changes its vector — that too is a
    // history rewrite for a tailing reader and must fail loudly
    StoreSink.md5Hex(entries.take(n).map(_.token).mkString("\n"))

  override def initialOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    StoreStreamOffset(0, Some(StoreSink.md5Hex("")))

  private def latestOffsetNow(): StoreStreamOffset = {
    val entries = StoreSink.readEntries(root, StoreSink.fs(root))
    StoreStreamOffset(entries.size, Some(prefixSig(entries, entries.size)))
  }

  override def latestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    latestOffsetNow()

  // ---- Trigger.AvailableNow (SupportsTriggerAvailableNow): backfill-drain
  // the manifest AS OF QUERY START, then terminate — the bounded catch-up
  // mode a store-to-store relay restarts with. The prepared snapshot is the
  // drain target; entries appended after prepare wait for the next run
  // (their prefix signature still validates, append-only). Without the
  // native hook Spark would wrap the source and re-poll latestOffset —
  // this pins the target ONCE, so a concurrent writer can't extend the
  // run indefinitely.
  @volatile private var availableTarget: Option[StoreStreamOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(latestOffsetNow())

  // ADMISSION CONTROL (SupportsAdmissionControl half): the
  // `maxFilesPerTrigger` read option caps each micro-batch's planned
  // window — bounded batch cost against an arbitrarily-backlogged
  // manifest, the file-source pacing knob on the store tail. Composes
  // with AvailableNow: the backfill drains to the pinned target in
  // ≤ maxFiles steps, then terminates.
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxFilesPerTrigger
      .map(org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles)
      .getOrElse(org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): org.apache.spark.sql.connector.read.streaming.Offset = {
    val target = availableTarget.getOrElse(latestOffsetNow())
    def capTo(maxFiles: Int): StoreStreamOffset = {
      val s0 = start.asInstanceOf[StoreStreamOffset].files
      val cap = math.min(target.files, s0 + maxFiles)
      if (cap >= target.files) target
      else {
        val entries = StoreSink.readEntries(root, StoreSink.fs(root))
        StoreStreamOffset(cap, Some(prefixSig(entries, cap)))
      }
    }
    limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        capTo(mf.maxFiles())
      case comp: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        comp.getReadLimits.collectFirst {
          case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles => mf
        }.map(mf => capTo(mf.maxFiles())).getOrElse(target)
      case _ => target
    }
  }

  override def reportLatestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    latestOffsetNow()

  override def deserializeOffset(json: String): org.apache.spark.sql.connector.read.streaming.Offset =
    json.trim.split(":", 2) match {
      case Array(n, s) => StoreStreamOffset(n.toInt, Some(s))
      case Array(n)    => StoreStreamOffset(n.toInt)
    }

  override def commit(end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      end: org.apache.spark.sql.connector.read.streaming.Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[StoreStreamOffset]
    val eo = end.asInstanceOf[StoreStreamOffset]
    val (a, b) = (so.files, eo.files)
    StoreSink.tailPlans.add((a, b))
    val entries = StoreSink.readEntries(root, StoreSink.fs(root))
    // a shrunk manifest shows up either as a backwards window (latest <
    // committed) or as a window past the current entry list — both mean
    // an overwrite/row-level rewrite destroyed consumed history
    require(a <= b && entries.size >= b,
      s"graft-store history rewritten during tail: manifest has ${entries.size} " +
        s"entries, batch window is [$a, $b) — streaming reads require an " +
        "append-only store")
    // in-place rewrites keep the count: verify the consumed prefix is the
    // SAME files the offsets were taken against, at both window ends
    def check(n: Int, sig: Option[String], which: String): Unit = sig.foreach { s =>
      require(prefixSig(entries, n) == s,
        s"graft-store history rewritten during tail: the first $n manifest " +
          s"entries no longer match the $which offset's recorded prefix — " +
          "a copy-on-write delete/update/compaction rewrote consumed files; " +
          "streaming reads require an append-only store")
    }
    check(a, so.sig, "start")
    check(b, eo.sig, "end")
    entries.slice(a, b)
      .map(e => StoreFilePartition(new Path(root, e.name).toString,
        e.dv.map(d => new Path(root, d).toString), e.name,
        eqFile = e.eq.map(q => new Path(root, q).toString)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val layout = StoreSink.layoutAt(pathStr, None)
    StoreReaderFactory(required, table,
      layout.physTypes, layout.physDefaults, layout.proj)
  }
}

/** One committed data file; `dv` is its deletion-vector sidecar path, when
  * merge-on-read deletes masked it; `rel` is its manifest-relative name
  * (partition dir included). `partValue`/`partIsBucket` carry the file's
  * partition key for storage-partitioned joins — `partitionKey()` is only
  * consulted when the scan reported KeyGroupedPartitioning, which it does
  * exactly when every planned entry has a value. */
private case class StoreFilePartition(file: String, dv: Option[String] = None,
                                      rel: String = "",
                                      partValue: Option[String] = None,
                                      partIsBucket: Boolean = false,
                                      eqFile: Option[String] = None,
                                      skipRows: Long = 0L)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    partValue.map(v => StoreSink.partKeyRow(v, partIsBucket)).orNull
}

private case class StoreReaderFactory(required: StructType = StoreSink.schema,
                                      table: StructType = StoreSink.schema,
                                      physTypes: Array[DataType] = null,
                                      physDefaults: Array[Any] = null,
                                      proj: Array[Int] = null,
                                      gBounds: Seq[(String, Option[Long], Option[Long])] = Nil,
                                      gStrSets: Seq[(String, Seq[String])] = Nil,
                                      gStrPrefixes: Seq[(String, String)] = Nil)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[StoreFilePartition]
    val p = new Path(part.file)
    val fsys = StoreSink.fs(p, new Configuration())
    // deletion-vector mask: physical line ordinals to skip (merge-on-read)
    val masked: java.util.BitSet = part.dv match {
      case Some(d) =>
        val bs = new java.util.BitSet()
        StoreSink.readDv(p.getParent, fsys, new Path(d).getName).foreach(bs.set)
        bs
      case None => new java.util.BitSet()
    }
    // equality-delete mask: rows whose KEY is in the sidecar are dead
    // (merge-on-read by value — the delete never read this file)
    val eqKeys: Array[Long] = part.eqFile match {
      case Some(f) =>
        StoreSink.readEq(p.getParent, fsys, new Path(f).getName).sorted
      case None => Array.emptyLongArray
    }
    val fileName = UTF8String.fromString(p.getName)
    // PHYSICAL layout (tombstoned slots included): decode walks every
    // physical slot; the projection maps logical ordinals to slots (field-id
    // resolution — a renamed column keeps its slot, a dropped one keeps its
    // width). Legacy construction (null) = the layouts coincide.
    val types = if (physTypes != null) physTypes else table.fields.map(_.dataType)
    val slotOf: Array[Int] =
      if (proj != null) proj else Array.tabulate(table.fields.length)(i => i)
    // initial defaults for short (pre-ALTER) rows, resolved once per file —
    // indexed by PHYSICAL slot (dead slots pad NULL, never a default)
    val defaults =
      if (physDefaults != null) physDefaults else StoreSink.defaultsOf(table)
    // encoding sniff: files are self-identifying, so one manifest can carry
    // text and columnar generations side by side (encoding flips, travel,
    // compaction of mixed inputs)
    val rawIn = fsys.open(p)
    val fileLen = fsys.getFileStatus(p).getLen
    StoreSink.readColGroups(rawIn, fileLen) match {
      case Some(groups) =>
        // COLUMNAR: read ONLY the projected slots' blocks (plus the key
        // block when an equality mask must be evaluated) — a narrow
        // projection's I/O and parse cost scale with the columns it asks
        // for, not the table's width. COUNT(*)-shaped scans (no required
        // columns, no eq mask) read the headers alone. Groups load
        // LAZILY, one at a time — reader memory is bounded by the
        // group-size knob, never the file. Row ordinals run ACROSS
        // groups (dv masks are file-wide).
        val needSlots: Array[Int] = required.fieldNames
          .filter(n => n != "_file" && n != "_pos")
          .map(n => slotOf(table.fieldIndex(n)))
        val want = if (eqKeys.isEmpty) needSlots else needSlots :+ 0
        // GROUP SKIPPING from per-group zone stats: bounds come ONLY from
        // statically-pushed scan filters (which stay residual — Spark
        // re-evaluates them post-scan, so dropping a group every row of
        // which fails them is sound). Row-level op scans never receive
        // static pushdown (their ScanBuilder is a bare lambda), so a COW
        // rewrite always reads whole files. Resolved to PHYSICAL slots
        // here; legacy headers without stats never skip.
        val skipBounds: Array[(Int, Long, Long)] = gBounds.flatMap {
          case (n, lo, hi) if table.fieldNames.contains(n) =>
            val s = slotOf(table.fieldIndex(n))
            if (s >= 0 && s < types.length &&
                (types(s) == LongType || types(s) == IntegerType))
              Some((s, lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue)))
            else None
          case _ => None
        }.toArray
        // DICTIONARY pre-checks: a pushed string equality/IN whose values
        // are ALL absent from a dict-encoded block's dictionary skips the
        // group after reading that one block (the parquet dictionary-page
        // filter shape). Values compare in their AT-REST (URL-encoded)
        // form. Sound for the same residual-filter reason as the zone
        // skip above.
        val dictChecks: Array[(Int, Array[String])] = gStrSets.flatMap {
          case (n, vs) if vs.nonEmpty && table.fieldNames.contains(n) =>
            val s = slotOf(table.fieldIndex(n))
            if (s >= 0 && s < types.length && types(s) == StringType)
              Some((s, vs.map(v =>
                java.net.URLEncoder.encode(v, "UTF-8")).toArray))
            else None
          case _ => None
        }.toArray
        // LIKE-'p%' dictionary pre-checks (round-12 verdict #7): URL
        // encoding is per-character, so encoded(x).startsWith(encoded(p))
        // iff x.startsWith(p) — the prefix test runs on at-rest values.
        // Each pushed prefix is an independent conjunct: a dictionary
        // with no value under it fails every row of the group.
        val dictPrefixChecks: Array[(Int, String)] = gStrPrefixes.flatMap {
          case (n, p) if p.nonEmpty && table.fieldNames.contains(n) =>
            val s = slotOf(table.fieldIndex(n))
            if (s >= 0 && s < types.length && types(s) == StringType)
              Some((s, java.net.URLEncoder.encode(p, "UTF-8")))
            else None
          case _ => None
        }.toArray
        new PartitionReader[InternalRow] {
          private var gi = -1
          private var gRows = 0
          private var rowInG = 0 // next unread row within the group
          private var cur = -1   // the row get() reads
          private var keyBlock: StoreSink.ColValues = _
          private var colGetters: Array[Int => Any] = _
          private var ord = -1
          private var toSkip = part.skipRows
          private var gRead = 0 // groups actually decoded (observability)
          // blocks decoded by the CURRENT group's dict pre-check — reused
          // by readColBlocks when the group survives (read-once)
          private var preRead: Map[Int, StoreSink.ColValues] = Map.empty
          private def dictBlock(h: StoreSink.ColHeader, s: Int): StoreSink.ColValues =
            preRead.getOrElse(s, {
              val x = StoreSink.readOneBlock(rawIn, h, s)
              preRead += s -> x; x
            })
          private def groupExcluded(h: StoreSink.ColHeader): Boolean =
            skipBounds.exists { case (s, lo, hi) =>
              h.gstats.get(s).exists { case (mn, mx) => mx < lo || mn > hi }
            } || (dictChecks.nonEmpty && dictChecks.exists { case (s, vs) =>
              h.hasDict(s) &&
                dictBlock(h, s).dictValues.exists(d => !vs.exists(d.contains))
            }) || (dictPrefixChecks.nonEmpty &&
              dictPrefixChecks.exists { case (s, p) =>
                h.hasDict(s) &&
                  dictBlock(h, s).dictValues.exists(d => !d.exists(_.startsWith(p)))
              })
          private def loadGroup(): Boolean = {
            gi += 1
            preRead = Map.empty
            while (gi < groups.length &&
                   (skipBounds.nonEmpty || dictChecks.nonEmpty ||
                    dictPrefixChecks.nonEmpty) &&
                   part.skipRows == 0L && groupExcluded(groups(gi))) {
              // every row of this group fails a pushed predicate: skip its
              // blocks entirely, but ordinals are FILE-wide — advance past
              // the group's rows so dv masks keep lining up
              ord += groups(gi).nrows
              gi += 1
              preRead = Map.empty
            }
            if (gi >= groups.length) return false
            gRead += 1
            val blocks = StoreSink.readColBlocks(rawIn, groups(gi), want, preRead)
            keyBlock = blocks.getOrElse(0, null)
            // per-column typed getters parse straight from the block text
            // by offset — no per-value String materialization
            colGetters = required.fieldNames.map {
              case "_file" => (_: Int) => fileName
              // ord is the file-wide PHYSICAL ordinal of the row get()
              // reads (next() leaves it on the returned row) — dv-masked
              // and group-skipped ordinals advance it, so _pos never
              // renumbers under merge-on-read
              case "_pos" => (_: Int) => java.lang.Long.valueOf(ord.toLong)
              case n =>
                val s = slotOf(table.fieldIndex(n))
                blocks.get(s) match {
                  case Some(b) => types(s) match {
                    case LongType => (r: Int) =>
                      if (b.isNull(r)) null else java.lang.Long.valueOf(b.long(r))
                    case IntegerType => (r: Int) =>
                      if (b.isNull(r)) null
                      else java.lang.Integer.valueOf(b.long(r).toInt)
                    case StringType => (r: Int) =>
                      if (b.isNull(r)) null
                      else UTF8String.fromString(
                        java.net.URLDecoder.decode(b.raw(r), "UTF-8"))
                    case dt if StoreSink.isFarr(dt) => (r: Int) =>
                      if (b.isNull(r)) null else StoreSink.hexToFloats(b.raw(r))
                    case other =>
                      throw new IllegalArgumentException(s"unsupported type $other")
                  }
                  case None => // file predates the column: initial default
                    val d = defaults(s); (_: Int) => d
                }
            }
            gRows = groups(gi).nrows
            rowInG = 0
            true
          }
          override def next(): Boolean = {
            while (true) {
              if (gi < 0 || rowInG >= gRows) {
                if (!loadGroup()) return false
              } else {
                val r = rowInG
                rowInG += 1
                ord += 1
                if (!masked.get(ord)) {
                  val eqDead = eqKeys.nonEmpty && keyBlock != null &&
                    !keyBlock.isNull(r) &&
                    java.util.Arrays.binarySearch(eqKeys, keyBlock.long(r)) >= 0
                  if (!eqDead) {
                    if (toSkip > 0L) toSkip -= 1 else { cur = r; return true }
                  }
                }
              }
            }
            false
          }
          override def get(): InternalRow = {
            // direct fill: one row allocation, no per-row Seq
            val vals = new Array[Any](colGetters.length)
            var i = 0
            while (i < colGetters.length) { vals(i) = colGetters(i)(cur); i += 1 }
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
          }
          override def close(): Unit = {
            StoreSink.addColGroups(gRead, groups.length)
            rawIn.close()
          }
        }
      case None => textReader(rawIn, part, fileName, types, slotOf, defaults,
        masked, eqKeys)
    }
  }

  /** Row-text read path (the original at-rest encoding). */
  private def textReader(stream: org.apache.hadoop.fs.FSDataInputStream,
                         part: StoreFilePartition, fileName: UTF8String,
                         types: Array[DataType], slotOf: Array[Int],
                         defaults: Array[Any], masked: java.util.BitSet,
                         eqKeys: Array[Long]): PartitionReader[InternalRow] = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(stream, StandardCharsets.UTF_8))
    // resolve the projection ONCE per partition: table columns come from
    // the decoded (null-padded) row by their PHYSICAL slot; _file is
    // partition-constant metadata
    // file-wide physical ordinal — hoisted so the _pos getter shares it
    // with the read loop (masked ordinals advance it: _pos never
    // renumbers under merge-on-read)
    var ord = -1
    val getters: Array[InternalRow => Any] = required.fieldNames.map {
      case "_file" => (_: InternalRow) => fileName
      case "_pos" => (_: InternalRow) => java.lang.Long.valueOf(ord.toLong)
      case n =>
        val idx = slotOf(table.fieldIndex(n))
        val dt = types(idx)
        (r: InternalRow) => r.get(idx, dt)
    }
    val identity = required == table && types.length == table.fields.length
    new PartitionReader[InternalRow] {
      private var line: String = _
      private var decoded: InternalRow = _
      // pushed-offset boundary skip: drop this many LIVE rows first
      private var toSkip = part.skipRows
      override def next(): Boolean = {
        while (true) {
          line = in.readLine(); ord += 1
          while (line != null && masked.get(ord)) {
            line = in.readLine(); ord += 1
          }
          if (line == null) return false
          if (eqKeys.isEmpty) {
            decoded = null
            if (toSkip > 0L) toSkip -= 1 else return true
          } else {
            // the key mask needs the decoded row; cache it for get()
            decoded = StoreSink.decode(line, types, defaults)
            if (decoded.isNullAt(0) ||
                java.util.Arrays.binarySearch(eqKeys, decoded.getLong(0)) < 0) {
              if (toSkip > 0L) toSkip -= 1 else return true
            }
          }
        }
        false
      }
      override def get(): InternalRow = {
        val full =
          if (decoded != null) decoded
          else StoreSink.decode(line, types, defaults)
        if (identity) full
        else {
          val vals = new Array[Any](getters.length)
          var i = 0
          while (i < getters.length) { vals(i) = getters(i)(full); i += 1 }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        }
      }
      override def close(): Unit = in.close()
    }
  }
}

// ------------------------------------------------------ streaming change feed

/** STREAMING CHANGE DATA FEED over the store (`option("changeFeed",
  * "true")` + readStream — the Delta CDF streaming read, reconstructed
  * from version manifests alone): offsets are COMMIT VERSIONS, and each
  * micro-batch emits the row changes of the versions in its window as
  * (op, cv, row) — `insert`/`delete`, with an update surfacing as its
  * delete+insert pair.
  *
  * Per version transition the FILE-token diff decides the work, and the
  * merge-on-read sidecars make most of it METADATA-SIZED:
  *  - a genuinely new file emits its live rows as inserts;
  *  - a fully removed file emits its previously-live rows as deletes;
  *  - a file whose MASKS changed (deletion-vector or equality sidecar —
  *    the delta-protocol write paths) emits ONLY the newly-dead rows as
  *    deletes: the feed's cost for a keyed CDC commit is the changed
  *    rows, never the file.
  * A copy-on-write rewrite (same rows, new file) emits carried-over rows
  * as delete+insert pairs — fold-correct (they cancel in any additive
  * consumer, the IVM contract) though not row-minimal; the batch
  * [[StoreSink.changes]] nets them when minimality matters.
  *
  * Schema changes between versions are handled the schema-aware-CDF way:
  * each partition decodes under ITS version's archived layout and
  * projects BY NAME onto the feed's fixed output schema (resolved at
  * query start). Restart resumes from the committed version offset;
  * vacuumed versions fail loudly via readVersionLines. At 100 TB this is
  * the downstream-mart feed: per-commit cost tracks CHANGED rows/files,
  * and the driver never lists data directories — versions and sidecars
  * are the whole metadata surface. */
private class StoreCdfTable(pathStr: String, startV: Option[Int])
    extends Table with SupportsRead {
  override def name(): String = s"graft_store_cdf($pathStr)"
  override def schema(): StructType = StoreSink.cdfSchema(pathStr)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val out = schema()
    () => new Scan {
      override def readSchema(): StructType = out
      override def description(): String = s"GraftStoreCdfScan($pathStr)"
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new StoreCdfStream(pathStr, out, startV)
    }
  }
}

private case class StoreCdfOffset(v: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

/** One change-feed partition: one file read under ITS version's physical
  * layout, mask-filtered, emitted with a constant (op, cv) prefix and a
  * by-name projection onto the feed schema. Mask arrays are resolved
  * DRIVER-side from the (small) sidecars. */
private case class StoreCdfPartition(file: String, op: String, cv: Long,
                                     skipOrdinals: Array[Int],
                                     skipKeys: Array[Long],
                                     onlyOrdinals: Array[Int],
                                     onlyKeys: Array[Long],
                                     physTypes: Array[DataType],
                                     physDefaults: Array[Any],
                                     colNames: Array[String],
                                     colSlots: Array[Int])
    extends InputPartition

private class StoreCdfStream(pathStr: String, output: StructType,
                             startV: Option[Int])
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def root = new Path(pathStr)
  private def fsys = StoreSink.fs(root)

  private def headVersion: Int =
    StoreSink.listVersions(root, fsys).lastOption.getOrElse(0)

  override def initialOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    StoreCdfOffset(startV.getOrElse(headVersion))

  @volatile private var availableTarget: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(headVersion)

  override def latestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    StoreCdfOffset(availableTarget.getOrElse(headVersion))

  // SupportsTriggerAvailableNow extends SupportsAdmissionControl: the
  // 2-arg form is what Spark actually calls; version windows are cheap,
  // so no admission cap — all available versions per batch
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): org.apache.spark.sql.connector.read.streaming.Offset =
    StoreCdfOffset(availableTarget.getOrElse(headVersion))

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def deserializeOffset(json: String): org.apache.spark.sql.connector.read.streaming.Offset =
    StoreCdfOffset(json.toInt)

  override def commit(end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()

  private def entriesAt(v: Int): Seq[StoreSink.StoreFileEntry] =
    if (v <= 0) Nil
    else StoreSink.readVersionLines(root, fsys, v)
      .filterNot(_.startsWith("#")).map(StoreSink.parseEntry)

  private def layoutFor(v: Int): (StoreSink.StoreLayout, Array[String]) = {
    val at = Some(math.max(v, 1))
    val layout = StoreSink.layoutAt(pathStr, at)
    val names = StoreSink.tableSchema(pathStr, at).fieldNames
    (layout, names)
  }

  private def dvOf(e: StoreSink.StoreFileEntry): Set[Int] =
    e.dv.map(d => StoreSink.readDv(root, fsys, d).toSet).getOrElse(Set.empty)
  private def eqOf(e: StoreSink.StoreFileEntry): Set[Long] =
    e.eq.map(q => StoreSink.readEq(root, fsys, q).toSet).getOrElse(Set.empty)

  override def planInputPartitions(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      end: org.apache.spark.sql.connector.read.streaming.Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[StoreCdfOffset].v
    val b = end.asInstanceOf[StoreCdfOffset].v
    (a + 1 to b).flatMap { v =>
      val prev = entriesAt(v - 1)
      val cur = entriesAt(v)
      val curByToken = cur.map(e => e.token -> e).toMap
      val prevByToken = prev.map(e => e.token -> e).toMap
      val curByName = cur.map(e => e.name -> e).toMap
      val prevByName = prev.map(e => e.name -> e).toMap
      val (oldLayout, oldNames) = layoutFor(v - 1)
      val (newLayout, newNames) = layoutFor(v)
      def part(e: StoreSink.StoreFileEntry, op: String,
               layout: StoreSink.StoreLayout, names: Array[String],
               skipO: Set[Int], skipK: Set[Long],
               onlyO: Array[Int], onlyK: Array[Long]): InputPartition =
        StoreCdfPartition(new Path(root, e.name).toString, op, v.toLong,
          skipO.toArray.sorted, skipK.toArray.sorted, onlyO.sorted,
          onlyK.sorted, layout.physTypes, layout.physDefaults, names,
          layout.proj)
      val deletes = prev.filterNot(e => curByToken.contains(e.token)).flatMap { e =>
        curByName.get(e.name) match {
          case Some(ne) =>
            // same file, masks grew (the merge-on-read delta paths): emit
            // ONLY the newly-dead rows — cost tracks changed rows
            val dvDelta = dvOf(ne) -- dvOf(e)
            val eqDelta = eqOf(ne) -- eqOf(e)
            val fromDv =
              if (dvDelta.isEmpty) Nil
              else Seq(part(e, "delete", oldLayout, oldNames,
                Set.empty, eqOf(e), dvDelta.toArray, Array.emptyLongArray))
            val fromEq =
              if (eqDelta.isEmpty) Nil
              else Seq(part(e, "delete", oldLayout, oldNames,
                // skip the NEW vector (old ∪ delta), not just the old one:
                // a row newly dead under BOTH masks in this transition
                // (ordinal in dvDelta AND key in eqDelta) is emitted by the
                // dv-delta partition above — emitting it here too would
                // double-count the delete downstream (IVM folds, CDC sinks)
                dvOf(ne), Set.empty, Array.emptyIntArray, eqDelta.toArray))
            fromDv ++ fromEq
          case None => // file gone: its previously-live rows are deletes
            Seq(part(e, "delete", oldLayout, oldNames,
              dvOf(e), eqOf(e), Array.emptyIntArray, Array.emptyLongArray))
        }
      }
      val inserts = cur.filterNot(e => prevByToken.contains(e.token))
        .filterNot(e => prevByName.contains(e.name)) // mask-only change
        .map(e => part(e, "insert", newLayout, newNames,
          dvOf(e), eqOf(e), Array.emptyIntArray, Array.emptyLongArray))
      deletes ++ inserts
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    StoreCdfReaderFactory(output)
}

private case class StoreCdfReaderFactory(output: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StoreCdfPartition]
    val path = new Path(p.file)
    val fsys = StoreSink.fs(path, new Configuration())
    // encoding-agnostic row view: the feed projects EVERY output column,
    // so the full-width line iterator is the right cost model here
    val (lines, closer) = StoreSink.openDataLines(fsys, path)
    val opU = UTF8String.fromString(p.op)
    // by-name projection onto the feed schema: op/cv constants, then each
    // output column resolves through THIS partition's version schema
    // (absent-at-that-version columns read NULL)
    val getters: Array[InternalRow => Any] = output.fields.drop(2).map { f =>
      val i = p.colNames.indexWhere(_ == f.name)
      if (i < 0) (_: InternalRow) => null
      else {
        val slot = p.colSlots(i)
        val dt = p.physTypes(slot)
        (r: InternalRow) => r.get(slot, dt)
      }
    }
    new PartitionReader[InternalRow] {
      private var line: String = _
      private var ord = -1
      private var decoded: InternalRow = _
      private def keyOf(r: InternalRow): Option[Long] =
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      override def next(): Boolean = {
        while (true) {
          if (!lines.hasNext) return false
          line = lines.next(); ord += 1
          if (java.util.Arrays.binarySearch(p.skipOrdinals, ord) < 0 &&
              (p.onlyOrdinals.isEmpty ||
               java.util.Arrays.binarySearch(p.onlyOrdinals, ord) >= 0)) {
            decoded = StoreSink.decode(line, p.physTypes, p.physDefaults)
            val k = keyOf(decoded)
            val skippedByKey = k.exists(x =>
              java.util.Arrays.binarySearch(p.skipKeys, x) >= 0)
            val onlyKeyMiss = p.onlyKeys.nonEmpty && !k.exists(x =>
              java.util.Arrays.binarySearch(p.onlyKeys, x) >= 0)
            if (!skippedByKey && !onlyKeyMiss) return true
          }
        }
        false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(opU +: java.lang.Long.valueOf(p.cv) +:
          getters.toSeq.map(_(decoded)))
      override def close(): Unit = closer()
    }
  }
}
