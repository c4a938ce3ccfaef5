package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom catalog plugin (`TableCatalog`) — the tenth custom-Catalyst kind:
  * the NAMESPACE the connector family plugs into. With
  * `spark.sql.catalog.graft=graft.sources.GraftCatalog` set (a plain conf —
  * settable at runtime; catalogs resolve lazily), the engine's DSv2 tables
  * become SQL-addressable with no DataFrame-API setup:
  *
  * {{{
  *   SELECT ... FROM graft.range_200k
  *   SELECT ... FROM graft.bucket_fact f JOIN graft.bucket_dim d USING (grp)
  * }}}
  *
  * This is the deployment surface a query SERVICE needs — analysts address
  * `graft.<table>` like any warehouse table, and every pushdown/partitioning
  * contract the underlying connectors implement (filter/column/aggregate
  * pushdown, runtime filtering, KeyGroupedPartitioning for
  * storage-partitioned joins) rides along unchanged, because the catalog
  * returns the very same Table instances the path-based API builds.
  *
  * Catalog inventory (fixed, read-only — a metastore-backed deployment
  * would resolve identifiers against its manifest store instead):
  *   - `range_200k`  — RangeTable(0, 200000)   (filter/column/agg pushdown)
  *   - `bucket_fact` — BucketTable(40000, 8)   (reports grp partitioning)
  *   - `bucket_dim`  — BucketTable(8, 8)       (reports grp partitioning)
  */
object GraftCatalog {
  /** Session conf holding the directory `graft.store` resolves to. */
  val StorePathKey = "spark.sql.graft.store.path"
  /** Session conf naming a `_catalog` snapshot root: when set, SQL reads
    * of store-backed tables pin to the snapshot's versions (multi-table
    * read atomicity from plain SQL). */
  val CatalogPinKey = "spark.sql.graft.store.catalog"

  /** Session conf holding the directory CTAS-created tables live under
    * (`CREATE TABLE graft.<name> AS SELECT ...` → `<dir>/<name>`). */
  val CtasDirKey = "spark.sql.graft.ctas.dir"

  /** Marker file that makes `<ctas.dir>/<ns>` a NAMESPACE (its `k=v` lines
    * are the namespace properties). A directory without it is a table (a
    * committed manifest) or garbage — never silently a namespace. */
  val NsMarker = "_namespace"
}

class GraftCatalog extends CatalogPlugin with TableCatalog with FunctionCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces {

  // ------------------------------------------- ProcedureCatalog (CALL ...)
  /** STORED PROCEDURES: the store's maintenance operations exposed at the
    * SQL surface — `CALL graft.compact(path, target_rows)` and
    * `CALL graft.vacuum(path, keep_versions)` — the way a production table
    * format ships OPTIMIZE/VACUUM (Iceberg's CALL procedures). Each is a
    * BoundProcedure whose call() runs the maintenance op and returns its
    * audit row through a LocalScan, so `CALL` results compose like any
    * query result: the operator gets back (files_before, files_after) or
    * (versions_kept, live_files), not a silent side effect. */
  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    Array("abandon", "analyze", "cherry_pick", "compact", "compact_if",
      "expire", "export", "export_delta", "fsck", "history",
      "index_build", "index_expire", "index_rebuild_if", "index_refresh",
      "maintain",
      "publish",
      "publish_all",
      "remove_orphans", "repartition_spec", "rollback", "tag",
      "text_index_build", "text_index_rebuild_if", "text_index_refresh",
      "txn_recover",
      "zorder", "zorder_by", "vacuum").map(Identifier.of(Array.empty, _))
  }

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!inDefaultNs(ident))
      throw new NoSuchTableException(ident) // no namespaced procedures
    ident.name().toLowerCase(java.util.Locale.ROOT) match {
      case "abandon" => AbandonProcedure
      case "analyze" => AnalyzeProcedure
      case "cherry_pick" => CherryPickProcedure
      case "compact" => CompactProcedure
      case "compact_if" => CompactIfProcedure
      case "maintain" => MaintainProcedure
      case "expire" => ExpireProcedure
      case "export" => ExportProcedure
      case "export_delta" => ExportDeltaProcedure
      case "fsck" => FsckProcedure
      case "history" => HistoryProcedure
      case "remove_orphans" => RemoveOrphansProcedure
      case "repartition_spec" => RepartitionSpecProcedure
      case "publish_all" => PublishAllProcedure
      case "txn_recover" => TxnRecoverProcedure
      case "index_build" => IndexBuildProcedure
      case "index_expire" => IndexExpireProcedure
      case "index_refresh" => IndexRefreshProcedure
      case "index_rebuild_if" => IndexRebuildIfProcedure
      case "text_index_build" => TextIndexBuildProcedure
      case "text_index_rebuild_if" => TextIndexRebuildIfProcedure
      case "text_index_refresh" => TextIndexRefreshProcedure
      case "publish" => PublishProcedure
      case "rollback" => RollbackProcedure
      case "tag"     => TagProcedure
      case "vacuum"  => VacuumProcedure
      case "zorder"  => ZorderProcedure
      case "zorder_by" => ZorderByProcedure
      case _ => throw new UnsupportedOperationException(
        s"unknown procedure ${ident.name()} " +
          "(abandon | analyze | cherry_pick | compact | expire | history | " +
          "publish | remove_orphans | rollback | " +
          "tag | vacuum | zorder | zorder_by)")
    }
  }

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** DEFAULT-value DDL (`ADD COLUMN x BIGINT DEFAULT 5`) and table
    * constraints (`ADD CONSTRAINT c CHECK (...)`) are accepted — without
    * these capabilities Spark rejects the syntax before the catalog ever
    * sees it. */
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT)

  private def tables: Map[String, () => Table] = Map(
    "range_200k" -> (() => new RangeTable(0L, 200000L)),
    "bucket_fact" -> (() => new BucketTable(40000L, 8)),
    "bucket_dim" -> (() => new BucketTable(8L, 8)),
    // The keyed store, addressable for row-level SQL (DELETE FROM
    // graft.store ...). The path binds at RESOLUTION time from the session
    // conf — loadTable runs per analysis, so a query sequence can point
    // `graft.store` at its own store root without re-registering the
    // catalog (a metastore-backed deployment would resolve the location
    // from its manifest store the same way).
    "store" -> (() => {
      val p = org.apache.spark.sql.SparkSession.active.conf
        .getOption(GraftCatalog.StorePathKey)
        .getOrElse(throw new NoSuchTableException(
          Identifier.of(Array.empty, "store")))
      pinnedStoreTable(p)
    }))

  /** CATALOG-PINNED SQL READS (round-12 verdict #3): with
    * `spark.sql.graft.store.catalog = <catalogPath>` set on the session,
    * every store-backed table this catalog resolves loads AT the version
    * the `_catalog` snapshot pointer pins for its path — so a plain SQL
    * join of `graft.a` with `graft.b` sees the all-old or all-new state
    * of a racing `publish_all`, never a torn mix (the API-side
    * readCatalogSnapshot + atVersion contract, now reachable from SQL).
    * Tables the snapshot doesn't name read their head as before. Pinned
    * resolutions are read-only snapshots — a pinned session is a reader
    * by construction (the version-AS-OF write refusal applies). */
  private def pinnedStoreTable(path: String): StoreTable =
    org.apache.spark.sql.SparkSession.active.conf
      .getOption(GraftCatalog.CatalogPinKey)
      .flatMap(c => StoreSink.readCatalogSnapshot(c).get(path)) match {
      case Some(v) => new StoreTable(path, Some(v), viaCatalog = true)
      case None => new StoreTable(path, viaCatalog = true)
    }

  private def inDefaultNs(ident: Identifier): Boolean =
    ident.namespace().isEmpty

  /** An identifier this catalog can resolve at all: the default namespace,
    * or a single-level namespace that EXISTS (a `_namespace` marker under
    * the CTAS dir). Deeper nesting is declined loudly at the namespace
    * APIs, so it can't reach table resolution. */
  private def inKnownNs(ident: Identifier): Boolean =
    inDefaultNs(ident) || namespaceExists(ident.namespace())

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.isEmpty)
      tables.keys.toArray.sorted.map(Identifier.of(Array.empty, _))
    else if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    else {
      // a namespace's tables = its subdirectories holding a committed
      // manifest — visibility stays "the manifest exists", same as CTAS
      val dir = nsDir(namespace(0)).get
      val fsys = StoreSink.fs(dir)
      if (!fsys.exists(dir)) Array.empty
      else fsys.listStatus(dir).filter(_.isDirectory)
        .filter(st => fsys.exists(
          new org.apache.hadoop.fs.Path(st.getPath, StoreSink.Manifest)))
        .map(st => Identifier.of(namespace, st.getPath.getName))
        .sortBy(_.name())
    }
  }

  // ---------------------------------------------------- SupportsNamespaces
  /** NAMESPACE DDL (`CREATE/SHOW/DROP NAMESPACE`, `SHOW TABLES IN graft.ns`)
    * — the missing level between "one flat CTAS dir" and a real warehouse
    * layout. A namespace is a directory under the CTAS dir carrying a
    * `_namespace` marker file (its `k=v` lines are the namespace
    * properties); tables inside are ordinary store directories, so every
    * write/commit/maintenance contract is unchanged — the namespace is pure
    * resolution. At 100 TB this is the layer a metastore would own; the
    * marker-file form keeps the same semantics with O(1) metadata per
    * namespace and no listing beyond the addressed level. */
  private def ctasRoot: Option[String] =
    org.apache.spark.sql.SparkSession.active.conf
      .getOption(GraftCatalog.CtasDirKey)

  private def nsDir(ns: String): Option[org.apache.hadoop.fs.Path] =
    ctasRoot.map(d => new org.apache.hadoop.fs.Path(
      s"$d/${ns.toLowerCase(java.util.Locale.ROOT)}"))

  private def nsMarkerPath(ns: String): Option[org.apache.hadoop.fs.Path] =
    nsDir(ns).map(new org.apache.hadoop.fs.Path(_, GraftCatalog.NsMarker))

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (namespace.length == 1 &&
      nsMarkerPath(namespace(0)).exists(p => StoreSink.fs(p).exists(p)))

  override def listNamespaces(): Array[Array[String]] =
    ctasRoot.toArray.flatMap { d =>
      val root = new org.apache.hadoop.fs.Path(d)
      val fsys = StoreSink.fs(root)
      if (!fsys.exists(root)) Array.empty[Array[String]]
      else fsys.listStatus(root).filter(_.isDirectory)
        .filter(st => fsys.exists(
          new org.apache.hadoop.fs.Path(st.getPath, GraftCatalog.NsMarker)))
        .map(st => Array(st.getPath.getName))
        .sortBy(_(0))
    }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // single-level only
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace) || namespace.isEmpty)
      throw new NoSuchNamespaceException(namespace)
    val p = nsMarkerPath(namespace(0)).get
    val fsys = StoreSink.fs(p)
    val props = new util.HashMap[String, String]()
    val in = fsys.open(p)
    val txt = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    txt.split("\n").filter(_.contains('=')).foreach { line =>
      val i = line.indexOf('=')
      props.put(line.substring(0, i), line.substring(i + 1))
    }
    props.put("location", nsDir(namespace(0)).get.toString)
    props
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1,
      s"graft namespaces are single-level, got ${namespace.mkString(".")}")
    val ns = namespace(0).toLowerCase(java.util.Locale.ROOT)
    require(ns.matches("[a-z_][a-z0-9_]*"),
      s"invalid namespace name: $ns")
    val dir = nsDir(ns).getOrElse(throw new IllegalStateException(
      s"set ${GraftCatalog.CtasDirKey} to enable namespaces"))
    val fsys = StoreSink.fs(dir)
    if (namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NamespaceAlreadyExistsException(
        Array(name(), ns))
    // a directory already holding a committed manifest is a TABLE — a
    // namespace may not shadow it
    require(!fsys.exists(new org.apache.hadoop.fs.Path(dir, StoreSink.Manifest)),
      s"a table already exists at $dir")
    fsys.mkdirs(dir)
    writeNsMarker(ns, {
      import scala.jdk.CollectionConverters._
      metadata.asScala.toSeq
    })
  }

  private def writeNsMarker(ns: String, props: Seq[(String, String)]): Unit = {
    val p = nsMarkerPath(ns).get
    val fsys = StoreSink.fs(p)
    val out = fsys.create(p, true)
    try out.write(props.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit = {
    if (!namespaceExists(namespace) || namespace.isEmpty)
      throw new NoSuchNamespaceException(namespace)
    import scala.jdk.CollectionConverters._
    var props = loadNamespaceMetadata(namespace).asScala.toMap - "location"
    changes.foreach {
      case set: org.apache.spark.sql.connector.catalog.NamespaceChange.SetProperty =>
        props = props + (set.property() -> set.value())
      case rm: org.apache.spark.sql.connector.catalog.NamespaceChange.RemoveProperty =>
        props = props - rm.property()
      case other => throw new UnsupportedOperationException(
        s"unsupported namespace change: $other")
    }
    writeNsMarker(namespace(0).toLowerCase(java.util.Locale.ROOT), props.toSeq)
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    if (!namespaceExists(namespace) || namespace.isEmpty) false
    else {
      if (!cascade && listTables(namespace).nonEmpty)
        throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
          Array(name()) ++ namespace)
      val dir = nsDir(namespace(0)).get
      StoreSink.fs(dir).delete(dir, true)
    }

  /** CTAS-created tables: `<ctas.dir>[/<ns>]/<name>`, existing exactly when
    * a committed `_manifest` exists — table VISIBILITY and write atomicity
    * are the same mechanism (the manifest swap), so a failed CTAS leaves
    * no table, not a half-registered one. */
  private def ctasPath(ident: Identifier): Option[String] =
    ctasRoot.map { dir =>
      val segs = (ident.namespace() :+ ident.name())
        .map(_.toLowerCase(java.util.Locale.ROOT))
      s"$dir/${segs.mkString("/")}"
    }

  private def ctasExists(ident: Identifier): Boolean =
    ctasPath(ident).exists { p =>
      val root = new org.apache.hadoop.fs.Path(p)
      StoreSink.fs(root).exists(new org.apache.hadoop.fs.Path(root, StoreSink.Manifest))
    }

  /** `<table>$<kind>` resolves the base store's METADATA INSPECTION table
    * (`SELECT * FROM graft.`store$files``) — the Iceberg `t.files` /
    * `t.partitions` / `t.history` surface: manifest facts as ordinary
    * relations that compose with SQL, computed from metadata only. */
  private def metaTable(ident: Identifier): Option[Table] = {
    val n = ident.name()
    val i = n.indexOf('$')
    if (i <= 0) return None
    val (base, kind) = (n.substring(0, i).toLowerCase(java.util.Locale.ROOT),
                        n.substring(i + 1).toLowerCase(java.util.Locale.ROOT))
    if (!StoreMetaTable.Kinds(kind)) return None
    val baseIdent = Identifier.of(ident.namespace(), base)
    val path =
      if (base == "store" && inDefaultNs(ident))
        org.apache.spark.sql.SparkSession.active.conf
          .getOption(GraftCatalog.StorePathKey)
      else ctasPath(baseIdent).filter(_ => ctasExists(baseIdent))
    path.map(new StoreMetaTable(_, kind))
  }

  override def loadTable(ident: Identifier): Table =
    if (inDefaultNs(ident))
      tables.get(ident.name().toLowerCase(java.util.Locale.ROOT)) match {
        case Some(mk) => mk()
        case None if ctasExists(ident) =>
          pinnedStoreTable(ctasPath(ident).get)
        case None => metaTable(ident)
          .getOrElse(throw new NoSuchTableException(ident))
      }
    else if (inKnownNs(ident)) {
      // namespaced tables are all CTAS-created stores (plus their $meta
      // views); the built-ins live only in the default namespace
      if (ctasExists(ident)) pinnedStoreTable(ctasPath(ident).get)
      else metaTable(ident).getOrElse(throw new NoSuchTableException(ident))
    } else throw new NoSuchTableException(ident)

  override def tableExists(ident: Identifier): Boolean =
    (inDefaultNs(ident) &&
      tables.contains(ident.name().toLowerCase(java.util.Locale.ROOT))) ||
      (inKnownNs(ident) && ctasExists(ident))

  /** TIME TRAVEL (`SELECT ... FROM graft.store VERSION AS OF n`): resolve
    * the store pinned to an archived manifest generation — a read-only
    * snapshot; writes/row-level ops against it are refused. Only the store
    * is versioned (the generators are immutable by construction). */
  override def loadTable(ident: Identifier, version: String): Table =
    if (inDefaultNs(ident) &&
        ident.name().toLowerCase(java.util.Locale.ROOT) == "store") {
      val p = org.apache.spark.sql.SparkSession.active.conf
        .getOption(GraftCatalog.StorePathKey)
        .getOrElse(throw new NoSuchTableException(ident))
      // integer = a version number; anything else = a NAMED REF — a TAG
      // (pinned archived version) first, else a live WAP BRANCH, resolved
      // as the AUDIT view (main ∪ staged) — `VERSION AS OF 'audit'` is how
      // a validation job reads staged-but-unpublished data without the
      // manual union (the Iceberg branch-read shape in the version-ref
      // namespace tags already own)
      resolveRef(p, version)
    } else if (inKnownNs(ident) && ctasExists(ident)) {
      // CTAS/RTAS tables are stores too — `VERSION AS OF n` resolves their
      // archived generations (e.g. the pre-REPLACE snapshot) the same way
      resolveRef(ctasPath(ident).get, version)
    } else throw new NoSuchTableException(ident)

  private def resolveRef(p: String, version: String): Table = {
    val intV = try Some(version.toInt) catch {
      case _: NumberFormatException => None
    }
    intV match {
      case Some(v) => new StoreTable(p, Some(v))
      case None =>
        val root = new org.apache.hadoop.fs.Path(p)
        val fsys = StoreSink.fs(root)
        if (StoreSink.readTags(root, fsys).contains(version))
          new StoreTable(p, Some(StoreSink.tagVersion(root, fsys, version)))
        else if (StoreSink.branchExists(root, fsys, version))
          new StoreTable(p, branchView = Some(version))
        else // tagVersion's error names the known tags; add the branches
          throw new IllegalArgumentException(
            s"no tag or branch named '$version' (tags: " +
              s"${StoreSink.readTags(root, fsys).keys.toSeq.sorted.mkString(",")}; " +
              s"branches: ${StoreSink.listBranches(root, fsys).mkString(",")})")
    }
  }

  /** `TIMESTAMP AS OF t` — the time-travel form users actually write:
    * resolve the latest version whose COMMIT-LEDGER instant (the `#ts=`
    * head line every manifest swap stamps — not file mtime) is ≤ t. Spark
    * hands epoch MICROseconds. An instant predating the table (or whose
    * versions were all vacuumed) fails loudly rather than resolving to a
    * later state. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    if (inDefaultNs(ident) &&
        ident.name().toLowerCase(java.util.Locale.ROOT) == "store") {
      val p = org.apache.spark.sql.SparkSession.active.conf
        .getOption(GraftCatalog.StorePathKey)
        .getOrElse(throw new NoSuchTableException(ident))
      val root = new org.apache.hadoop.fs.Path(p)
      val v = StoreSink.versionAt(root, StoreSink.fs(root),
        Math.floorDiv(timestampMicros, 1000L))
      new StoreTable(p, Some(v))
    } else if (inKnownNs(ident) && ctasExists(ident)) {
      // CTAS/RTAS tables resolve TIMESTAMP AS OF through the same ledger
      val p = ctasPath(ident).get
      val root = new org.apache.hadoop.fs.Path(p)
      val v = StoreSink.versionAt(root, StoreSink.fs(root),
        Math.floorDiv(timestampMicros, 1000L))
      new StoreTable(p, Some(v))
    } else throw new NoSuchTableException(ident)

  // ------------------------------------------------- FunctionCatalog (V2)
  // Catalog FUNCTIONS beside catalog tables: `graft.amt(id)` resolves
  // through the same namespace, so a SQL author gets the store's canonical
  // derivations (here the closed-form amount) without any session-level
  // UDF registration. The ScalarFunction exposes the static MAGIC METHOD
  // `invoke(long)`, which Spark's V2 function resolution calls through
  // codegen (no row boxing); `produceResult` is the interpreted fallback
  // the contract requires.

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    Array("amt", "bucket", "checksum").map(Identifier.of(Array.empty, _))
  }

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (!inDefaultNs(ident)) throw new NoSuchFunctionException(ident)
    else ident.name().toLowerCase(java.util.Locale.ROOT) match {
      case "amt" => AmtFunction
      // the store's partition transform function: V2ScanPartitioning
      // resolves a reported `bucket(n, k)` KeyGroupedPartitioning through
      // the table's catalog — without this lookup the SPJ report is
      // silently ignored (the Iceberg pattern)
      case "bucket" => BucketPartFunction
      // V2 AGGREGATE function — Spark plans it with partial aggregation
      // (update per row, merge across partitions), so it map-side combines
      // like any built-in aggregate
      case "checksum" => ChecksumFunction
      case _ => throw new NoSuchFunctionException(ident)
    }

  override def functionExists(ident: Identifier): Boolean =
    inDefaultNs(ident) &&
      Set("amt", "bucket", "checksum")(
        ident.name().toLowerCase(java.util.Locale.ROOT))

  // DDL: the only supported statement is SCHEMA EVOLUTION on the store
  // (`ALTER TABLE graft.store ADD COLUMN name BIGINT|STRING`) — trailing,
  // nullable, atomic-typed adds recorded in the `_schema` sidecar. Existing
  // files are NEVER rewritten: a file written before the ALTER decodes
  // short and reads as NULL in the new columns (the Iceberg/Delta add-only
  // contract). Everything else is declined loudly, never silently ignored.
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog does not create tables")

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    // the conf-pointed graft.store, or any CTAS/RTAS-created store table —
    // both are the same on-disk format, so evolution DDL applies uniformly
    val p =
      if (inDefaultNs(ident) &&
          ident.name().toLowerCase(java.util.Locale.ROOT) == "store")
        org.apache.spark.sql.SparkSession.active.conf
          .getOption(GraftCatalog.StorePathKey)
          .getOrElse(throw new NoSuchTableException(ident))
      else if (ctasExists(ident)) ctasPath(ident).get
      else throw new UnsupportedOperationException(
        s"only graft.store and CTAS-created store tables support ALTER, got $ident")
    val root = new org.apache.hadoop.fs.Path(p)
    val fsys = StoreSink.fs(root)
    // TABLE PROPERTIES (`SET/UNSET TBLPROPERTIES`): a read-merge-write on
    // the `_props` sidecar, serialized under the commit lock like every
    // other metadata mutation
    val (propChanges, nonPropChanges) = changes.partition {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => true
      case _ => false
    }
    if (propChanges.nonEmpty) StoreSink.withCommitLock(root, fsys) {
      var ps = StoreSink.readProps(root, fsys).toMap
      propChanges.foreach {
        case sp: TableChange.SetProperty => ps += (sp.property() -> sp.value())
        case rp: TableChange.RemoveProperty => ps -= rp.property()
        case _ => ()
      }
      StoreSink.writeProps(root, fsys, ps.toSeq)
    }
    // CHECK constraints: Spark has already VALIDATED existing data before
    // AddConstraint reaches the catalog (AddCheckConstraintExec scans the
    // table and fails the DDL on any violating row); the catalog's job is
    // durably recording the predicate, serialized under the commit lock
    val (constraintChanges, columnChanges) = nonPropChanges.partition {
      case _: TableChange.AddConstraint | _: TableChange.DropConstraint => true
      case _ => false
    }
    constraintChanges.foreach {
      case ac: TableChange.AddConstraint =>
        val c = ac.constraint()
        require(c.isInstanceOf[org.apache.spark.sql.connector.catalog.constraints.Check],
          s"graft.store supports CHECK constraints only, got ${c.toDDL}")
        val chk = c.asInstanceOf[org.apache.spark.sql.connector.catalog.constraints.Check]
        StoreSink.withCommitLock(root, fsys) {
          val cs = StoreSink.readConstraints(root, fsys)
          require(!cs.exists(_._1.equalsIgnoreCase(chk.name())),
            s"constraint ${chk.name()} already exists")
          StoreSink.writeConstraints(root, fsys, cs :+ (chk.name(), chk.predicateSql()))
        }
      case dc: TableChange.DropConstraint =>
        StoreSink.withCommitLock(root, fsys) {
          val cs = StoreSink.readConstraints(root, fsys)
          require(dc.ifExists() || cs.exists(_._1.equalsIgnoreCase(dc.name())),
            s"no such constraint: ${dc.name()}")
          StoreSink.writeConstraints(root, fsys,
            cs.filterNot(_._1.equalsIgnoreCase(dc.name())))
        }
      case _ => ()
    }
    // COLUMN evolution: ADD (new trailing slot), RENAME (pure metadata —
    // the stable field id keeps decoding the same physical slot), DROP (a
    // tombstone on the slot — the column leaves the logical schema, no file
    // is rewritten, the slot stays reserved so every generation's width
    // still names its layout). The base (k, grp, amt_cents) prefix is
    // load-bearing — zone maps, blooms, partition specs, the MERGE row id
    // and the delete-predicate compiler all address it — so renaming or
    // dropping it is refused, the same way Iceberg refuses to drop a
    // partition source column.
    val lower = (s: String) => s.toLowerCase(java.util.Locale.ROOT)
    val baseNames = StoreSink.schema.fields.map(f => lower(f.name)).toSet
    def requireSingle(fn: Array[String], what: String): String = {
      require(fn.length == 1,
        s"graft.store supports top-level column ${what}s only, got ${fn.mkString(".")}")
      fn(0)
    }
    def requireNotBase(n: String, what: String): Unit =
      require(!baseNames(lower(n)),
        s"cannot $what base column $n: the (k, grp, amt_cents) prefix is " +
          "addressed by zone maps, blooms, partition specs and row ids")
    // a column referenced by an enforced CHECK constraint cannot be
    // renamed or dropped out from under its predicate SQL
    def requireUnconstrained(n: String, what: String): Unit = {
      val hit = StoreSink.readConstraints(root, fsys).find { case (_, sql) =>
        java.util.regex.Pattern
          .compile("(?i)\\b" + java.util.regex.Pattern.quote(n) + "\\b")
          .matcher(sql).find()
      }
      require(hit.isEmpty,
        s"cannot $what column $n: referenced by CHECK constraint " +
          s"${hit.get._1} (${hit.get._2}) — drop the constraint first")
    }
    if (columnChanges.nonEmpty) StoreSink.withCommitLock(root, fsys) {
      // the sidecar read-merge-write is a lost-update window: two
      // concurrent ALTERs (or an ALTER racing a writer) can drop a column
      // — serialize under the store's commit lock like every other
      // metadata mutation
      var extras = StoreSink.readExtras(root, fsys)
      val before = extras
      columnChanges.foreach {
        case a: TableChange.AddColumn =>
          val colName = requireSingle(a.fieldNames(), "add")
          require(a.isNullable, "added graft.store columns must be nullable " +
            "(existing files read them as NULL)")
          require(a.position() == null,
            "graft.store columns are add-TRAILING only (id-addressed slots)")
          val live = (StoreSink.schema.fields.map(_.name) ++
            extras.filterNot(_.dropped).map(_.name)).map(lower).toSet
          require(!live(lower(colName)), s"column already exists: $colName")
          // DEFAULT <literal>: old (short) rows read this value — the
          // Iceberg initial-default contract; INSERTs that omit the column
          // get it from the analyzer via CURRENT_DEFAULT metadata
          val rawDefault = Option(a.defaultValue()).map { dv =>
            val lit = dv.getValue
            require(lit != null,
              "graft.store column defaults must be literal (foldable) values")
            (a.dataType(), lit.value()) match {
              case (LongType, v: java.lang.Number) => v.toString
              case (IntegerType, v: java.lang.Number) => v.toString
              case (org.apache.spark.sql.types.StringType, v) => v.toString
              case (t, v) => throw new IllegalArgumentException(
                s"graft.store default $v does not fit column type $t")
            }
          }
          // ids are never reused — tombstoned slots keep theirs
          val nextId = (3 +: extras.map(_.id)).max + 1
          extras = extras :+ StoreSink.ExtraField(nextId, colName,
            a.dataType(), rawDefault)
        case r: TableChange.RenameColumn =>
          val colName = requireSingle(r.fieldNames(), "rename")
          requireNotBase(colName, "rename")
          requireUnconstrained(colName, "rename")
          val idx = extras.indexWhere(e =>
            !e.dropped && e.name.equalsIgnoreCase(colName))
          require(idx >= 0, s"no such column: $colName")
          val live = (StoreSink.schema.fields.map(_.name) ++
            extras.filterNot(_.dropped).map(_.name)).map(lower).toSet
          require(!live(lower(r.newName())),
            s"column already exists: ${r.newName()}")
          extras = extras.updated(idx, extras(idx).copy(name = r.newName()))
        case d: TableChange.DeleteColumn =>
          val colName = requireSingle(d.fieldNames(), "drop")
          requireNotBase(colName, "drop")
          val idx = extras.indexWhere(e =>
            !e.dropped && e.name.equalsIgnoreCase(colName))
          if (idx < 0) {
            if (!d.ifExists()) throw new IllegalArgumentException(
              s"no such column: $colName")
          } else {
            requireUnconstrained(colName, "drop")
            extras = extras.updated(idx, extras(idx).copy(dropped = true))
          }
        case u: TableChange.UpdateColumnType =>
          // TYPE WIDENING on a stable field id (verdict r9 #2): the slot is
          // unchanged and the line encoding is text, so int → bigint is a
          // pure metadata promotion — old files' digits simply parse wider.
          // Anything lossy (narrowing, cross-kind) is refused; the outgoing
          // schema archives below so time travel reads each generation
          // under the type it was committed with.
          val colName = requireSingle(u.fieldNames(), "type change")
          requireNotBase(colName, "change the type of")
          val idx = extras.indexWhere(e =>
            !e.dropped && e.name.equalsIgnoreCase(colName))
          require(idx >= 0, s"no such column: $colName")
          val from = extras(idx).dataType
          val to = u.newDataType()
          require(from == IntegerType && to == LongType,
            s"graft.store widens int -> bigint only, got $from -> $to " +
              "(narrowing loses data; other promotions change the encoding)")
          extras = extras.updated(idx, extras(idx).copy(dataType = to))
        case other => throw new UnsupportedOperationException(
          s"graft.store supports ADD/RENAME/DROP COLUMN and int->bigint " +
            s"ALTER COLUMN TYPE only, got $other")
      }
      if (extras != before) {
        // SNAPSHOT-SCOPED SCHEMA, the ALTER side: a rename/drop changes how
        // existing versions should READ, so archive the outgoing schema
        // against the last version committed under it — FIRST-wins, so the
        // schema time travel resolves for v is the one v was committed
        // under, not an intermediate ALTER state (add-only ALTERs skip the
        // archive: old versions reading a new column as NULL is the
        // initial-default contract, not a misread)
        // A type WIDENING also archives: versions committed under int must
        // travel-read as int.
        val renamedOrDropped =
          before.map(e => (e.id, e.name, e.dropped, e.dataType)) !=
          extras.take(before.length).map(e => (e.id, e.name, e.dropped, e.dataType))
        if (renamedOrDropped)
          StoreSink.listVersions(root, fsys).lastOption.foreach { v =>
            val ap = StoreSink.schemaArchivePath(root, v)
            if (!StoreSink.manifestFs(fsys).exists(ap))
              StoreSink.writeExtrasFile(ap, fsys, before)
          }
        // PER-FILE DECLARED STATS ARE KEYED BY NAME (manifest field 12), so
        // column evolution must keep them honest in the CURRENT manifest:
        //  - DROP strips the dead column's stats — otherwise a later re-ADD
        //    under the same name (fresh field id, old files read NULL) would
        //    inherit bounds from the DROPPED column's values and the MIN/MAX
        //    pushdown would return a wrong extremum;
        //  - RENAME a→b REKEYS a's stats to b (the slot is unchanged, the
        //    bounds stay valid) and strips any stale stats already keyed b
        //    (a name freed by an earlier drop can be renamed onto).
        // Archived version manifests keep their stats untouched: time travel
        // reads each generation under its own archived schema, where those
        // names still mean that generation's column.
        val afterById = extras.take(before.length).map(e => e.id -> e).toMap
        val statDrops = before.collect {
          case e if !e.dropped && afterById(e.id).dropped => e.name
        }
        val statRenames = before.collect {
          case e if !e.dropped && !afterById(e.id).dropped &&
            e.name != afterById(e.id).name => (e.name, afterById(e.id).name)
        }
        if (statDrops.nonEmpty || statRenames.nonEmpty) {
          val gone = (statDrops ++ statRenames.map(_._2)).map(lower).toSet
          var changed = false
          val rebased = StoreSink.readManifestLines(root, fsys).map { l =>
            if (l.startsWith("#")) l
            else {
              val e = StoreSink.parseEntry(l)
              if (e.stats.isEmpty && e.sstats.isEmpty) l
              else {
                def keepAs[T](c: String, st: T, rekey: String => T): Option[T] =
                  if (gone(lower(c)) &&
                      !statRenames.exists(r => lower(r._1) == lower(c))) None
                  else statRenames.find(r => lower(r._1) == lower(c)) match {
                    case Some((_, nn)) => Some(rekey(nn))
                    case None          => Some(st)
                  }
                val ns = e.stats.flatMap { case st @ (c, loB, hiB) =>
                  keepAs(c, st, nn => (nn, loB, hiB)) }
                // the string bounds (field 13) follow the same hygiene —
                // a freed name must not leave stale prefix bounds behind
                val nt = e.sstats.flatMap { case st @ (c, loS, hiS) =>
                  keepAs(c, st, nn => (nn, loS, hiS)) }
                val nl = e.copy(stats = ns, sstats = nt).line
                if (nl != l) changed = true
                nl
              }
            }
          }
          if (changed) StoreSink.writeManifestAtomic(root, fsys, rebased)
          // keep the declared-stat POLICY (`graft.stats.cols`) in step so
          // analyze doesn't re-backfill a dropped name and renames keep
          // collecting stats under their new name
          val ps = StoreSink.readProps(root, fsys).toMap
          ps.get(StoreSink.StatColsProp).foreach { v =>
            val nv = v.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
              .flatMap { c =>
                if (statDrops.exists(d => lower(d) == lower(c))) None
                else Some(statRenames.find(r => lower(r._1) == lower(c))
                  .map(_._2).getOrElse(c))
              }.distinct
            if (nv.mkString(",") != v)
              StoreSink.writeProps(root, fsys,
                (ps + (StoreSink.StatColsProp -> nv.mkString(","))).toSeq)
          }
        }
        // the schema write comes LAST: a crash after the stat strip but
        // before this leaves only missing stats (conservative, analyze
        // re-backfills) — never a still-live column whose evolution was
        // recorded while dead bounds survived
        StoreSink.writeExtras(root, fsys, extras)
      }
    }
    new StoreTable(p)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (inKnownNs(ident) && ctasExists(ident)) {
      val root = new org.apache.hadoop.fs.Path(ctasPath(ident).get)
      StoreSink.fs(root).delete(root, true)
    } else if (tableExists(ident))
      throw new UnsupportedOperationException(
        s"built-in table ${ident.name()} cannot be dropped")
    else false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog does not rename tables")

  // -------------------------------------------- StagingTableCatalog (CTAS)
  /** ATOMIC `CREATE TABLE graft.<name> AS SELECT ...`: the staged table
    * writes through the ordinary StoreSink two-phase protocol into
    * `<ctas.dir>/<name>`, and because table VISIBILITY is "a committed
    * manifest exists", the query's commit IS the registration — nothing to
    * undo on failure beyond deleting the staged directory
    * (abortStagedChanges), and no moment where a half-written table is
    * addressable (the non-staged CTAS path would register first and
    * best-effort drop on failure — exactly the window staging removes).
    * The SELECT's schema must be store-shaped: the (k BIGINT, grp STRING,
    * amt_cents BIGINT) prefix plus optional bigint/string trailing columns,
    * which are persisted to the `_schema` sidecar before any write. */
  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    require(inKnownNs(ident), s"unknown namespace: $ident")
    require(!ident.name().startsWith("_"),
      s"invalid table name: ${ident.name()}")
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(name(), ident.name()))
    val p = ctasPath(ident).getOrElse(throw new IllegalStateException(
      s"set ${GraftCatalog.CtasDirKey} to enable CREATE TABLE AS SELECT"))
    val base = StoreSink.schema.fields
    require(schema.fields.length >= base.length &&
      schema.fields.take(base.length).zip(base).forall { case (a, b) =>
        a.name.equalsIgnoreCase(b.name) && a.dataType == b.dataType },
      s"graft CTAS requires the (k BIGINT, grp STRING, amt_cents BIGINT) " +
        s"prefix, got ${schema.simpleString}")
    val root = new org.apache.hadoop.fs.Path(p)
    val fsys = StoreSink.fs(root)
    fsys.delete(root, true) // a previous aborted stage's leftovers
    StoreSink.writeExtras(root, fsys,
      StoreSink.extrasOf(schema.fields.drop(base.length).toSeq))
    // `PARTITIONED BY (bucket(n, k))` / `(grp)` — persist the spec before
    // any write so the staged write's builder resolves it
    StoreSink.specOf(partitions).foreach(StoreSink.writePartSpec(root, fsys, _))
    new StagedStoreTable(p, schema, partitions)
  }

  /** ATOMIC `REPLACE TABLE graft.<name> AS SELECT ...` (RTAS): the staged
    * write commits through the store's ordinary TRUNCATE protocol — ONE
    * manifest swap is both the data replacement and the "publish", so a
    * reader sees the old generation or the new one, never a mix, and a
    * FAILED replace leaves the old table untouched (the staged files never
    * enter the manifest; abort restores the schema/spec sidecars). The
    * replaced generation stays archived (time travel reaches it until
    * vacuum). REPLACE resets the trailing schema and the partition spec to
    * the new SELECT's and CLEARS check constraints (they may reference
    * dropped columns); table properties survive — they describe the table,
    * not a generation. Archived generations read a renamed trailing column
    * as NULL (parquet name-based resolution), the add-only contract's
    * REPLACE-side analogue. */
  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable =
    stagedReplaceImpl(ident, schema, partitions, properties, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable =
    stagedReplaceImpl(ident, schema, partitions, properties, orCreate = true)

  private def stagedReplaceImpl(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String],
      orCreate: Boolean): org.apache.spark.sql.connector.catalog.StagedTable = {
    require(inKnownNs(ident), s"unknown namespace: $ident")
    require(!(inDefaultNs(ident) &&
        tables.contains(ident.name().toLowerCase(java.util.Locale.ROOT))),
      s"built-in table ${ident.name()} cannot be replaced")
    if (!ctasExists(ident)) {
      if (!orCreate)
        throw new org.apache.spark.sql.catalyst.analysis.CannotReplaceMissingTableException(ident)
      return stageCreate(ident, schema, partitions, properties)
    }
    val base = StoreSink.schema.fields
    require(schema.fields.length >= base.length &&
      schema.fields.take(base.length).zip(base).forall { case (a, b) =>
        a.name.equalsIgnoreCase(b.name) && a.dataType == b.dataType },
      s"graft RTAS requires the (k BIGINT, grp STRING, amt_cents BIGINT) " +
        s"prefix, got ${schema.simpleString}")
    val p = ctasPath(ident).get
    val root = new org.apache.hadoop.fs.Path(p)
    val fsys = StoreSink.fs(root)
    // snapshot the metadata sidecars, then install the new generation's —
    // abort restores them (the data swap itself is the write's atomic
    // truncate commit, nothing to undo there)
    val saved = (StoreSink.readExtras(root, fsys),
      StoreSink.readPartSpec(root, fsys),
      StoreSink.readConstraints(root, fsys))
    val newExtras = StoreSink.extrasOf(schema.fields.drop(base.length).toSeq)
    var archivedSchemaV: Option[Int] = None
    StoreSink.withCommitLock(root, fsys) {
      // a trailing-schema change would misread ARCHIVED generations
      // (slot-positional decode) — archive the outgoing schema against the
      // last version committed under it, so time travel resolves it
      // (StoreSink.readExtrasAt). FIRST-wins: an archive a prior
      // rename/drop ALTER already left for this version records the schema
      // the version was COMMITTED under — never overwrite it with the
      // intermediate state (and never delete it on abort: archivedSchemaV
      // stays None for a pre-existing archive).
      val changed = saved._1.map(f => (f.name, f.dataType, f.dropped)) !=
        newExtras.map(f => (f.name, f.dataType, f.dropped))
      if (changed) StoreSink.listVersions(root, fsys).lastOption.foreach { v =>
        val ap = StoreSink.schemaArchivePath(root, v)
        if (!StoreSink.manifestFs(fsys).exists(ap)) {
          StoreSink.writeExtrasFile(ap, fsys, saved._1)
          archivedSchemaV = Some(v)
        }
      }
      StoreSink.writeExtras(root, fsys, newExtras)
      val newSpec = StoreSink.specOf(partitions)
      newSpec match {
        case Some(sp) => StoreSink.writePartSpec(root, fsys, sp)
        case None => StoreSink.manifestFs(fsys)
          .delete(new org.apache.hadoop.fs.Path(root, StoreSink.PartFile), false)
      }
      if (saved._3.nonEmpty) StoreSink.writeConstraints(root, fsys, Nil)
    }
    new StagedStoreTable(p, schema, partitions,
      restoreOnAbort = Some((saved._1, saved._2, saved._3, archivedSchemaV)))
  }
}

/** Shared shape of the two maintenance procedures: fixed parameters, a
  * one-row audit result via [[org.apache.spark.sql.connector.read.LocalScan]]. */
private sealed abstract class StoreProcedure(procName: String,
                                             resultCols: (String, String))
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = procName
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // mutates store state

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in(argName, LongType).build())

  protected def argName: String
  protected def run(path: String, arg: Long): (Long, Long)

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField(resultCols._1, LongType, nullable = false),
    org.apache.spark.sql.types.StructField(resultCols._2, LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val path = input.getUTF8String(0).toString
    val arg = input.getLong(1)
    val (a, b) = run(path, arg)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(a, b))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.compact_if(path, target_rows, max_files, max_overlap_e4)` —
  * trigger-based maintenance (round-12 verdict #5): manifest-only
  * small-file count + k-zone overlap estimate, then the existing compact
  * rewrite when either trips (see StoreSink.compactIf). Audit row:
  * (action, files, overlap_e4, files_after). */
private object CompactIfProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "compact_if"
  override def description(): String =
    "compact when manifest-derived small-file or zone-overlap triggers fire"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("target_rows", LongType).build(),
    ProcedureParameter.in("max_files", LongType).build(),
    ProcedureParameter.in("max_overlap_e4", LongType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("action",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("files", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("overlap_e4", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("files_after", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val (action, files, ov, after) = StoreSink.compactIf(
      org.apache.spark.sql.SparkSession.active,
      input.getUTF8String(0).toString, input.getLong(1), input.getLong(2),
      input.getLong(3))
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(action),
          files, ov, after))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.export(path, dst, version)` — materialize ONE consistent
  * snapshot of a store as plain parquet at `dst` (version ≤ 0 = current
  * head): the interop escape hatch for consumers that speak only open
  * formats (Iceberg's snapshot export posture). The read is pinned
  * (atVersion) so a concurrent writer can never tear the export, and the
  * output is an ordinary parquet directory — no manifest, no sidecars,
  * no graft reader needed downstream. Audit row: (rows_exported,
  * version) where version is the EFFECTIVE one (head resolves to
  * last-archived + 1). At 100 TB this is a full copy by design — the
  * point is leaving the format, not saving bytes. */
private object ExportProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "export"
  override def description(): String =
    "materialize a pinned store version as plain parquet at dst"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("dst", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("version", LongType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("rows_exported", LongType,
      nullable = false),
    org.apache.spark.sql.types.StructField("version", LongType,
      nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val s = org.apache.spark.sql.SparkSession.active
    val p = input.getUTF8String(0).toString
    val dst = input.getUTF8String(1).toString
    val v = input.getLong(2)
    val root = new org.apache.hadoop.fs.Path(p)
    // every commit archives its own version manifest alongside the
    // current pointer, so the head's number IS the newest archive
    val effective =
      if (v > 0) v
      else StoreSink.listVersions(root, StoreSink.fs(root))
        .lastOption.getOrElse(0).toLong
    val rd = s.read.format("graft.sources.StoreSink").option("path", p)
    // pin the HEAD export at the resolved number too: a commit landing
    // between the listVersions and the scan's own manifest read would
    // otherwise export data the audit row's version doesn't name
    val df = (if (effective > 0) rd.option("atVersion", effective.toString)
              else rd).load()
    df.write.mode("overwrite").parquet(dst)
    // count what actually landed — the export's own files, not the plan
    val nRows = s.read.parquet(dst).count()
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] =
          Array(InternalRow(nRows, effective))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.export_delta(path, dst, from_v, to_v)` — materialize the
  * CHANGE FEED between two pinned versions as plain parquet at `dst`
  * (to_v ≤ 0 = current head): the incremental twin of [[ExportProcedure]]
  * for consumers that mirror a store without speaking its format. Output
  * columns = the CDF shape ('insert'/'delete' op + the toV schema), so a
  * downstream MERGE applies the delta; cost is bounded by CHANGED bytes,
  * never table size (StoreSink.changes reads only differing files). Both
  * versions must still be retained — vacuumed history fails loudly.
  * Audit row: (rows_exported, from_v, to_v_effective). */
private object ExportDeltaProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "export_delta"
  override def description(): String =
    "materialize the change feed between two store versions as plain parquet"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("dst", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("from_v", LongType).build(),
    ProcedureParameter.in("to_v", LongType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("rows_exported", LongType,
      nullable = false),
    org.apache.spark.sql.types.StructField("from_v", LongType,
      nullable = false),
    org.apache.spark.sql.types.StructField("to_v", LongType,
      nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val s = org.apache.spark.sql.SparkSession.active
    val p = input.getUTF8String(0).toString
    val dst = input.getUTF8String(1).toString
    val fromV = input.getLong(2)
    val toV = input.getLong(3)
    val root = new org.apache.hadoop.fs.Path(p)
    // resolve head to its concrete number FIRST and diff against THAT
    // version explicitly — a commit landing mid-call must not make the
    // audit row claim a different window than the one exported
    val effectiveTo =
      if (toV > 0) toV
      else StoreSink.listVersions(root, StoreSink.fs(root))
        .lastOption.getOrElse(0).toLong
    require(effectiveTo > fromV,
      s"export_delta: to_v $effectiveTo must be above from_v $fromV")
    StoreSink.changes(s, p, fromV.toInt, Some(effectiveTo.toInt))
      .write.mode("overwrite").parquet(dst)
    val nRows = s.read.parquet(dst).count()
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] =
          Array(InternalRow(nRows, fromV, effectiveTo))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.fsck(path)` — verify the manifest's claims against the
  * files on disk (see StoreSink.fsck): detection-only, one audit row
  * (entries, missing_files, sidecars, bad_sidecars). The nightly
  * integrity tick every table format ships (Delta FSCK). */
private object FsckProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "fsck"
  override def description(): String =
    "verify manifest-referenced files and sidecars exist and parse"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("entries", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("missing_files", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sidecars", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("bad_sidecars", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val (n, miss, side, bad) =
      StoreSink.fsck(input.getUTF8String(0).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] =
          Array(InternalRow(n, miss, side, bad))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.maintain(path)` — run every maintenance step the table's
  * own `graft.maintain.*` properties configure (compact_if / retention
  * expiry / orphan sweep; see StoreSink.maintain). One audit row per
  * executed step; a policy-less table returns a single 'none' row. The
  * fleet-scheduler entry point: thresholds travel with the table, the
  * scheduler only needs the path. */
private object MaintainProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "maintain"
  override def description(): String =
    "run the maintenance steps configured by the table's graft.maintain.* properties"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("op",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("action",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("a", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("b", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("c", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val audit = StoreSink.maintain(org.apache.spark.sql.SparkSession.active,
      input.getUTF8String(0).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = audit.map { r =>
          InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(r._1),
            org.apache.spark.unsafe.types.UTF8String.fromString(r._2),
            r._3, r._4, r._5)
        }.toArray
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.analyze(path)` — backfill declared stat-column bounds
  * onto stat-less manifest entries (see StoreSink.analyze): one read
  * pass over those files, a metadata-only commit, pruning enabled
  * retroactively. Audit row: (files_scanned, entries_updated). */
private object AnalyzeProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "analyze"
  override def description(): String =
    "backfill declared stat-column bounds onto stat-less manifest entries"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("files_scanned", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("entries_updated", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val (a, b) = StoreSink.analyze(input.getUTF8String(0).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(a, b))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.index_build(corpus_store_path, index_path)` — build the
  * persisted IVF index from a corpus STORE (k = vec_id, trailing `emb` =
  * float CSV), recording (corpus, version) for incremental refresh; see
  * sources/AnnIndex.scala. Audit row: (n_centroids, n_postings). */
private object IndexBuildProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "index_build"
  override def description(): String =
    "build the persisted IVF index from a corpus store"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("corpus", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("index_path", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("n_centroids", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_postings", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val res = AnnIndex.buildFromStore(org.apache.spark.sql.SparkSession.active,
      input.getUTF8String(0).toString, input.getUTF8String(1).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(res._1, res._2))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.index_refresh(index_path)` — fold the corpus store's change
  * feed since the indexed version into the posting lists under the FROZEN
  * codebook. Audit row: (keys_changed, partitions_rewritten). */
private object IndexRefreshProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "index_refresh"
  override def description(): String =
    "incrementally refresh a persisted IVF index from its corpus change feed"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("index_path", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("keys_changed", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("partitions_rewritten", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val res = AnnIndex.refresh(org.apache.spark.sql.SparkSession.active,
      input.getUTF8String(0).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(res._1, res._2))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.index_rebuild_if(index_path, max_skew_e4[, min_recall_e4])`
  * — the rebuild-cadence policy: fold pending corpus changes, then retrain
  * if occupancy skew exceeds the threshold or the sampled recall probe
  * drops below the floor (AnnIndex.rebuildIf). Audit:
  * (action, skew_e4, recall_e4). */
private object IndexRebuildIfProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "index_rebuild_if"
  override def description(): String =
    "refresh the IVF index, then retrain it if skew or recall drift demand it"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("index_path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("max_skew_e4", LongType).build(),
    ProcedureParameter.in("min_recall_e4", LongType).defaultValue("0").build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("action",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("skew_e4", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("recall_e4", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val res = AnnIndex.rebuildIf(org.apache.spark.sql.SparkSession.active,
      input.getUTF8String(0).toString, input.getLong(1), input.getLong(2))
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(res._1),
          res._2, res._3))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.index_expire(index_path, older_ms)` — age-margined GC of
  * superseded index generations (IndexGen.dropStaleOlder): a stale
  * generation is collected only once its supersession stamp is at least
  * `older_ms` old, so in-flight probes drain first — the remove_orphans
  * retention pattern applied to the index lifecycle. Audit: (dropped). */
private object IndexExpireProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "index_expire"
  override def description(): String =
    "drop superseded index generations older than the given margin"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("index_path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("older_ms", LongType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("dropped", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val n = IndexGen.dropStaleOlder(input.getUTF8String(0).toString,
      input.getLong(1)).toLong
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(n))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.text_index_build(corpus_store_path, index_path)` — build the
  * persisted BM25 inverted index from a corpus STORE (k = doc_id, trailing
  * `text`); see sources/TextIndex.scala. Audit: (n_terms, n_postings). */
private object TextIndexBuildProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "text_index_build"
  override def description(): String =
    "build the persisted BM25 inverted index from a corpus store"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("corpus", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("index_path", org.apache.spark.sql.types.StringType).build(),
    // optional shard count (0 = derive from corpus tokens) — the
    // round-12 verdict #2 knob, SQL-reachable
    ProcedureParameter.in("shards", LongType).defaultValue("0").build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("n_terms", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_postings", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val res = TextIndex.buildFromStore(org.apache.spark.sql.SparkSession.active,
      input.getUTF8String(0).toString, input.getUTF8String(1).toString,
      input.getLong(2).toInt)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(res._1, res._2))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.text_index_rebuild_if(index_path)` — fold pending corpus
  * changes, then rebuild IFF the refresh left the impact bound DISARMED
  * (only a rebuild re-arms top-k early termination); see
  * TextIndex.rebuildIf. Audit: (action, armed_before, postings_after). */
private object TextIndexRebuildIfProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "text_index_rebuild_if"
  override def description(): String =
    "rebuild a persisted BM25 index when refresh disarmed its impact bound"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("index_path", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("action",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("armed_before", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("postings_after", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val (action, armed, after) = TextIndex.rebuildIf(
      org.apache.spark.sql.SparkSession.active, input.getUTF8String(0).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(action),
          armed, after))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.text_index_refresh(index_path)` — fold the corpus store's
  * change feed into the inverted index by exact integer deltas. Audit:
  * (docs_changed, shards_touched). */
private object TextIndexRefreshProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "text_index_refresh"
  override def description(): String =
    "incrementally refresh a persisted BM25 index from its corpus change feed"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("index_path", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("docs_changed", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("shards_touched", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val res = TextIndex.refresh(org.apache.spark.sql.SparkSession.active,
      input.getUTF8String(0).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(res._1, res._2))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.publish_all('p1,p2,...', 'b1,b2,...')` — MULTI-TABLE ATOMIC
  * PUBLISH: fold branch bN of table pN into main for every pair,
  * all-or-nothing (2PC with a coordinator decision marker; see
  * StoreSink.publishAll). Audit row: (tables, files_published). */
private object PublishAllProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "publish_all"
  override def description(): String =
    "publish WAP branches on N store tables in one atomic transaction"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("paths", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("branches", org.apache.spark.sql.types.StringType).build(),
    // optional SNAPSHOT-POINTER catalog: when set, the pointer advances to
    // the published versions as the transaction's last act (read atomicity)
    ProcedureParameter.in("catalog", org.apache.spark.sql.types.StringType)
      .defaultValue("''").build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("tables", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("files_published", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val paths = input.getUTF8String(0).toString.split(',').map(_.trim).filter(_.nonEmpty)
    val branches = input.getUTF8String(1).toString.split(',').map(_.trim).filter(_.nonEmpty)
    require(paths.length == branches.length,
      s"paths (${paths.length}) and branches (${branches.length}) must pair up")
    val cat = Option(input.getUTF8String(2)).map(_.toString).filter(_.nonEmpty)
    val res = StoreSink.publishAll(paths.zip(branches).toSeq, cat)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(res._1, res._2))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.txn_recover(path)` — resolve crashed multi-table
  * transactions touching this table: roll committed ones forward, abort
  * undecided ones. Audit row: (rolled_forward, aborted). */
private object TxnRecoverProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "txn_recover"
  override def description(): String =
    "resolve crashed multi-table transactions on this table"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("rolled_forward", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("aborted", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val res = StoreSink.recoverTxn(input.getUTF8String(0).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(res._1, res._2))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.repartition_spec(path, 'bucket:16:k' | 'identity:grp' |
  * 'none')` — PARTITION SPEC EVOLUTION (the Iceberg spec-versioning
  * contract): registers a NEW spec generation; files already committed keep
  * planning (pruning, SPJ withdrawal, partition DDL refusals) under the
  * spec they were written with, new writes route under the new one, and a
  * full rewrite unifies. Metadata-only — zero data bytes move. Audit row:
  * (old_spec_id, new_spec_id). */
private object RepartitionSpecProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "repartition_spec"
  override def description(): String =
    "register a new partition-spec generation; existing files keep theirs"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("spec", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("old_spec_id", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("new_spec_id", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val path = input.getUTF8String(0).toString
    val specStr = input.getUTF8String(1).toString
    val root = new org.apache.hadoop.fs.Path(path)
    val fsys = StoreSink.fs(root)
    var res = (0L, 0L)
    StoreSink.withCommitLock(root, fsys) {
      val oldId = StoreSink.readPartSpecs(root, fsys)
        .lastOption.map(_._1).getOrElse(1)
      val (newId, _) = StoreSink.appendPartSpec(root, fsys, specStr)
      res = (oldId.toLong, newId.toLong)
    }
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(res._1, res._2))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

private object CompactProcedure
    extends StoreProcedure("compact", ("files_before", "files_after")) {
  override protected def argName = "target_rows"
  override protected def run(path: String, arg: Long): (Long, Long) = {
    val (b, a) = StoreSink.compact(
      org.apache.spark.sql.SparkSession.active, path, arg)
    (b.toLong, a.toLong)
  }
  override def description(): String =
    "rewrite the current snapshot as range-clustered ~target_rows files"
}

/** `CALL graft.cherry_pick(path, version)` — re-apply an archived
  * append-only commit's file delta onto head as a new commit; see
  * StoreSink.cherryPick for the refusal rules. */
private object CherryPickProcedure
    extends StoreProcedure("cherry_pick", ("files_applied", "new_version")) {
  override protected def argName = "version"
  override protected def run(path: String, arg: Long): (Long, Long) =
    StoreSink.cherryPick(path, arg.toInt)
  override def description(): String =
    "re-apply an archived append-only commit onto the current head"
}

/** `CALL graft.zorder(path, target_rows)` — OPTIMIZE with 2-D (Hilbert)
  * clustering over both zone columns; see StoreSink.compactHilbert. */
private object ZorderProcedure
    extends StoreProcedure("zorder", ("files_before", "files_after")) {
  override protected def argName = "target_rows"
  override protected def run(path: String, arg: Long): (Long, Long) = {
    val (b, a) = StoreSink.compactHilbert(
      org.apache.spark.sql.SparkSession.active, path, arg)
    (b.toLong, a.toLong)
  }
  override def description(): String =
    "rewrite the current snapshot Hilbert-clustered over (k, amt_cents)"
}

/** `CALL graft.zorder_by(path, target_rows, 'c1,c2[,c3[,c4]]')` — the
  * d-DIMENSIONAL OPTIMIZE: Morton-interleave clustering over any 2–4
  * bigint columns (see StoreSink.compactZorder); with the columns declared
  * as stat columns, a narrow predicate on ANY of them prunes planning
  * after the rewrite. */
private object ZorderByProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "zorder_by"
  override def description(): String =
    "rewrite the current snapshot Morton-clustered over 2-4 bigint columns"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("target_rows", LongType).build(),
    ProcedureParameter.in("cols", org.apache.spark.sql.types.StringType).build())

  private def resultSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("files_before", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("files_after", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val path = input.getUTF8String(0).toString
    val target = input.getLong(1)
    val cols = input.getUTF8String(2).toString.split(',').toSeq
      .map(_.trim).filter(_.nonEmpty)
    val (b, a) = StoreSink.compactZorder(
      org.apache.spark.sql.SparkSession.active, path, target, cols)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(InternalRow(b.toLong, a.toLong))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.tag(path, name, version)` — pin an archived version under a
  * human name (`VERSION AS OF 'name'` then resolves it; vacuum refuses to
  * expire it). Audit row: (tagged_version, n_tags). */
private object TagProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "tag"
  override def description(): String =
    "pin an archived store version under a named tag"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("name", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("version", LongType).build())

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val path = input.getUTF8String(0).toString
    val tagName = input.getUTF8String(1).toString
    val v = input.getLong(2).toInt
    StoreSink.tag(path, tagName, v)
    val root = new org.apache.hadoop.fs.Path(path)
    val n = StoreSink.readTags(root, StoreSink.fs(root)).size.toLong
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          org.apache.spark.sql.types.StructField("tagged_version", LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n_tags", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(InternalRow(v.toLong, n))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.history(path)` — the table's commit audit: one row per
  * archived generation with its ledger instant and LIST-metadata file/row
  * totals (no segment or data reads). This is how an operator answers
  * "what changed and when" and how a user finds the instant to feed
  * `TIMESTAMP AS OF`. */
private object HistoryProcedure
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = "history"
  override def description(): String =
    "commit audit: (version, ts_ms, n_files, n_rows) per archived generation"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // reads store state

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build())

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val audit = StoreSink.history(input.getUTF8String(0).toString)
      .map { case (v, ts, nf, nr) => InternalRow(v.toLong, ts, nf, nr) }
      .toArray
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          org.apache.spark.sql.types.StructField("version", LongType, nullable = false),
          org.apache.spark.sql.types.StructField("ts_ms", LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n_files", LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n_rows", LongType, nullable = false)))
        override def rows(): Array[InternalRow] = audit
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** Shared shape of the two WAP branch procedures: (path, branch name) in,
  * a one-row audit out. */
private sealed abstract class BranchProcedure(procName: String,
                                              resultCols: (String, String))
    extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
    with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}

  override def name(): String = procName
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("path", org.apache.spark.sql.types.StringType).build(),
    ProcedureParameter.in("branch", org.apache.spark.sql.types.StringType).build())

  protected def run(path: String, branch: String): (Long, Long)

  override def call(input: InternalRow): util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
    val (a, b) = run(input.getUTF8String(0).toString, input.getUTF8String(1).toString)
    val scan: org.apache.spark.sql.connector.read.Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = StructType(Seq(
          org.apache.spark.sql.types.StructField(resultCols._1, LongType, nullable = false),
          org.apache.spark.sql.types.StructField(resultCols._2, LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(InternalRow(a, b))
      }
    util.Collections.singletonList(scan).iterator()
  }
}

/** `CALL graft.publish(path, branch)` — fold an audited WAP branch into
  * main in one versioned manifest swap. */
private object PublishProcedure
    extends BranchProcedure("publish", ("files_published", "rows_published")) {
  override def description(): String =
    "fold a write-audit-publish branch's staged files into the main manifest"
  override protected def run(path: String, branch: String): (Long, Long) =
    StoreSink.publish(path, branch)
}

/** `CALL graft.abandon(path, branch)` — discard a WAP branch; vacuum GCs
  * its never-visible files. */
private object AbandonProcedure
    extends BranchProcedure("abandon", ("files_dropped", "rows_dropped")) {
  override def description(): String =
    "discard a write-audit-publish branch (staged files GC on next vacuum)"
  override protected def run(path: String, branch: String): (Long, Long) =
    (StoreSink.abandon(path, branch), 0L)
}

/** `CALL graft.rollback(path, version)` — publish an archived generation's
  * content as a NEW version: undo without history rewrite (the bad
  * generation stays time-travelable; the rollback is itself a
  * ledger-stamped commit). */
private object RollbackProcedure
    extends StoreProcedure("rollback", ("restored_version", "new_version")) {
  override protected def argName = "version"
  override protected def run(path: String, arg: Long): (Long, Long) =
    StoreSink.rollback(path, arg.toInt)
  override def description(): String =
    "restore an archived version's content as a new commit (history preserved)"
}

/** `CALL graft.expire(path, before_ms)` — timestamp-based retention: expire
  * archived versions committed before the epoch-ms cutoff (the Iceberg
  * expire_snapshots(older_than) form). The newest version and tags always
  * survive; see [[StoreSink.expireBefore]]. */
private object ExpireProcedure
    extends StoreProcedure("expire", ("versions_expired", "versions_kept")) {
  override protected def argName = "before_ms"
  override protected def run(path: String, arg: Long): (Long, Long) = {
    val (e, k) = StoreSink.expireBefore(path, arg)
    (e.toLong, k.toLong)
  }
  override def description(): String =
    "expire archived versions whose commit instant predates before_ms, then GC"
}

/** `CALL graft.remove_orphans(path, older_ms)` — delete unreferenced
  * data-shaped files older than the cutoff (crashed-writer leftovers);
  * see [[StoreSink.removeOrphans]] for the age-based safety margin. */
private object RemoveOrphansProcedure
    extends StoreProcedure("remove_orphans", ("orphans_deleted", "files_examined")) {
  override protected def argName = "older_ms"
  override protected def run(path: String, arg: Long): (Long, Long) = {
    val (del, n) = StoreSink.removeOrphans(path, arg)
    (del.toLong, n.toLong)
  }
  override def description(): String =
    "delete unreferenced data files older than older_ms (crash leftovers)"
}

private object VacuumProcedure
    extends StoreProcedure("vacuum", ("versions_kept", "live_files")) {
  override protected def argName = "keep_versions"
  override protected def run(path: String, arg: Long): (Long, Long) = {
    StoreSink.vacuum(path, arg.toInt)
    val root = new org.apache.hadoop.fs.Path(path)
    val fsys = StoreSink.fs(root)
    val versions = StoreSink.listVersions(root, fsys).size.toLong
    val live = StoreSink.listDataFiles(root, fsys).size.toLong
    (versions, live)
  }
  override def description(): String =
    "expire archived manifests beyond keep_versions, then GC unreferenced files"
}

private object StoreMetaTable {
  val Kinds: Set[String] = Set("files", "partitions", "history")
}

/** Metadata INSPECTION table over a store (`graft.`store$files`` etc.):
  * manifest facts as an ordinary relation. Served as a
  * [[org.apache.spark.sql.connector.read.LocalScan]] — the rows are
  * driver-resident metadata (list + matched segments), never data reads;
  * at 100 TB `files` over a 10⁷-file table would switch to planning the
  * SEGMENT files as input partitions (metadata-as-data, the Iceberg
  * metadata-table design), same surface. */
private class StoreMetaTable(pathStr: String, kind: String)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

  override def name(): String = s"graft_store_meta($pathStr,$kind)"

  override def schema(): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("min_k", LongType, nullable = true),
      StructField("max_k", LongType, nullable = true),
      StructField("bytes", LongType, nullable = true),
      StructField("part", StringType, nullable = true),
      StructField("has_dv", IntegerType, nullable = false),
      StructField("has_eq", IntegerType, nullable = false),
      StructField("min_a", LongType, nullable = true),
      StructField("max_a", LongType, nullable = true),
      // declared-column bounds (manifest field 12) as `col:min:max;...`
      StructField("stats", StringType, nullable = true)))
    case "partitions" => StructType(Seq(
      StructField("part", StringType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false)))
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("ts_ms", LongType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false)))
  }

  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.LocalScan {
      override def readSchema(): StructType = StoreMetaTable.this.schema()
      override def rows(): Array[InternalRow] = {
        val root = new org.apache.hadoop.fs.Path(pathStr)
        val fsys = StoreSink.fs(root)
        def str(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        kind match {
          case "files" =>
            StoreSink.readEntries(root, fsys).map { e =>
              InternalRow(str(e.name), e.rows,
                e.minK.map(java.lang.Long.valueOf).orNull,
                e.maxK.map(java.lang.Long.valueOf).orNull,
                e.bytes.map(java.lang.Long.valueOf).orNull,
                e.part.map(str).orNull,
                if (e.dv.isDefined) 1 else 0,
                if (e.eq.isDefined) 1 else 0,
                e.minA.map(java.lang.Long.valueOf).orNull,
                e.maxA.map(java.lang.Long.valueOf).orNull,
                if (e.stats.isEmpty) null
                else str(e.stats.map { case (c, lo, hi) => s"$c:$lo:$hi" }
                  .mkString(";")))
            }.toArray
          case "partitions" =>
            StoreSink.readEntries(root, fsys).filter(_.part.isDefined)
              .groupBy(_.part.get).toSeq.sortBy(_._1).map { case (p, es) =>
                InternalRow(str(p), es.size.toLong,
                  es.map(e => math.max(e.rows, 0L)).sum)
              }.toArray
          case "history" =>
            StoreSink.history(pathStr).map { case (v, ts, nf, nr) =>
              InternalRow(v.toLong, ts, nf, nr)
            }.toArray
        }
      }
    }
}

/** The staged half of an atomic CTAS/RTAS: a store table whose write commit
  * is its own registration (see [[GraftCatalog.stageCreate]] /
  * [[GraftCatalog.stageReplace]]). `restoreOnAbort` marks the REPLACE mode:
  * the write runs as a TRUNCATE (one manifest swap replaces the content);
  * abort restores the saved (extras, partSpec, constraints) sidecars and
  * leaves the old table — only a failed CREATE deletes the directory. */
private class StagedStoreTable(pathStr: String, ctasSchema: StructType,
                               partitions: Array[Transform] = Array.empty,
                               restoreOnAbort: Option[(Seq[StoreSink.ExtraField],
                                 Option[StoreSink.PartSpec], Seq[(String, String)],
                                 Option[Int])] = None)
    extends org.apache.spark.sql.connector.catalog.StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft_store_staged($pathStr)"
  override def schema(): StructType = ctasSchema
  override def partitioning(): Array[Transform] = partitions
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog.TableCapability.BATCH_WRITE,
      org.apache.spark.sql.connector.catalog.TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder = {
    val b = new StoreWriteBuilder(pathStr, info, partitions, viaCatalog = true)
    // REPLACE: the new generation must swap in whole, not union with the
    // old manifest — force the truncate commit shape
    if (restoreOnAbort.isDefined) b.truncate().asInstanceOf[StoreWriteBuilder] else b
  }

  override def commitStagedChanges(): Unit = ()
  override def abortStagedChanges(): Unit = restoreOnAbort match {
    // CTAS failed after staging: remove the directory — the manifest never
    // appeared, so the table never existed
    case None =>
      val root = new org.apache.hadoop.fs.Path(pathStr)
      StoreSink.fs(root).delete(root, true)
    // RTAS failed: the manifest never swapped; put the metadata sidecars
    // back so the OLD table reads exactly as before the attempt
    case Some((extras, spec, cons, archivedV)) =>
      val root = new org.apache.hadoop.fs.Path(pathStr)
      val fsys = StoreSink.fs(root)
      StoreSink.withCommitLock(root, fsys) {
        StoreSink.writeExtras(root, fsys, extras)
        archivedV.foreach(v => StoreSink.manifestFs(fsys)
          .delete(StoreSink.schemaArchivePath(root, v), false))
        spec match {
          case Some(sp) => StoreSink.writePartSpec(root, fsys, sp)
          case None => StoreSink.manifestFs(fsys)
            .delete(new org.apache.hadoop.fs.Path(root, StoreSink.PartFile), false)
        }
        if (cons.nonEmpty) StoreSink.writeConstraints(root, fsys, cons)
      }
  }
}

/** `graft.checksum(x BIGINT) → BIGINT` — an order-independent CONTENT
  * CHECKSUM aggregate (the CHECKSUM_AGG warehouses ship, which Spark
  * lacks), bound as a V2 [[org.apache.spark.sql.connector.catalog.functions.AggregateFunction]]
  * through the same FunctionCatalog as the scalar functions. Each value
  * contributes a Lehmer hash (x·48271 mod 2³¹−1, after mod-reduction into
  * the field) and the state is their SUM — commutative and associative, so
  * Spark's partial-aggregate tree (update map-side, merge at exchange)
  * gives the same answer under any row order or partitioning. NULLs
  * contribute a fixed token so content with different null counts hashes
  * apart. The oracle reproduces the exact arithmetic in SQL; the query
  * pins the operational use: the checksum is INVARIANT under compaction
  * (content-preserving maintenance verified in one aggregate pass, the way
  * a production migration validates a rewrite without a row-by-row diff).
  * Sum wraps mod 2⁶³ on the JVM; the SQL twin is exact while
  * rows·(2³¹−1) < 2⁶³ (~4.3e9 rows — beyond that, compare wrapped). */
private object ChecksumFunction extends UnboundFunction {
  override def name(): String = "checksum"
  override def description(): String =
    "checksum(x): order-independent content checksum (sum of Lehmer-hashed values)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
            inputType.fields(0).dataType == LongType,
      s"graft.checksum takes one BIGINT argument, got ${inputType.simpleString}")
    ChecksumBound
  }
}

private object ChecksumBound
    extends org.apache.spark.sql.connector.catalog.functions.AggregateFunction[java.lang.Long, java.lang.Long] {
  private val M = 2147483647L // 2^31 - 1 (Lehmer modulus)

  def hash(x: Long): Long = ((x % M) + M) % M * 48271L % M

  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "checksum"
  override def canonicalName(): String = "graft.checksum"
  override def isResultNullable: Boolean = false

  override def newAggregationState(): java.lang.Long = 0L
  override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state + 1L // a fixed NULL token
    else state + hash(input.getLong(0))
  override def merge(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
    a + b
  override def produceResult(state: java.lang.Long): java.lang.Long = state
}

/** `graft.amt(id BIGINT) → BIGINT` — the store's canonical amount
  * derivation (BucketSource's closed form), bound as a V2 ScalarFunction. */
private object AmtFunction extends UnboundFunction {
  override def name(): String = "amt"
  override def description(): String =
    "amt(id): deterministic amount for a key (id * 13 % 1000)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
            inputType.fields(0).dataType == LongType,
      s"graft.amt takes one BIGINT argument, got ${inputType.simpleString}")
    AmtBound
  }
}

/** `bucket(n INT, k BIGINT) → INT` — the store's bucket partition transform
  * as a catalog-resolvable V2 function. Spark's SPJ planner
  * (V2ScanPartitioning) turns a reported `bucket(n, k)`
  * KeyGroupedPartitioning into a TransformExpression only if the table's
  * catalog serves this lookup; compatibility between two scans compares the
  * bound function's CANONICAL name + bucket count, so two graft stores
  * bucketed the same way align group-for-group. Mirrors
  * [[StoreSink.PartSpec.valueOf]]: floorMod(k, n), null → -1. */
private object BucketPartFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, k): the graft-store partition transform (floorMod(k, n))"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
            inputType.fields(0).dataType == org.apache.spark.sql.types.IntegerType &&
            inputType.fields(1).dataType == LongType,
      s"graft.bucket takes (INT n, BIGINT k), got ${inputType.simpleString}")
    BucketPartBound
  }
}

private object BucketPartBound extends ScalarFunction[java.lang.Integer] {
  override def inputTypes(): Array[DataType] =
    Array(org.apache.spark.sql.types.IntegerType, LongType)
  override def resultType(): DataType = org.apache.spark.sql.types.IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false

  /** Magic method — resolved statically and invoked from generated code. */
  def invoke(n: Int, k: Long): Int = java.lang.Math.floorMod(k, n.toLong).toInt

  override def produceResult(input: InternalRow): java.lang.Integer =
    if (input.isNullAt(1)) -1
    else java.lang.Math.floorMod(input.getLong(1), input.getInt(0).toLong).toInt
}

private object AmtBound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "amt"
  override def canonicalName(): String = "graft.amt"
  override def isResultNullable: Boolean = false

  /** Magic method — resolved statically and invoked from generated code. */
  def invoke(id: Long): Long = BucketSource.amtOf(id)

  /** Interpreted fallback required by the ScalarFunction contract. */
  override def produceResult(input: InternalRow): java.lang.Long =
    BucketSource.amtOf(input.getLong(0))
}
