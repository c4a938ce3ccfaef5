package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
class GraftCatalog extends CatalogPlugin with TableCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def tables: Map[String, () => Table] = Map(
    "range_200k" -> (() => new RangeTable(0L, 200000L)),
    "bucket_fact" -> (() => new BucketTable(40000L, 8)),
    "bucket_dim" -> (() => new BucketTable(8L, 8)))

  private def inDefaultNs(ident: Identifier): Boolean =
    ident.namespace().isEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    tables.keys.toArray.sorted.map(Identifier.of(Array.empty, _))
  }

  override def loadTable(ident: Identifier): Table =
    if (inDefaultNs(ident))
      tables.get(ident.name().toLowerCase(java.util.Locale.ROOT)) match {
        case Some(mk) => mk()
        case None     => throw new NoSuchTableException(ident)
      }
    else throw new NoSuchTableException(ident)

  override def tableExists(ident: Identifier): Boolean =
    inDefaultNs(ident) &&
      tables.contains(ident.name().toLowerCase(java.util.Locale.ROOT))

  // Read-only catalog: DDL is declined loudly, never silently ignored.
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
