package graft.backend.hive

import graft.backend.{CreateMode, DropMode, MetadataBackend, Page, TableInfo}
import graft.core.{GraftError, ObjectIdentifier}

/** Hive 3.x metastore backend, LIVE for the default catalog.
  *
  * Identifier shape per the reference (`Hive3Namespace.java:110`,
  * `hive3.py:104`): 1 level = catalog, 2 levels = catalog.database,
  * default catalog `"hive"`. This build carries only the Hive 2.3 client
  * jars, and HMS 3.x keeps thrift compatibility with 2.x clients for
  * every non-catalog-scoped operation — those address the DEFAULT catalog
  * implicitly. So this adapter is the Hive 2 core behind a
  * catalog-qualified identifier surface: operations under `hive.*` run
  * against a real metastore; any other catalog name needs the Hive 3
  * client's catalog-scoped thrift calls and fails loudly with the spec's
  * code-17 ServiceUnavailable (never a silent fallback to the wrong
  * catalog). Tested against the embedded metastore, whose wire protocol
  * for these operations is identical.
  */
class Hive3Backend extends MetadataBackend with AutoCloseable {

  /** Default catalog name (`hive3.py:104`). */
  val DefaultCatalog = "hive"

  private val inner = new Hive2Backend

  override def initialize(props: Map[String, String]): Unit = inner.initialize(props)

  override def backendId: String =
    inner.backendId.replaceFirst("^hive2", "hive3")

  override def close(): Unit = inner.close()

  private def validateDepth(id: ObjectIdentifier, lo: Int, hi: Int): Unit =
    if (id.depth < lo || id.depth > hi)
      throw GraftError.InvalidInput(
        s"hive3 namespaces are 1 (catalog) or 2 (catalog.database) levels, got $id")

  /** Strip the leading catalog level, refusing non-default catalogs —
    * the 2.x client protocol cannot scope to them. */
  private def unqualify(id: ObjectIdentifier): ObjectIdentifier = {
    val cat = id.levels.head.toLowerCase
    if (cat != DefaultCatalog)
      throw GraftError.ServiceUnavailable(
        s"hive3 catalog '$cat' needs the Hive 3 catalog-scoped client " +
          s"(only the default '$DefaultCatalog' catalog is addressable " +
          "with the Hive 2.x client protocol in this build)")
    ObjectIdentifier(id.levels.tail)
  }

  private def qualify(id: ObjectIdentifier): ObjectIdentifier =
    ObjectIdentifier(DefaultCatalog +: id.levels)

  override def listNamespaces(parent: ObjectIdentifier): Seq[ObjectIdentifier] =
    if (parent.isRoot) Seq(ObjectIdentifier.of(DefaultCatalog))
    else {
      validateDepth(parent, 1, 2)
      if (parent.depth == 2) { unqualify(parent); Nil } // dbs have no children
      else {
        unqualify(parent) // rejects non-default catalogs
        inner.listNamespaces(ObjectIdentifier.root).map(qualify)
      }
    }

  override def createNamespace(id: ObjectIdentifier, properties: Map[String, String],
      mode: CreateMode): Map[String, String] = {
    if (id.isRoot) throw GraftError.InvalidInput("cannot create root namespace")
    validateDepth(id, 2, 2)
    inner.createNamespace(unqualify(id), properties, mode)
  }

  override def namespaceExists(id: ObjectIdentifier): Boolean = {
    validateDepth(id, 1, 2)
    if (id.depth == 1) id.levels.head.equalsIgnoreCase(DefaultCatalog)
    else inner.namespaceExists(unqualify(id))
  }

  override def describeNamespace(id: ObjectIdentifier): Map[String, String] = {
    validateDepth(id, 1, 2)
    if (id.depth == 1) {
      if (!id.levels.head.equalsIgnoreCase(DefaultCatalog))
        throw GraftError.NamespaceNotFound(id)
      Map.empty
    } else inner.describeNamespace(unqualify(id))
  }

  override def updateNamespaceProperties(id: ObjectIdentifier,
      updates: Map[String, String], removals: Set[String]): Map[String, String] = {
    validateDepth(id, 2, 2)
    inner.updateNamespaceProperties(unqualify(id), updates, removals)
  }

  override def dropNamespace(id: ObjectIdentifier, mode: DropMode): Map[String, String] = {
    validateDepth(id, 2, 2)
    inner.dropNamespace(unqualify(id), mode)
  }

  override def listTables(ns: ObjectIdentifier): Seq[ObjectIdentifier] = {
    validateDepth(ns, 2, 2)
    inner.listTables(unqualify(ns)).map(t => qualify(t))
  }

  override def listTablesPaged(ns: ObjectIdentifier, pageToken: Option[String],
      limit: Option[Int]): Page[ObjectIdentifier] = {
    validateDepth(ns, 2, 2)
    val p = inner.listTablesPaged(unqualify(ns), pageToken, limit)
    Page(p.items.map(qualify), p.nextToken)
  }

  override def tableExists(id: ObjectIdentifier): Boolean =
    id.depth == 3 && inner.tableExists(unqualify(id))

  override def describeTable(id: ObjectIdentifier): TableInfo = {
    if (id.depth != 3)
      throw GraftError.InvalidInput(s"hive3 table ids are catalog.database.table, got $id")
    val info = inner.describeTable(unqualify(id))
    info.copy(id = qualify(info.id))
  }

  override def declareTable(id: ObjectIdentifier, location: Option[String],
      properties: Map[String, String], schemaJson: Option[String]): TableInfo = {
    if (id.depth != 3)
      throw GraftError.InvalidInput(s"hive3 table ids are catalog.database.table, got $id")
    val info = inner.declareTable(unqualify(id), location, properties, schemaJson)
    info.copy(id = qualify(info.id))
  }

  override def dropTable(id: ObjectIdentifier, purge: Boolean): TableInfo = {
    if (id.depth != 3) throw GraftError.TableNotFound(id)
    val info = inner.dropTable(unqualify(id), purge)
    info.copy(id = qualify(info.id))
  }
}
