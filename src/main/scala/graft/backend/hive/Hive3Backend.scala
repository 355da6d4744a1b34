package graft.backend.hive

import graft.backend.{CreateMode, DropMode, MetadataBackend, Page, TableInfo}
import graft.core.{GraftError, ObjectIdentifier}

/** Hive 3.x metastore backend, LIVE for ALL catalogs.
  *
  * Identifier shape per the reference (`Hive3Namespace.java:110`,
  * `hive3.py:104`): 1 level = catalog, 2 levels = catalog.database,
  * 3 levels = catalog.database.table; default catalog `"hive"`.
  *
  * This build carries only the Hive 2.3 client jars, so the Hive 3
  * surface is spoken through two public compatibility paths instead of
  * the Hive 3 generated client:
  *
  *  1. '''Catalog-scoped RPCs''' (`get_catalogs` / `get_catalog` /
  *     `create_catalog` / `drop_catalog`, the ops
  *     `Hive3Namespace.java:389-469,681-714` drives) are hand-framed over
  *     the wire by [[Hive3CatalogClient]] — the IDL is public and the
  *     transport is plain unframed TBinaryProtocol.
  *  2. '''Database/table operations inside a catalog''' ride the
  *     2.x-compatible calls with HMS 3.x's catalog-prefixed name
  *     encoding (`@catalog#database`, `MetaStoreUtils.prependCatalogToDbName`
  *     / `parseDbName` — the documented compat path for pre-3 clients),
  *     through the same pooled [[Hive2Backend]] core. The default
  *     catalog keeps plain names, which HMS 3.x resolves to its
  *     configured default — identical to what the Hive 3 client sends.
  *
  * Against a pre-3.0 metastore the catalog RPCs answer UNKNOWN_METHOD:
  * listings then degrade to the default catalog only, and any operation
  * on a non-default catalog fails loudly with the spec's code-17 — never
  * a silent fallback to the wrong catalog.
  */
class Hive3Backend extends MetadataBackend with AutoCloseable {

  /** Default catalog name (`hive3.py:104`). */
  val DefaultCatalog = "hive"

  private val inner = new Hive2Backend
  private var conf: Map[String, String] = Map.empty
  @volatile private var catClient: Hive3CatalogClient = _

  override def initialize(props: Map[String, String]): Unit = {
    conf = props
    inner.initialize(props)
  }

  override def backendId: String =
    inner.backendId.replaceFirst("^hive2", "hive3")

  override def close(): Unit = {
    inner.close()
    synchronized { if (catClient != null) { catClient.close(); catClient = null } }
  }

  private def root: String = conf.getOrElse("root", "/tmp/graft-warehouse")

  /** Dedicated catalog-RPC connection to the first configured URI. */
  private def catalogs(): Hive3CatalogClient = {
    if (catClient == null) synchronized {
      if (catClient == null) {
        val uri = conf.getOrElse("hive.metastore.uris",
          throw GraftError.ServiceUnavailable(
            "hive3 backend requires hive.metastore.uris"))
        val hp = uri.split(",").head.trim.stripPrefix("thrift://")
        val (host, port) = hp.split(":") match {
          case Array(h, p) => (h, p.toInt)
          case _ => throw GraftError.InvalidInput(
            s"cannot parse hive.metastore.uris '$uri'")
        }
        val timeout = conf.get("read_timeout_ms").map(_.toInt).getOrElse(30000)
        catClient = new Hive3CatalogClient(host, port, timeout)
      }
    }
    catClient
  }

  private def validateDepth(id: ObjectIdentifier, lo: Int, hi: Int): Unit =
    if (id.depth < lo || id.depth > hi)
      throw GraftError.InvalidInput(
        s"hive3 namespaces are 1 (catalog) or 2 (catalog.database) levels, got $id")

  private def validNamePart(s: String): String = {
    if (s.contains("@") || s.contains("#"))
      throw GraftError.InvalidInput(
        s"'@' and '#' are reserved by the HMS catalog name encoding: $s")
    s.toLowerCase
  }

  /** HMS 3.x catalog-prefixed database name for the 2.x-compatible wire
    * (`MetaStoreUtils.prependCatalogToDbName`): plain name in the default
    * catalog, `@catalog#database` elsewhere.
    *
    * Where the server strips it — per RPC this backend sends through the
    * 2.x client (the HIVE-18685 compat path, `MetaStoreUtils.parseDbName`
    * in `HiveMetaStore$HMSHandler`, applied before the `isSetCatName` /
    * `isSetCatalogName` defaulting):
    *  - string db-name args: `get_database`, `drop_database`,
    *    `alter_database` (arg 1), `get_all_tables`, `get_tables`,
    *    `get_table`, `get_table_objects_by_name`,
    *    `get_table_names_by_filter`, `drop_table`, and the
    *    `get_databases("@cat#*")` pattern listing;
    *  - STRUCT-carried names: `create_database` (`Database.name`,
    *    IDL field 1), `create_table` (`Table.dbName`, IDL field 2),
    *    `alter_database` (arg 2, `Database.name`).
    * The test front (`LocalHive3Metastore.NameFieldPaths`) rewrites
    * exactly these positions and THROWS on an encoded name anywhere
    * else, so this list is executable: a new call site that assumes
    * parseDbName where the front (our model of HMS 3.x) does not apply
    * it fails the suite instead of silently passing. Validation against
    * a genuine HMS >= 3.0 remains gated behind GRAFT_IT_*
    * (`RestIntegrationSpec`) — no such endpoint exists in this sandbox. */
  private def encodeDb(cat: String, db: String): String =
    if (cat == DefaultCatalog) db else s"@$cat#$db"

  /** Positive catalog-existence cache: non-default-catalog operations
    * verify the catalog once (matching the reference's
    * `getCatalogOrThrowNotFoundException` pre-checks and keeping errors
    * honest on pre-3.0 servers — code-17, never a misleading
    * namespace-not-found) and then skip the extra RPC for the session.
    * This backend's OWN drops evict their entry (both drop sites), so a
    * self-dropped catalog is honestly NamespaceNotFound on the next use;
    * only a catalog dropped by a DIFFERENT client surfaces as the
    * underlying database/table error, which is what HMS itself would
    * return to that client too. */
  private val knownCatalogs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def ensureCatalog(cat: String): Unit =
    if (cat != DefaultCatalog && !knownCatalogs.contains(cat)) {
      requireCatalog(cat)
      knownCatalogs.add(cat); ()
    }

  /** catalog.database → the single-level identifier the Hive2 core sends. */
  private def innerNs(id: ObjectIdentifier): ObjectIdentifier = {
    val cat = validNamePart(id.levels.head)
    val db = validNamePart(id.levels(1))
    ensureCatalog(cat)
    ObjectIdentifier.of(encodeDb(cat, db))
  }

  private def innerTable(id: ObjectIdentifier): ObjectIdentifier = {
    val cat = validNamePart(id.levels.head)
    val db = validNamePart(id.levels(1))
    ensureCatalog(cat)
    ObjectIdentifier.of(encodeDb(cat, db), id.levels(2).toLowerCase)
  }

  private def describeCatalogProps(c: HmsCatalog): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    c.description.foreach(b += "description" -> _)
    if (c.locationUri.nonEmpty) b += "catalog.location.uri" -> c.locationUri
    b.result()
  }

  private def getCatalogOrNull(name: String): Option[HmsCatalog] =
    catalogs().getCatalog(name)

  private def requireCatalog(name: String): HmsCatalog =
    try getCatalogOrNull(name).getOrElse(
      throw GraftError.NamespaceNotFound(ObjectIdentifier.of(name)))
    catch {
      case CatalogsUnsupported(m) =>
        if (name == DefaultCatalog)
          // pre-3.0 server: the implicit default catalog always exists
          HmsCatalog(DefaultCatalog, None, "")
        else throw GraftError.ServiceUnavailable(m)
    }

  /** Plain database names inside a catalog (`getAllDatabases(catName)` in
    * the reference, `get_databases("@cat#*")` on this wire). */
  private def databasesIn(cat: String): Seq[String] =
    if (cat == DefaultCatalog)
      inner.listNamespaces(ObjectIdentifier.root).map(_.levels.head)
    else inner.listDatabasesByPattern(s"@$cat#*").sorted

  // ---- namespaces -----------------------------------------------------

  override def listNamespaces(parent: ObjectIdentifier): Seq[ObjectIdentifier] =
    if (parent.isRoot) {
      val names =
        try catalogs().getCatalogs()
        catch { case CatalogsUnsupported(_) => Seq(DefaultCatalog) }
      names.sorted.map(ObjectIdentifier.of(_))
    } else {
      validateDepth(parent, 1, 2)
      if (parent.depth == 2) { requireCatalog(validNamePart(parent.levels.head)); Nil }
      else {
        val cat = validNamePart(parent.levels.head)
        requireCatalog(cat)
        databasesIn(cat).map(db => ObjectIdentifier.of(cat, db))
      }
    }

  override def createNamespace(id: ObjectIdentifier, properties: Map[String, String],
      mode: CreateMode): Map[String, String] = {
    if (id.isRoot) throw GraftError.InvalidInput("cannot create root namespace")
    validateDepth(id, 1, 2)
    if (id.depth == 1) createCatalog(validNamePart(id.levels.head), properties, mode)
    else {
      val cat = validNamePart(id.levels.head)
      val catalog = requireCatalog(cat)
      // Non-default catalogs: default the database location under the
      // catalog's locationUri (`Hive3Namespace.createDatabase`) — the
      // inner core's own default would embed the encoded '@cat#' name
      // in a path.
      val props =
        if (cat == DefaultCatalog || properties.contains("database.location-uri"))
          properties
        else {
          val base = Option(catalog.locationUri).filter(_.nonEmpty)
            .getOrElse(s"${root.stripSuffix("/")}/$cat")
          properties + ("database.location-uri" ->
            s"${base.stripSuffix("/")}/${validNamePart(id.levels(1))}")
        }
      inner.createNamespace(innerNs(id), props, mode)
    }
  }

  /** Re-raise a catalog-RPC-on-pre-3.0-server condition as the spec's
    * code-17 — [[CatalogsUnsupported]] must never escape raw. */
  private def wireCat[T](f: => T): T =
    try f catch { case CatalogsUnsupported(m) => throw GraftError.ServiceUnavailable(m) }

  /** `Hive3Namespace.createCatalog:431-469`: tri-modal create with the
    * location defaulting under the warehouse root. On a pre-3.0 server
    * the implicit default catalog still "exists": ExistOk is a no-op and
    * Create fails AlreadyExists, consistent with namespaceExists /
    * describeNamespace; only an actual catalog mutation needs the
    * catalog wire and fails code-17 there. */
  private def createCatalog(name: String, properties: Map[String, String],
      mode: CreateMode): Map[String, String] = {
    val existing =
      try getCatalogOrNull(name)
      catch {
        case CatalogsUnsupported(m) =>
          if (name == DefaultCatalog) Some(HmsCatalog(DefaultCatalog, None, ""))
          else throw GraftError.ServiceUnavailable(m)
      }
    existing match {
      case Some(c) => mode match {
        case CreateMode.Create =>
          throw GraftError.NamespaceAlreadyExists(ObjectIdentifier.of(name))
        case CreateMode.ExistOk => return describeCatalogProps(c)
        case CreateMode.Overwrite =>
          // restrict-style: a non-empty catalog must not be clobbered
          val dbs = databasesIn(name)
          if (dbs.nonEmpty)
            throw GraftError.InvalidInput(
              s"cannot overwrite non-empty catalog $name (${dbs.size} databases)")
          wireCat(catalogs().dropCatalog(name))
          // evict BEFORE the recreate below: if create_catalog then fails,
          // the positive cache must not keep serving the dropped catalog
          knownCatalogs.remove(name); ()
      }
      case None => ()
    }
    val loc = properties.getOrElse("catalog.location.uri",
      s"${root.stripSuffix("/")}/$name")
    val desc = properties.get("description")
    wireCat {
      catalogs().createCatalog(HmsCatalog(name, desc, loc))
      describeCatalogProps(
        getCatalogOrNull(name).getOrElse(HmsCatalog(name, desc, loc)))
    }
  }

  override def namespaceExists(id: ObjectIdentifier): Boolean = {
    validateDepth(id, 1, 2)
    val cat = validNamePart(id.levels.head)
    if (id.depth == 1)
      try getCatalogOrNull(cat).isDefined
      catch { case CatalogsUnsupported(_) => cat == DefaultCatalog }
    else
      try inner.namespaceExists(innerNs(id))
      catch { case _: GraftError.NamespaceNotFound => false } // catalog gone
  }

  override def describeNamespace(id: ObjectIdentifier): Map[String, String] = {
    validateDepth(id, 1, 2)
    if (id.depth == 1) describeCatalogProps(requireCatalog(validNamePart(id.levels.head)))
    else inner.describeNamespace(innerNs(id))
  }

  override def updateNamespaceProperties(id: ObjectIdentifier,
      updates: Map[String, String], removals: Set[String]): Map[String, String] = {
    validateDepth(id, 2, 2) // catalog properties are not alterable here
    inner.updateNamespaceProperties(innerNs(id), updates, removals)
  }

  override def dropNamespace(id: ObjectIdentifier, mode: DropMode): Map[String, String] = {
    validateDepth(id, 1, 2)
    if (id.depth == 1) {
      // `Hive3Namespace.doDropCatalog:681-714`: restrict-only
      val cat = validNamePart(id.levels.head)
      val existing =
        try getCatalogOrNull(cat)
        catch { case CatalogsUnsupported(m) => throw GraftError.ServiceUnavailable(m) }
      existing match {
        case None => mode match {
          case DropMode.Fail => throw GraftError.NamespaceNotFound(id)
          case DropMode.Skip => Map.empty
        }
        case Some(c) =>
          val dbs = databasesIn(cat)
          if (dbs.nonEmpty)
            throw GraftError.InvalidInput(
              s"catalog $cat is not empty (restrict drop): ${dbs.size} databases")
          val props = describeCatalogProps(c)
          wireCat(catalogs().dropCatalog(cat))
          // a self-drop must not leave the positive existence cache
          // serving the dropped catalog
          knownCatalogs.remove(cat); ()
          props
      }
    } else inner.dropNamespace(innerNs(id), mode)
  }

  // ---- tables ---------------------------------------------------------

  override def listTables(ns: ObjectIdentifier): Seq[ObjectIdentifier] = {
    validateDepth(ns, 2, 2)
    inner.listTables(innerNs(ns)).map(t => ns.lowered.child(t.name))
  }

  override def listTablesPaged(ns: ObjectIdentifier, pageToken: Option[String],
      limit: Option[Int]): Page[ObjectIdentifier] = {
    validateDepth(ns, 2, 2)
    val p = inner.listTablesPaged(innerNs(ns), pageToken, limit)
    Page(p.items.map(t => ns.lowered.child(t.name)), p.nextToken)
  }

  override def tableExists(id: ObjectIdentifier): Boolean =
    id.depth == 3 && (
      try inner.tableExists(innerTable(id))
      catch { case _: GraftError.NamespaceNotFound => false }) // catalog gone

  private def requireTableId(id: ObjectIdentifier): Unit =
    if (id.depth != 3)
      throw GraftError.InvalidInput(s"hive3 table ids are catalog.database.table, got $id")

  override def describeTable(id: ObjectIdentifier): TableInfo = {
    requireTableId(id)
    inner.describeTable(innerTable(id)).copy(id = id.lowered)
  }

  override def describeTables(ids: Seq[ObjectIdentifier]): Seq[TableInfo] = {
    ids.foreach(requireTableId)
    val innerIds = ids.map(innerTable) // preserves caller order
    val byInner = innerIds.zip(ids).toMap
    inner.describeTables(innerIds).map(info =>
      info.copy(id = byInner(info.id).lowered))
  }

  override def declareTable(id: ObjectIdentifier, location: Option[String],
      properties: Map[String, String], schemaJson: Option[String]): TableInfo = {
    requireTableId(id)
    inner.declareTable(innerTable(id), location, properties, schemaJson)
      .copy(id = id.lowered)
  }

  override def dropTable(id: ObjectIdentifier, purge: Boolean): TableInfo = {
    if (id.depth != 3) throw GraftError.TableNotFound(id)
    inner.dropTable(innerTable(id), purge).copy(id = id.lowered)
  }
}
