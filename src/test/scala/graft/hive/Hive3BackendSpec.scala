package graft.hive

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.{CreateMode, DropMode}
import graft.core.{GraftError, ObjectIdentifier}

/** Hive3 backend against the embedded metastore: the catalog-qualified
  * identifier surface (`hive.db.table`) over the live thrift core. HMS
  * 3.x accepts 2.x clients for default-catalog operations with the same
  * wire protocol these tests exercise. */
class Hive3BackendSpec extends AnyFunSuite {

  private lazy val hms = LocalHiveMetastore.instance

  private def newBackend() = {
    val b = new graft.backend.hive.Hive3Backend
    b.initialize(Map(
      "hive.metastore.uris" -> s"thrift://localhost:${hms.port}",
      "root" -> hms.warehouseDir,
      "client.pool-size" -> "2"))
    b
  }

  test("catalog-qualified lifecycle over the live metastore") {
    val b = newBackend()
    try {
      // root lists the single default catalog
      assert(b.listNamespaces(ObjectIdentifier.root) ==
        Seq(ObjectIdentifier.of("hive")))
      assert(b.namespaceExists(ObjectIdentifier.of("hive")))
      assert(!b.namespaceExists(ObjectIdentifier.of("other_cat")))

      val ns = ObjectIdentifier.of("hive", "h3db")
      b.createNamespace(ns, Map("team" -> "graft"), CreateMode.Create)
      assert(b.namespaceExists(ns))
      assert(b.describeNamespace(ns)("team") == "graft")
      assert(b.listNamespaces(ObjectIdentifier.of("hive")).contains(ns))
      assert(b.listNamespaces(ns).isEmpty)

      val t = ns.child("t1")
      val info = b.declareTable(t, None, Map("k" -> "v"), None)
      assert(info.id == ObjectIdentifier.of("hive", "h3db", "t1"),
        "returned ids are catalog-qualified")
      assert(info.properties("table_type") == "lance")
      assert(b.tableExists(t))
      assert(b.listTables(ns) == Seq(t))
      assert(b.describeTable(t).id.levels.head == "hive")

      // paged listing keeps qualification
      val p = b.listTablesPaged(ns, None, Some(10))
      assert(p.items == Seq(t) && p.nextToken.isEmpty)

      b.dropTable(t, purge = false)
      intercept[GraftError.TableNotFound](b.describeTable(t))
      b.dropNamespace(ns, DropMode.Fail)
      assert(!b.namespaceExists(ns))
    } finally b.close()
  }

  test("non-default catalogs fail loudly; depth policy enforced") {
    val b = newBackend()
    try {
      intercept[GraftError.ServiceUnavailable](
        b.createNamespace(ObjectIdentifier.of("not_hive", "db"),
          Map.empty, CreateMode.Create))
      intercept[GraftError.ServiceUnavailable](
        b.listTables(ObjectIdentifier.of("not_hive", "db")))
      // 1-level create (a catalog) is invalid input, not an RPC
      intercept[GraftError.InvalidInput](
        b.createNamespace(ObjectIdentifier.of("hive"), Map.empty, CreateMode.Create))
      intercept[GraftError.InvalidInput](
        b.describeNamespace(ObjectIdentifier.of("a", "b", "c")))
      // depth-1 non-default catalog: not found, never an implicit create
      intercept[GraftError.NamespaceNotFound](
        b.describeNamespace(ObjectIdentifier.of("other_cat")))
    } finally b.close()
  }
}
