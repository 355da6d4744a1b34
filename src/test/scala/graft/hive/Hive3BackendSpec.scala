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

  private lazy val h3 = LocalHive3Metastore.instance

  private def newFrontBackend() = {
    val b = new graft.backend.hive.Hive3Backend
    b.initialize(Map(
      "hive.metastore.uris" -> s"thrift://localhost:${h3.port}",
      "root" -> hms.warehouseDir,
      "client.pool-size" -> "2"))
    b
  }

  test("second catalog end-to-end over the catalog-aware front") {
    val b = newFrontBackend()
    try {
      val cat = ObjectIdentifier.of("spark_cat")
      b.createNamespace(cat, Map("description" -> "second catalog"),
        CreateMode.Create)
      assert(b.listNamespaces(ObjectIdentifier.root)
        .map(_.levels.head).contains("spark_cat"))
      assert(b.namespaceExists(cat))
      val props = b.describeNamespace(cat)
      assert(props("description") == "second catalog")
      assert(props.contains("catalog.location.uri"))
      b.createNamespace(cat, Map.empty, CreateMode.ExistOk) // no-op
      intercept[GraftError.NamespaceAlreadyExists](
        b.createNamespace(cat, Map.empty, CreateMode.Create))

      // database inside the second catalog — real Derby-backed database
      // addressed through the @cat#db compat encoding
      val ns = ObjectIdentifier.of("spark_cat", "lakedb")
      b.createNamespace(ns, Map("team" -> "graft"), CreateMode.Create)
      assert(b.namespaceExists(ns))
      assert(b.describeNamespace(ns)("team") == "graft")
      assert(b.listNamespaces(cat) == Seq(ns))
      // catalog isolation both ways: the default catalog's listing never
      // shows the second catalog's database, and vice versa
      assert(!b.listNamespaces(ObjectIdentifier.of("hive"))
        .exists(_.levels.last == "lakedb"))
      assert(!b.namespaceExists(ObjectIdentifier.of("hive", "lakedb")))

      // table lifecycle in the second catalog
      val t = ns.child("t1")
      val info = b.declareTable(t, None, Map("k" -> "v"), None)
      assert(info.id == ObjectIdentifier.of("spark_cat", "lakedb", "t1"),
        "returned ids are catalog-qualified")
      assert(b.tableExists(t))
      assert(!b.tableExists(ObjectIdentifier.of("hive", "lakedb", "t1")))
      assert(b.listTables(ns) == Seq(t))
      assert(b.describeTable(t).properties("k") == "v")
      assert(b.describeTables(Seq(t)).map(_.id) ==
        Seq(ObjectIdentifier.of("spark_cat", "lakedb", "t1")))

      // restrict drops: a catalog holding databases refuses to go
      intercept[GraftError.InvalidInput](b.dropNamespace(cat, DropMode.Fail))
      b.dropTable(t, purge = false)
      b.dropNamespace(ns, DropMode.Fail)
      val dropped = b.dropNamespace(cat, DropMode.Fail)
      assert(dropped("description") == "second catalog")
      assert(!b.namespaceExists(cat))
      b.dropNamespace(ObjectIdentifier.of("spark_cat"), DropMode.Skip) // no-op
      intercept[GraftError.NamespaceNotFound](
        b.dropNamespace(ObjectIdentifier.of("spark_cat"), DropMode.Fail))
    } finally b.close()
  }

  test("property updates and paged listings inside a second catalog") {
    val b = newFrontBackend()
    try {
      val cat = ObjectIdentifier.of("page_cat")
      b.createNamespace(cat, Map.empty, CreateMode.Create)
      val ns = ObjectIdentifier.of("page_cat", "pdb")
      b.createNamespace(ns, Map("k" -> "v1"), CreateMode.Create)
      // native alterDatabase through the @cat#db encoding
      val updated = b.updateNamespaceProperties(ns,
        updates = Map("k" -> "v2", "extra" -> "1"), removals = Set.empty)
      assert(updated("k") == "v2" && updated("extra") == "1")
      assert(b.describeNamespace(ns)("k") == "v2")

      (1 to 5).foreach(i => b.declareTable(ns.child(s"pt$i"), None, Map.empty, None))
      val p1 = b.listTablesPaged(ns, None, Some(2))
      assert(p1.items.map(_.levels) == Seq(
        Seq("page_cat", "pdb", "pt1"), Seq("page_cat", "pdb", "pt2")),
        "paged items stay catalog-qualified")
      val p2 = b.listTablesPaged(ns, p1.nextToken, Some(2))
      assert(p2.items.map(_.name) == Seq("pt3", "pt4"))
      val p3 = b.listTablesPaged(ns, p2.nextToken, Some(2))
      assert(p3.items.map(_.name) == Seq("pt5") && p3.nextToken.isEmpty)

      (1 to 5).foreach(i => b.dropTable(ns.child(s"pt$i"), purge = false))
      b.dropNamespace(ns, DropMode.Fail)
      b.dropNamespace(cat, DropMode.Fail)
    } finally b.close()
  }

  test("catalog name hygiene and missing-catalog errors on the front") {
    val b = newFrontBackend()
    try {
      intercept[GraftError.InvalidInput](
        b.createNamespace(ObjectIdentifier.of("sp@rk", "db"),
          Map.empty, CreateMode.Create))
      intercept[GraftError.NamespaceNotFound](
        b.createNamespace(ObjectIdentifier.of("ghost_cat", "db"),
          Map.empty, CreateMode.Create))
      intercept[GraftError.NamespaceNotFound](
        b.listTables(ObjectIdentifier.of("ghost_cat", "db")))
      assert(!b.namespaceExists(ObjectIdentifier.of("ghost_cat", "db")))
      assert(!b.tableExists(ObjectIdentifier.of("ghost_cat", "db", "t")))
      intercept[GraftError.NamespaceNotFound](
        b.describeNamespace(ObjectIdentifier.of("ghost_cat")))
      // default catalog is addressable and described via get_catalog
      assert(b.describeNamespace(ObjectIdentifier.of("hive"))
        .contains("catalog.location.uri"))
    } finally b.close()
  }

  test("self-dropped catalog is evicted from the existence cache") {
    val b = newFrontBackend()
    try {
      val cat = ObjectIdentifier.of("evict_cat")
      b.createNamespace(cat, Map.empty, CreateMode.Create)
      val ns = ObjectIdentifier.of("evict_cat", "d1")
      // a db-level op inside the catalog warms the positive cache
      b.createNamespace(ns, Map.empty, CreateMode.Create)
      assert(b.listTables(ns).isEmpty)
      b.dropNamespace(ns, DropMode.Fail)
      b.dropNamespace(cat, DropMode.Fail)
      // the self-drop evicted the cache entry: ops inside the dropped
      // catalog must surface the CATALOG as missing, not the raw
      // db-level error for the encoded '@evict_cat#…' name
      val e = intercept[GraftError.NamespaceNotFound](
        b.listTables(ObjectIdentifier.of("evict_cat", "d2")))
      assert(e.id == cat, s"expected catalog-level not-found, got ${e.id}")
      assert(!b.namespaceExists(cat))
    } finally b.close()
  }

  test("idempotent catalog reads survive a reaped connection; mutations fail fast") {
    // flaky front: the FIRST accepted connection is closed immediately
    // (a firewall/LB reaping an idle socket); later connections proxy to
    // the real catalog-aware front
    def newFlaky(): java.net.ServerSocket = {
      val flaky = new java.net.ServerSocket(0)
      @volatile var first = true
      val acceptor = new Thread(() => {
        while (!flaky.isClosed) {
          try {
            val s = flaky.accept()
            if (first) { first = false; s.close() }
            else {
              val up = new java.net.Socket("localhost", h3.port)
              def pipe(a: java.io.InputStream, b: java.io.OutputStream): Unit = {
                val t = new Thread(() => {
                  try {
                    val buf = new Array[Byte](8192)
                    var n = a.read(buf)
                    while (n >= 0) { b.write(buf, 0, n); b.flush(); n = a.read(buf) }
                  } catch { case _: Exception => }
                  finally {
                    try s.close() catch { case _: Exception => }
                    try up.close() catch { case _: Exception => }
                  }
                })
                t.setDaemon(true); t.start()
              }
              pipe(s.getInputStream, up.getOutputStream)
              pipe(up.getInputStream, s.getOutputStream)
            }
          } catch { case _: Exception => }
        }
      })
      acceptor.setDaemon(true); acceptor.start()
      flaky
    }

    val flaky1 = newFlaky()
    val reads = new graft.backend.hive.Hive3CatalogClient(
      "localhost", flaky1.getLocalPort, 5000)
    try assert(reads.getCatalogs().contains("hive"),
      "read must transparently reconnect after the reaped first connection")
    finally { reads.close(); flaky1.close() }

    val flaky2 = newFlaky()
    val writes = new graft.backend.hive.Hive3CatalogClient(
      "localhost", flaky2.getLocalPort, 5000)
    try intercept[GraftError.ServiceUnavailable](
      writes.createCatalog(graft.backend.hive.HmsCatalog(
        "never_created", None, "/tmp/x")))
    finally { writes.close(); flaky2.close() }
    // the mutation was NOT replayed behind the failure
    val check = newFlaky()
    val verify = new graft.backend.hive.Hive3CatalogClient(
      "localhost", check.getLocalPort, 5000)
    try assert(verify.getCatalog("never_created").isEmpty)
    finally { verify.close(); check.close() }
  }

  test("non-default catalogs fail loudly; depth policy enforced") {
    val b = newBackend()
    try {
      intercept[GraftError.ServiceUnavailable](
        b.createNamespace(ObjectIdentifier.of("not_hive", "db"),
          Map.empty, CreateMode.Create))
      intercept[GraftError.ServiceUnavailable](
        b.listTables(ObjectIdentifier.of("not_hive", "db")))
      // 1-level create (a catalog) needs the catalog wire — loud code-17
      // on this pre-3.0 server, never a silent no-op
      intercept[GraftError.ServiceUnavailable](
        b.createNamespace(ObjectIdentifier.of("newcat"), Map.empty, CreateMode.Create))
      intercept[GraftError.InvalidInput](
        b.describeNamespace(ObjectIdentifier.of("a", "b", "c")))
      // depth-1 non-default catalog: the pre-3.0 server cannot answer
      // whether it exists — loud, not a guessy not-found
      intercept[GraftError.ServiceUnavailable](
        b.describeNamespace(ObjectIdentifier.of("other_cat")))
    } finally b.close()
  }
}
