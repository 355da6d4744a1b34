package graft.hive

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.{CreateMode, DropMode}
import graft.core.{GraftError, ObjectIdentifier}

/** The 13-operation suite against a REAL Hive 2.x metastore: real thrift
  * wire, real `HiveMetaStoreClient` pool, Derby-backed `HMSHandler` —
  * the reference's own no-Docker integration pattern
  * (`hive2/TestHive2Namespace.java` + `LocalHive2Metastore.java:42-260`),
  * driven through the backend surface the Spark catalog uses.
  */
class Hive2BackendSpec extends AnyFunSuite {

  private lazy val hms = LocalHiveMetastore.instance

  private def newBackend(extra: Map[String, String] = Map.empty) = {
    val b = new graft.backend.hive.Hive2Backend
    b.initialize(Map(
      "hive.metastore.uris" -> s"thrift://localhost:${hms.port}",
      "root" -> hms.warehouseDir,
      "client.pool-size" -> "2") ++ extra)
    b
  }

  test("namespace lifecycle: create modes, exists, describe, list, drop") {
    val b = newBackend()
    try {
      val ns = ObjectIdentifier.of("ns_life")
      assert(!b.namespaceExists(ns))
      val props = b.createNamespace(ns,
        Map("team" -> "graft", "database.description" -> "test db"), CreateMode.Create)
      assert(props("team") == "graft")
      assert(props("database.description") == "test db")
      assert(props.contains("database.location-uri"))
      assert(b.namespaceExists(ns))

      // create mode fails on existing; exist_ok no-ops; overwrite replaces
      intercept[GraftError.NamespaceAlreadyExists](
        b.createNamespace(ns, Map.empty, CreateMode.Create))
      b.createNamespace(ns, Map("ignored" -> "x"), CreateMode.ExistOk)
      assert(b.describeNamespace(ns)("team") == "graft")
      b.createNamespace(ns, Map("gen" -> "2"), CreateMode.Overwrite)
      val after = b.describeNamespace(ns)
      assert(after("gen") == "2" && !after.contains("team"))

      assert(b.listNamespaces(ObjectIdentifier.root).contains(ns))
      assert(b.listNamespaces(ns).isEmpty) // databases have no children

      // drop: fail vs skip on missing; returns final property snapshot
      val dropped = b.dropNamespace(ns, DropMode.Fail)
      assert(dropped("gen") == "2")
      intercept[GraftError.NamespaceNotFound](b.dropNamespace(ns, DropMode.Fail))
      assert(b.dropNamespace(ns, DropMode.Skip) == Map.empty)

      // depth policy: validated before any RPC
      intercept[GraftError.InvalidInput](
        b.describeNamespace(ObjectIdentifier.of("a", "b")))
      intercept[GraftError.NamespaceNotFound](
        b.describeNamespace(ObjectIdentifier.of("never_created")))
    } finally b.close()
  }

  test("identifiers are lowercased, hive-style") {
    val b = newBackend()
    try {
      val ns = ObjectIdentifier.of("MixedCase")
      b.createNamespace(ns, Map.empty, CreateMode.Create)
      assert(b.namespaceExists(ObjectIdentifier.of("mixedcase")))
      val t = b.declareTable(ObjectIdentifier.of("MixedCase", "TblA"),
        None, Map.empty, None)
      assert(t.id == ObjectIdentifier.of("mixedcase", "tbla"))
      assert(t.location.endsWith("tbla.lance"))
      assert(b.tableExists(ObjectIdentifier.of("mixedcase", "tbla")))
      b.dropTable(ObjectIdentifier.of("MIXEDCASE", "TBLA"), purge = false)
      b.dropNamespace(ObjectIdentifier.of("mixedcase"), DropMode.Fail)
    } finally b.close()
  }

  test("table lifecycle: declare, describe, list (lance filter), drop") {
    val b = newBackend()
    try {
      val ns = ObjectIdentifier.of("ns_tbl")
      b.createNamespace(ns, Map.empty, CreateMode.Create)

      val schemaJson =
        """{"fields":[{"name":"id","nullable":false,"type":{"name":"int","bitWidth":64,"isSigned":true}}]}"""
      val info = b.declareTable(ns.child("t1"), None,
        Map("k" -> "v", "storage.region" -> "local"), Some(schemaJson))
      // default location = database locationUri / table.lance
      assert(info.location.contains("ns_tbl") && info.location.endsWith("t1.lance"))
      assert(info.properties("table_type") == "lance")
      assert(info.properties("managed_by") == "storage")
      assert(info.properties("k") == "v")
      assert(info.storageOptions == Map("region" -> "local"))
      assert(info.schemaJson.contains(schemaJson))
      assert(info.isOnlyDeclared, "no storage written yet")

      // explicit location wins
      val info2 = b.declareTable(ns.child("t2"), Some("/data/elsewhere/t2"),
        Map.empty, None)
      // HMS canonicalizes bare paths to qualified URIs (file:/...)
      assert(info2.location.endsWith("/data/elsewhere/t2"))

      intercept[GraftError.TableAlreadyExists](
        b.declareTable(ns.child("t1"), None, Map.empty, None))
      intercept[GraftError.NamespaceNotFound](
        b.declareTable(ObjectIdentifier.of("no_ns", "t"), None, Map.empty, None))

      val described = b.describeTable(ns.child("t1"))
      assert(described.schemaJson.contains(schemaJson))
      assert(!described.properties.contains("EXTERNAL")) // impl detail stripped
      assert(b.tableExists(ns.child("t1")) && !b.tableExists(ns.child("nope")))

      // catalog-native columns, declared schema → HMS loadTable identity:
      // a NON-graft HMS reader sees the real mapped column list, not the
      // reference's placeholder (hive2.py:490-498) — which is still what
      // a schema-less declare registers
      import scala.jdk.CollectionConverters._
      def rawCols(t: String): Seq[(String, String)] =
        hms.rawHandler.get_table("ns_tbl", t).getSd.getCols.asScala.toSeq
          .map(f => (f.getName, f.getType))
      assert(rawCols("t1") == Seq(("id", "bigint")))
      assert(rawCols("t2") == Seq(("__placeholder_id", "bigint")))

      assert(b.listTables(ns).map(_.name) == Seq("t1", "t2"))

      // a non-lance HMS table in the same database is filtered out, and a
      // lance table whose marker was written UPPERCASE by a foreign client
      // is NOT: listTables must agree with the case-insensitive point
      // lookups (describeTable/tableExists) even though the server-side
      // param filter is exact-match — the residual batch-check covers it
      hms.hiveConf // (tables created through a raw pooled client)
      val raw = new HiveClientPoolForTest(hms)
      try {
        raw.createPlainTable("ns_tbl", "not_lance")
        raw.createPlainTable("ns_tbl", "shouty_lance",
          Map("table_type" -> "LANCE"))
      } finally raw.close()
      assert(b.listTables(ns).map(_.name) == Seq("shouty_lance", "t1", "t2"),
        "listTables must filter to table_type=lance, case-insensitively")
      assert(b.tableExists(ns.child("shouty_lance")),
        "point lookup and listing must agree")
      b.dropTable(ns.child("shouty_lance"), purge = false)

      val droppedInfo = b.dropTable(ns.child("t2"), purge = true)
      assert(droppedInfo.location.endsWith("/data/elsewhere/t2"))
      intercept[GraftError.TableNotFound](b.describeTable(ns.child("t2")))
      intercept[GraftError.TableNotFound](b.dropTable(ns.child("t2"), purge = false))

      b.dropTable(ns.child("t1"), purge = false)
      // non-lance table still blocks the restrict drop, AND blocks an
      // Overwrite re-create — as InvalidInput (caller error), not the
      // code-17 ServiceUnavailable the raw cascade=false drop would raise
      intercept[GraftError.InvalidInput](b.dropNamespace(ns, DropMode.Fail))
      intercept[GraftError.InvalidInput](
        b.createNamespace(ns, Map.empty, CreateMode.Overwrite))
    } finally b.close()
  }

  test("describeTables: one batched RPC, skips vanished and non-lance names") {
    val b = newBackend()
    try {
      val ns = ObjectIdentifier.of("ns_bulk")
      b.createNamespace(ns, Map.empty, CreateMode.Create)
      (1 to 4).foreach(i => b.declareTable(ns.child(s"bt$i"), None,
        Map("k" -> s"v$i"), None))
      val raw = new HiveClientPoolForTest(hms)
      try raw.createPlainTable("ns_bulk", "plain") finally raw.close()

      val asked = Seq(ns.child("bt2"), ns.child("bt1"), ns.child("gone"),
        ns.child("plain"), ns.child("bt4"))
      val got = b.describeTables(asked)
      // input order preserved; missing + non-lance silently skipped
      assert(got.map(_.id.name) == Seq("bt2", "bt1", "bt4"))
      assert(got.map(_.properties("k")) == Seq("v2", "v1", "v4"))
      // bulk describes defer the storage probe (trait contract): the
      // metadata must match the serial describe minus isOnlyDeclared
      val serial = b.describeTable(ns.child("bt2"))
      val bulk = got.head
      assert(bulk.location == serial.location &&
        bulk.properties == serial.properties &&
        bulk.storageOptions == serial.storageOptions)
      (1 to 4).foreach(i => b.dropTable(ns.child(s"bt$i"), purge = false))
    } finally b.close()
  }

  test("updateNamespaceProperties uses native alterDatabase (in-place)") {
    val b = newBackend()
    try {
      val ns = ObjectIdentifier.of("ns_alter")
      b.createNamespace(ns,
        Map("a" -> "1", "b" -> "2", "database.description" -> "desc"),
        CreateMode.Create)
      b.declareTable(ns.child("keepme"), None, Map.empty, None) // non-empty!
      val updated = b.updateNamespaceProperties(ns,
        updates = Map("c" -> "3", "a" -> "9"), removals = Set("b"))
      assert(updated("a") == "9" && updated("c") == "3" && !updated.contains("b"))
      // the namespace was altered, not dropped-and-recreated: table survives
      assert(b.listTables(ns).map(_.name) == Seq("keepme"))
      // HMS 2.x alter_database cannot change description/location — the
      // server would silently drop the change, so the backend refuses
      intercept[GraftError.InvalidInput](b.updateNamespaceProperties(ns,
        updates = Map.empty, removals = Set("database.description")))
      intercept[GraftError.InvalidInput](b.updateNamespaceProperties(ns,
        updates = Map("database.location-uri" -> "/elsewhere"), removals = Set.empty))
      // ...but REPLAYING the current values (describe → merge → write,
      // Spark's ALTER NAMESPACE pattern) is a no-op and must pass
      val replayed = b.updateNamespaceProperties(ns,
        updates = b.describeNamespace(ns) + ("k2" -> "v2"), removals = Set.empty)
      assert(replayed("k2") == "v2" && replayed("database.description") == "desc")
      b.dropTable(ns.child("keepme"), purge = false)
      b.dropNamespace(ns, DropMode.Fail)
    } finally b.close()
  }

  test("client pool: failed connects release their slot; close unblocks") {
    var fails = 2
    val pool = new graft.backend.hive.ClientPool[String](1) {
      override protected def newClient(): String = {
        if (fails > 0) { fails -= 1; throw new RuntimeException("connect refused") }
        "client"
      }
      override protected def reconnect(c: String): String = c
      override protected def closeClient(c: String): Unit = ()
      override protected def isConnectionException(e: Exception): Boolean = false
    }
    // a failed connect must give its slot back — with poolSize=1, a
    // leaked slot would make the SECOND call hang forever in wait()
    intercept[RuntimeException](pool.run(identity))
    intercept[RuntimeException](pool.run(identity))
    assert(pool.run(_ + "!") == "client!")
    pool.close()
    intercept[IllegalStateException](pool.run(identity))
  }

  test("client pool: bounded size survives concurrent catalog traffic") {
    val b = newBackend(Map("client.pool-size" -> "2"))
    try {
      val ns = ObjectIdentifier.of("ns_conc")
      b.createNamespace(ns, Map.empty, CreateMode.Create)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val creates = (1 to 16).map { i =>
        Future(b.declareTable(ns.child(s"t$i"), None, Map.empty, None))
      }
      Await.result(Future.sequence(creates), 120.seconds)
      assert(b.listTables(ns).size == 16)
      val dupes = (1 to 16).map { i =>
        Future(try { b.declareTable(ns.child(s"t$i"), None, Map.empty, None); 1 }
          catch { case _: GraftError.TableAlreadyExists => 0 })
      }
      assert(Await.result(Future.sequence(dupes), 120.seconds).sum == 0)
      pool.shutdown()
      (1 to 16).foreach(i => b.dropTable(ns.child(s"t$i"), purge = false))
      b.dropNamespace(ns, DropMode.Fail)
    } finally b.close()
  }
}

/** Raw HMS access for planting non-lance tables (test fixture only). */
class HiveClientPoolForTest(hms: LocalHiveMetastore) extends AutoCloseable {
  private val pool = new graft.backend.hive.HiveClientPool(1, hms.hiveConf)
  def createPlainTable(db: String, name: String,
      params: Map[String, String] = Map.empty): Unit = pool.run { c =>
    val t = new org.apache.hadoop.hive.metastore.api.Table()
    t.setDbName(db); t.setTableName(name)
    t.setTableType("EXTERNAL_TABLE")
    t.setPartitionKeys(new java.util.ArrayList())
    val sd = new org.apache.hadoop.hive.metastore.api.StorageDescriptor()
    sd.setLocation(s"${hms.warehouseDir}/$db/$name")
    sd.setCols(new java.util.ArrayList())
    sd.setSerdeInfo(new org.apache.hadoop.hive.metastore.api.SerDeInfo())
    t.setSd(sd)
    val p = new java.util.HashMap[String, String]()
    params.foreach { case (k, v) => p.put(k, v) }
    t.setParameters(p)
    c.createTable(t)
  }
  override def close(): Unit = pool.close()
}
