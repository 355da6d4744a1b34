package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.backend._
import graft.core.{GraftError, ObjectIdentifier}

class FileBackendSpec extends AnyFunSuite {

  test("file backend persists catalog across instances (atomic JSON)") {
    val file = java.nio.file.Files.createTempDirectory("graft-file-be")
      .resolve("catalog.json").toString
    val b1 = new FileBackend
    b1.initialize(Map("path" -> file, "root" -> "/tmp/fb-wh"))
    val ns = ObjectIdentifier.of("db")
    b1.createNamespace(ns, Map("k" -> "v"), CreateMode.Create)
    val t = ns.child("t")
    b1.declareTable(t, Some("/data/t"), Map("c" -> "1"),
      Some("""{"fields":[{"name":"id","nullable":true,"type":{"name":"int","bitWidth":64,"isSigned":true}}]}"""))

    // a brand-new instance reads the same file
    val b2 = new FileBackend
    b2.initialize(Map("path" -> file, "root" -> "/tmp/fb-wh"))
    assert(b2.describeNamespace(ns) == Map("k" -> "v"))
    val info = b2.describeTable(t)
    assert(info.location == "/data/t")
    assert(info.properties("table_type") == "lance" && info.properties("c") == "1")
    assert(info.schemaJson.exists(_.contains("bitWidth")))
    assert(b2.listTables(ns) == Seq(t))

    // mutations through b2 visible to a third instance
    b2.dropTable(t, purge = false)
    val b3 = new FileBackend
    b3.initialize(Map("path" -> file))
    intercept[GraftError.TableNotFound](b3.describeTable(t))
    assert(b3.namespaceExists(ns))
  }

  test("CAS writes: two stale writers interleaving never lose updates") {
    val file = java.nio.file.Files.createTempDirectory("graft-file-cas")
      .resolve("catalog.json").toString
    // b1 and b2 are both initialized against the SAME empty catalog —
    // each holds a (soon stale) snapshot of it
    val b1 = new FileBackend
    b1.initialize(Map("path" -> file, "root" -> "/tmp/fb-wh"))
    val b2 = new FileBackend
    b2.initialize(Map("path" -> file, "root" -> "/tmp/fb-wh"))

    // interleaved writes: without the CAS re-sync, b2's save would
    // publish its stale snapshot and silently drop ns1 (lost update)
    b1.createNamespace(ObjectIdentifier.of("ns1"), Map("o" -> "b1"), CreateMode.Create)
    b2.createNamespace(ObjectIdentifier.of("ns2"), Map("o" -> "b2"), CreateMode.Create)
    b1.declareTable(ObjectIdentifier.of("ns1").child("t1"), Some("/d/t1"), Map.empty, None)
    b2.declareTable(ObjectIdentifier.of("ns2").child("t2"), Some("/d/t2"), Map.empty, None)

    // a fresh reader must see EVERY committed mutation from both writers
    val fresh = new FileBackend
    fresh.initialize(Map("path" -> file))
    assert(fresh.namespaceExists(ObjectIdentifier.of("ns1")))
    assert(fresh.namespaceExists(ObjectIdentifier.of("ns2")))
    assert(fresh.tableExists(ObjectIdentifier.of("ns1").child("t1")))
    assert(fresh.tableExists(ObjectIdentifier.of("ns2").child("t2")))

    // and CAS semantics surface cross-writer conflicts instead of
    // clobbering: b1's snapshot predates ns2, but its next mutation
    // re-syncs, so a duplicate create FAILS rather than overwriting
    intercept[GraftError.NamespaceAlreadyExists](
      b1.createNamespace(ObjectIdentifier.of("ns2"), Map.empty, CreateMode.Create))

    // concurrent hammer: 4 writer instances × 8 namespaces each, all
    // interleaving through the same file — all 32 must survive
    val writers = (0 until 4).map { _ =>
      val b = new FileBackend
      b.initialize(Map("path" -> file, "root" -> "/tmp/fb-wh"))
      b
    }
    val threads = writers.zipWithIndex.map { case (b, w) =>
      new Thread(() => (0 until 8).foreach { i =>
        b.createNamespace(ObjectIdentifier.of(s"race_${w}_$i"),
          Map.empty, CreateMode.Create)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val end = new FileBackend
    end.initialize(Map("path" -> file))
    for (w <- 0 until 4; i <- 0 until 8)
      assert(end.namespaceExists(ObjectIdentifier.of(s"race_${w}_$i")),
        s"lost update: race_${w}_$i")
  }

  test("Graft.registerCatalog wires a live session to a new catalog") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft-live")
    graft.Graft.registerCatalog(spark, "live_cat", "file",
      Map("path" -> s"$dir/cat.json", "root" -> dir.toString))
    spark.sql("CREATE NAMESPACE live_cat.db")
    spark.sql("CREATE TABLE live_cat.db.t (id BIGINT)")
    spark.sql("INSERT INTO live_cat.db.t VALUES (7)")
    assert(spark.table("live_cat.db.t").head().getLong(0) == 7L)
    assert(java.nio.file.Files.exists(dir.resolve("cat.json")))
  }

  test("describeTable(load_detailed_metadata=true) is uniformly rejected") {
    // the reference rejects the flag in every implementation with the same
    // wording (Hive2Namespace.java:273-276, GlueNamespace.java:245-248, ...)
    val b = new MemoryBackend
    b.initialize(Map("root" -> "/tmp/mm-wh"))
    val ns = ObjectIdentifier.of("db")
    b.createNamespace(ns, Map.empty, CreateMode.Create)
    val t = ns.child("t")
    b.declareTable(t, Some("/data/t"), Map.empty, None)
    // flag unset → plain describe
    assert(b.describeTable(t, loadDetailedMetadata = false).location == "/data/t")
    val e = intercept[GraftError.InvalidInput](
      b.describeTable(t, loadDetailedMetadata = true))
    assert(e.detail.contains("load_detailed_metadata=true is not supported"))
  }

  test("registry resolves all backend shortnames") {
    for (name <- Seq("memory", "file", "iceberg", "unity", "polaris",
        "hive2", "hive3", "glue"))
      assert(MetadataBackend.create(name) != null, name)
    intercept[Exception](MetadataBackend.create("nope.missing.Class"))
    // FQCN path, as the reference's connect-by-classpath contract
    assert(MetadataBackend.create("graft.backend.MemoryBackend").isInstanceOf[MemoryBackend])
    intercept[GraftError.InvalidInput](MetadataBackend.create("java.lang.String"))
  }

  test("unconfigured service backends: depth validation, then loud code-17") {
    val h2 = new graft.backend.hive.Hive2Backend
    h2.initialize(Map("client.pool-size" -> "5"))
    assert(h2.backendId.contains("<unconfigured>"))
    // wrong depth fails with InvalidInput BEFORE any RPC attempt
    intercept[GraftError.InvalidInput](
      h2.describeNamespace(ObjectIdentifier.of("cat", "db")))
    // no metastore URI configured -> code-17 ServiceUnavailable, never an
    // implicit embedded Derby metastore booted in the working directory
    intercept[GraftError.ServiceUnavailable](
      h2.describeNamespace(ObjectIdentifier.of("db")))
    intercept[GraftError.InvalidInput](
      h2.initialize(Map("client.pool-size" -> "0")))

    val h3 = new graft.backend.hive.Hive3Backend
    h3.initialize(Map.empty)
    intercept[GraftError.InvalidInput](
      h3.describeNamespace(ObjectIdentifier.of("a", "b", "c")))
    // default catalog reaches the (unconfigured) metastore -> code 17
    intercept[GraftError.ServiceUnavailable](
      h3.describeNamespace(ObjectIdentifier.of("hive", "db")))
    // non-default catalogs need the Hive 3 client protocol -> code 17
    intercept[GraftError.ServiceUnavailable](
      h3.describeNamespace(ObjectIdentifier.of("spark_catalog", "db")))

    val glue = new graft.backend.glue.GlueRestBackend
    intercept[GraftError.InvalidInput] {
      glue.initialize(Map("client.pool-size" -> "0"))
    }
    // unconfigured glue (no region/endpoint) is loud, like hive2
    val glue2 = new graft.backend.glue.GlueRestBackend
    glue2.initialize(Map.empty)
    intercept[GraftError.InvalidInput](
      glue2.describeNamespace(ObjectIdentifier.of("a", "b")))
    intercept[GraftError.ServiceUnavailable](
      glue2.describeNamespace(ObjectIdentifier.of("db")))
  }
}
