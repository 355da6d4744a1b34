package graft.hive

import graft.backend.CreateMode
import graft.core.ObjectIdentifier

/** Catalog-op microbench for the LIVE hive2 backend against the embedded
  * thrift metastore — real wire, real Derby-backed handler, so these are
  * honest lower bounds for a local HMS (a remote one adds its RTT).
  * Run: `sbt "Test/runMain graft.hive.HmsCatalogBench"`; results recorded
  * in BASELINE.md next to the in-memory CatalogBench numbers. */
object HmsCatalogBench {
  def main(args: Array[String]): Unit = {
    val hms = LocalHiveMetastore.instance
    val b = new graft.backend.hive.Hive2Backend
    b.initialize(Map(
      "hive.metastore.uris" -> s"thrift://localhost:${hms.port}",
      "root" -> hms.warehouseDir,
      "client.pool-size" -> "3"))
    val ns = ObjectIdentifier.of("hms_bench")
    b.createNamespace(ns, Map.empty, CreateMode.ExistOk)

    def p50(label: String, n: Int)(f: Int => Unit): Unit = {
      val times = (0 until n).map { i =>
        val t0 = System.nanoTime(); f(i); (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"HMSBENCH $label%-26s p50=${times(n / 2)}%8.3f ms  " +
        f"p99=${times((n * 99) / 100 min (n - 1))}%8.3f ms")
    }

    b.declareTable(ns.child("warm"), None, Map.empty, None) // warm client+pool
    val nTables = 1000
    p50("declareTable", nTables)(i =>
      b.declareTable(ns.child(s"t$i"), None, Map.empty, None))
    p50("describeTable", nTables)(i => b.describeTable(ns.child(s"t$i")))
    p50("tableExists", nTables)(i => b.tableExists(ns.child(s"t$i")))
    val t0 = System.nanoTime()
    val listed = b.listTables(ns)
    println(f"HMSBENCH listTables(${listed.size}) once ${(System.nanoTime() - t0) / 1e6}%8.3f ms")
    p50("listTables warm", 20)(_ => b.listTables(ns))

    // include_declared=false listing: the reference's serial
    // describe+probe per table (`LanceTableUtil.java:48-60`) vs the bulk
    // path (one batched getTableObjectsByName + parallel cached probes).
    def once(label: String)(f: => Int): Double = {
      val t = System.nanoTime(); val n = f
      val ms = (System.nanoTime() - t) / 1e6
      println(f"HMSBENCH $label%-34s ${ms}%10.3f ms  ($n tables)")
      ms
    }
    val serialMs = once("listTables declOnly SERIAL") {
      val hconf = new org.apache.hadoop.conf.Configuration()
      listed.count { id =>
        val info = b.describeTable(id)
        graft.core.TableUtil.hasStorageComponents(info.location, hconf)
      }
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.conf.set("spark.sql.catalog.ghms", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ghms.backend", "hive2")
    spark.conf.set("spark.sql.catalog.ghms.hive.metastore.uris",
      s"thrift://localhost:${hms.port}")
    spark.conf.set("spark.sql.catalog.ghms.root", hms.warehouseDir)
    // match the embedded server's 5 worker threads so describe chunks overlap
    spark.conf.set("spark.sql.catalog.ghms.client.pool-size", "5")
    val cat = spark.sessionState.catalogManager.catalog("ghms")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val bulkCold = once("listTables declOnly BULK cold")(
      cat.listTables(Array("hms_bench"), includeDeclared = false).length)
    once("listTables declOnly BULK warm")(
      cat.listTables(Array("hms_bench"), includeDeclared = false).length)
    println(f"HMSBENCH declOnly serial/bulk-cold speedup ${serialMs / bulkCold}%8.1fx")
    spark.stop()

    p50("dropTable", nTables)(i => b.dropTable(ns.child(s"t$i"), purge = false))
    b.dropTable(ns.child("warm"), purge = false)
    b.dropNamespace(ns, graft.backend.DropMode.Fail)
    b.close()
    hms.stop()
    sys.exit(0) // thrift executor threads are non-daemon
  }
}
