package graft

import org.apache.spark.sql.{AnalysisException, Row}

/** End-to-end DSv2 catalog behavior over the memory backend — the Spark
  * equivalents of the reference's 13-operation suites (SURVEY.md §5). */
class CatalogSpec extends SparkSpec {

  test("create / list / describe / drop namespace") {
    spark.sql("CREATE NAMESPACE graft.ns1 WITH DBPROPERTIES ('team'='graft')")
    spark.sql("CREATE NAMESPACE graft.ns2")
    val names = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
    assert(names.toSet == Set("ns1", "ns2"))

    val props = spark.sql("DESCRIBE NAMESPACE EXTENDED graft.ns1").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("Properties").contains("team"))

    intercept[AnalysisException](spark.sql("CREATE NAMESPACE graft.ns1"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ns1") // exist_ok mode

    spark.sql("DROP NAMESPACE graft.ns2")
    val after = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
    assert(after.toSet == Set("ns1"))
  }

  test("declared table: created with schema, scans empty, then materializes on write") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.people (id BIGINT, name STRING, score DOUBLE)")

    // declared-only: catalog entry exists, no storage yet → empty scan
    assert(spark.table("graft.db.people").count() == 0)

    spark.sql("INSERT INTO graft.db.people VALUES (1,'ada',9.5),(2,'lin',8.0)")
    val rows = spark.table("graft.db.people").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getString(1)).toSeq == Seq("ada", "lin"))
  }

  test("insert-overwrite truncates and rewrites") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.ow (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.ow VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT OVERWRITE graft.db.ow VALUES (3,'c')")
    val rows = spark.table("graft.db.ow").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 3L)
  }

  test("listTables shows only lance tables; drop vs purge") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db2")
    spark.sql("CREATE TABLE graft.db2.t1 (id BIGINT)")
    spark.sql("CREATE TABLE graft.db2.t2 (id BIGINT)")
    spark.sql("INSERT INTO graft.db2.t2 VALUES (42)")
    val tables = spark.sql("SHOW TABLES IN graft.db2").collect().map(_.getString(1))
    assert(tables.toSet == Set("t1", "t2"))

    // deregister keeps data; purge deletes it
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val loc = spark.sql("DESCRIBE TABLE EXTENDED graft.db2.t2").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))
    spark.sql("DROP TABLE graft.db2.t1")
    spark.sql("DROP TABLE graft.db2.t2 PURGE")
    assert(spark.sql("SHOW TABLES IN graft.db2").collect().isEmpty)
    assert(loc.nonEmpty)
    val p = new org.apache.hadoop.fs.Path(loc.get)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(p), "PURGE must remove storage")
    assert(cat != null)
  }

  test("restrict-only namespace drop refuses non-empty") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.full")
    spark.sql("CREATE TABLE graft.full.t (id BIGINT)")
    val e = intercept[Exception](spark.sql("DROP NAMESPACE graft.full"))
    assert(e.getMessage.toLowerCase.contains("not empty")
      || e.getMessage.toLowerCase.contains("cascade"))
    spark.sql("DROP TABLE graft.full.t")
    spark.sql("DROP NAMESPACE graft.full")
  }

  test("query external parquet registered as catalog table, with pushdown") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tpch")
    spark.sql(s"CREATE TABLE graft.tpch.lineitem LOCATION '$sfDir/lineitem.parquet'")
    val df = spark.table("graft.tpch.lineitem")
      .filter("l_quantity < 5").select("l_orderkey", "l_quantity")
    assert(df.count() > 0)
    // pushdown must reach the parquet scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5"),
      s"expected pushed filter in plan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_comment"),
      "column pruning must drop unreferenced columns")
  }

  test("nested namespaces (iceberg-style arbitrary depth)") {
    spark.sql("CREATE NAMESPACE graft.a")
    spark.sql("CREATE NAMESPACE graft.a.b")
    val children = spark.sql("SHOW NAMESPACES IN graft.a").collect().map(_.getString(0))
    assert(children.toSet == Set("a.b"))
    spark.sql("DROP NAMESPACE graft.a.b")
    spark.sql("DROP NAMESPACE graft.a")
  }

  test("include_declared filtering and paginated listings") {
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pg")
    (1 to 5).foreach(i => spark.sql(s"CREATE TABLE graft.pg.t$i (id BIGINT)"))
    spark.sql("INSERT INTO graft.pg.t2 VALUES (1)")
    spark.sql("INSERT INTO graft.pg.t4 VALUES (2)")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val ns = Array("pg")
    assert(cat.listTables(ns, includeDeclared = true).length == 5)
    // only materialized tables when include_declared=false
    assert(cat.listTables(ns, includeDeclared = false).map(_.name()).sorted.toSeq
      == Seq("t2", "t4"))
    // offset-token pagination
    val p1 = cat.listTablesPaged(ns, None, Some(2))
    assert(p1.items.map(_.name()) == Seq("t1", "t2") && p1.nextToken.contains("2"))
    val p2 = cat.listTablesPaged(ns, p1.nextToken, Some(2))
    assert(p2.items.map(_.name()) == Seq("t3", "t4"))
    val p3 = cat.listTablesPaged(ns, p2.nextToken, Some(2))
    assert(p3.items.map(_.name()) == Seq("t5") && p3.nextToken.isEmpty)
    assert(cat != null && Identifier.of(ns, "t1") != null)
  }

  test("nested schema survives the catalog's JSON Arrow codec round trip") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.schemas")
    spark.sql(
      """CREATE TABLE graft.schemas.nested (
        |  id BIGINT NOT NULL,
        |  embedding ARRAY<FLOAT>,
        |  meta MAP<STRING, STRING>,
        |  doc STRUCT<title: STRING, tags: ARRAY<STRING>, score: DECIMAL(10,2)>,
        |  blob BINARY,
        |  ts TIMESTAMP
        |)""".stripMargin)
    val schema = spark.table("graft.schemas.nested").schema
    assert(!schema("id").nullable)
    assert(schema("embedding").dataType.sql == "ARRAY<FLOAT>")
    assert(schema("meta").dataType.sql == "MAP<STRING, STRING>")
    assert(schema("doc").dataType.sql ==
      "STRUCT<title: STRING, tags: ARRAY<STRING>, score: DECIMAL(10,2)>")
    assert(schema("blob").dataType.sql == "BINARY")
    // write + read through the declared schema
    spark.sql(
      """INSERT INTO graft.schemas.nested VALUES
        |(1, array(CAST(0.5 AS FLOAT)), map('k','v'),
        | named_struct('title','t','tags',array('a','b'),'score',CAST(9.50 AS DECIMAL(10,2))),
        | CAST('bytes' AS BINARY), TIMESTAMP '2024-01-01 00:00:00')""".stripMargin)
    val row = spark.table("graft.schemas.nested").head()
    assert(row.getAs[Row]("doc").getAs[scala.collection.Seq[String]]("tags")
      .toSeq == Seq("a", "b"))
    spark.sql("DROP TABLE graft.schemas.nested PURGE")
    spark.sql("DROP NAMESPACE graft.schemas")
  }

  test("ALTER NAMESPACE SET/UNSET properties updates in place") {
    spark.sql("CREATE NAMESPACE graft.alter_ns WITH DBPROPERTIES ('a'='1','b'='2')")
    spark.sql("CREATE TABLE graft.alter_ns.t (id BIGINT)") // non-empty
    spark.sql("ALTER NAMESPACE graft.alter_ns SET DBPROPERTIES ('c'='3','a'='9')")
    spark.sql("ALTER NAMESPACE graft.alter_ns UNSET DBPROPERTIES ('b')")
    val props = spark.sql("DESCRIBE NAMESPACE EXTENDED graft.alter_ns").collect()
      .find(_.getString(0) == "Properties").map(_.getString(1)).getOrElse("")
    assert(props.contains("a,9") || props.contains("(a,9)"), props)
    assert(props.contains("c,3") || props.contains("(c,3)"), props)
    assert(!props.contains("b,2"))
    assert(spark.sql("SHOW TABLES IN graft.alter_ns").count() == 1) // untouched
    spark.sql("DROP TABLE graft.alter_ns.t")
    spark.sql("DROP NAMESPACE graft.alter_ns")
  }

  test("error paths map to Spark analysis exceptions") {
    intercept[AnalysisException](spark.table("graft.no_such_ns.t").collect())
    intercept[AnalysisException](
      spark.sql("CREATE TABLE graft.no_such_ns.t (id BIGINT)"))
    intercept[AnalysisException](spark.sql("DESCRIBE NAMESPACE graft.no_such_ns"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.errs")
    spark.sql("CREATE TABLE IF NOT EXISTS graft.errs.t (id BIGINT)")
    intercept[AnalysisException](spark.sql("CREATE TABLE graft.errs.t (id BIGINT)"))
    // unsupported surface: rename + alter throw, not corrupt
    intercept[Exception](spark.sql("ALTER TABLE graft.errs.t ADD COLUMN x INT"))
    assert(!spark.sql("DROP TABLE graft.errs.t").isStreaming) // drops cleanly
    spark.sql("DROP NAMESPACE graft.errs")
  }

  test("concurrent DDL against the memory backend stays consistent") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.conc")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val creates = (1 to 24).map { i =>
      Future(spark.sql(s"CREATE TABLE graft.conc.t$i (id BIGINT)"))
    }
    Await.result(Future.sequence(creates), 120.seconds)
    // duplicate creates all fail, none corrupt
    val dupes = (1 to 24).map { i =>
      Future(try { spark.sql(s"CREATE TABLE graft.conc.t$i (id BIGINT)"); 1 }
        catch { case _: Exception => 0 })
    }
    val succeeded = Await.result(Future.sequence(dupes), 120.seconds).sum
    pool.shutdown()
    assert(succeeded == 0)
    assert(spark.sql("SHOW TABLES IN graft.conc").count() == 24)
  }

  test("bulk include_declared=false probe: ttl=0 sees writes immediately; ttl caches") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft-probe").toString
    def freshCat(ttlMs: String) = {
      val c = new graft.catalog.GraftCatalog
      c.initialize("gprobe", new CaseInsensitiveStringMap(
        Map("backend" -> "memory", "root" -> root,
          "probe.cache.ttl-ms" -> ttlMs).asJava))
      c.createNamespace(Array("ns"), Map.empty[String, String].asJava)
      (1 to 3).foreach { i =>
        c.createTable(Identifier.of(Array("ns"), s"t$i"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType))),
          Array.empty, Map.empty[String, String].asJava)
      }
      c
    }
    def materialize(i: Int): Unit = {
      val dir = new java.io.File(s"$root/ns/t$i.lance"); dir.mkdirs()
      java.nio.file.Files.write(dir.toPath.resolve("part-0.parquet"),
        Array[Byte](1, 2, 3))
    }
    // ttl=0: every probe hits the filesystem, so writes show up immediately
    val c0 = freshCat("0")
    assert(c0.listTables(Array("ns"), includeDeclared = false).isEmpty)
    materialize(1)
    assert(c0.listTables(Array("ns"), includeDeclared = false)
      .map(_.name()).toSeq == Seq("t1"))
    materialize(3)
    assert(c0.listTables(Array("ns"), includeDeclared = false)
      .map(_.name()).sorted.toSeq == Seq("t1", "t3"))
    // long ttl: the first listing's negative probe is served from cache,
    // so a write inside the ttl window is (by design) not yet visible
    val root2 = java.nio.file.Files.createTempDirectory("graft-probe2").toString
    val c1 = new graft.catalog.GraftCatalog
    c1.initialize("gprobe2", new CaseInsensitiveStringMap(
      Map("backend" -> "memory", "root" -> root2,
        "probe.cache.ttl-ms" -> "600000").asJava))
    c1.createNamespace(Array("ns"), Map.empty[String, String].asJava)
    c1.createTable(Identifier.of(Array("ns"), "tc"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))),
      Array.empty, Map.empty[String, String].asJava)
    assert(c1.listTables(Array("ns"), includeDeclared = false).isEmpty)
    val dir = new java.io.File(s"$root2/ns/tc.lance"); dir.mkdirs()
    java.nio.file.Files.write(dir.toPath.resolve("part-0.parquet"),
      Array[Byte](1))
    assert(c1.listTables(Array("ns"), includeDeclared = false).isEmpty,
      "within ttl the cached negative probe is served")
  }

  test("probe.pool-size=1 serializes the bulk probe without changing results") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft-pool1").toString
    def freshCat(name: String, poolSize: String) = {
      val c = new graft.catalog.GraftCatalog
      c.initialize(name, new CaseInsensitiveStringMap(
        Map("backend" -> "memory", "root" -> root,
          "probe.pool-size" -> poolSize, "probe.cache.ttl-ms" -> "0").asJava))
      c.createNamespace(Array("ns"), Map.empty[String, String].asJava)
      (1 to 8).foreach { i =>
        c.createTable(Identifier.of(Array("ns"), s"t$i"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType))),
          Array.empty, Map.empty[String, String].asJava)
      }
      c
    }
    val c = freshCat("gpool", "1")
    (1 to 8 by 2).foreach { i =>
      val dir = new java.io.File(s"$root/ns/t$i.lance"); dir.mkdirs()
      java.nio.file.Files.write(dir.toPath.resolve("part-0.parquet"),
        Array[Byte](1))
    }
    // a single-thread pool must produce the same filtered listing as the
    // default 16-thread pool — the knob trades latency, never correctness
    assert(c.listTables(Array("ns"), includeDeclared = false)
      .map(_.name()).sorted.toSeq == Seq("t1", "t3", "t5", "t7"))
    // and a nonsensical size clamps to 1 rather than failing pool creation
    assert(freshCat("gpool0", "0").listTables(Array("ns"), includeDeclared = false)
      .map(_.name()).sorted.toSeq == Seq("t1", "t3", "t5", "t7"))
  }

  test("own mutations and writes invalidate the probe caches (read-your-writes)") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val root = java.nio.file.Files.createTempDirectory("graft-ryw").toString
    spark.conf.set("spark.sql.catalog.gryw", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gryw.backend", "memory")
    spark.conf.set("spark.sql.catalog.gryw.root", root)
    spark.conf.set("spark.sql.catalog.gryw.probe.cache.ttl-ms", "600000")
    spark.sql("CREATE NAMESPACE gryw.ns")
    spark.sql("CREATE TABLE gryw.ns.t (id BIGINT)")
    val cat = spark.sessionState.catalogManager.catalog("gryw")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val ns = Array("ns")
    // declared-only, and the negative probe is now cached under a 10-min ttl
    assert(cat.listTables(ns, includeDeclared = false).isEmpty)
    // a write through THIS catalog evicts the cached negative probe on
    // commit: the materialized table is visible immediately, not after the
    // ttl (out-of-band writers stay ttl-bounded — previous test)
    spark.sql("INSERT INTO gryw.ns.t VALUES (1)")
    assert(cat.listTables(ns, includeDeclared = false).map(_.name()).toSeq
      == Seq("t"), "own write must be visible within the ttl window")
    // purge + redeclare at the reused location: both mutations evict the
    // cached POSITIVE probe, so the fresh declared-only table is hidden
    // immediately instead of riding the stale has-data entry
    assert(cat.purgeTable(Identifier.of(ns, "t")))
    spark.sql("CREATE TABLE gryw.ns.t (id BIGINT)")
    assert(cat.listTables(ns, includeDeclared = false).isEmpty,
      "redeclared-at-reused-location table must not inherit the stale probe")
  }

  test("declared-table probe (spec is_only_declared)") {
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.probe")
    spark.sql("CREATE TABLE graft.probe.t (id BIGINT)")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val ident = Identifier.of(Array("probe"), "t")
    assert(cat.isOnlyDeclared(ident))
    spark.sql("INSERT INTO graft.probe.t VALUES (1)")
    assert(!cat.isOnlyDeclared(ident))
  }

  test("PARTITIONED TABLE: identity transforms create hive-style dirs, " +
      "reads prune partitions, and schema keeps the declared types") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pt")
    spark.sql(
      """CREATE TABLE graft.pt.sales (id BIGINT, amount DOUBLE, region STRING)
        |PARTITIONED BY (region)""".stripMargin)
    spark.sql(
      """INSERT INTO graft.pt.sales VALUES
        |(1, 10.0, 'eu'), (2, 20.0, 'eu'), (3, 30.0, 'us'), (4, 40.0, 'ap')
        |""".stripMargin)
    // the DATA plane is plain hive-partitioned parquet
    val loc = new java.net.URI(spark.sql(
        "DESCRIBE TABLE EXTENDED graft.pt.sales").collect()
      .find(_.getString(0) == "Location").get.getString(1)).getPath
    val children = new java.io.File(loc).listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    assert(children == Set("region=eu", "region=us", "region=ap"),
      s"expected hive-style partition dirs, got $children")
    // full read sees everything with declared types (region stays STRING)
    val all = spark.table("graft.pt.sales")
    assert(all.schema("region").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(all.count() == 4)
    // a partition-pruned read answers correctly AND the scan carries the
    // partition filter (the delegate V2 ParquetScan prunes directories)
    val pruned = spark.sql(
      "SELECT id, amount FROM graft.pt.sales WHERE region = 'eu'")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val scanDesc = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scanDesc.contains("region"),
      s"expected the partition filter in the scan:\n$scanDesc")
    // appends land in the right partition without touching others
    spark.sql("INSERT INTO graft.pt.sales VALUES (5, 50.0, 'eu')")
    assert(spark.sql(
        "SELECT count(*) AS c FROM graft.pt.sales WHERE region = 'eu'")
      .collect().head.getLong(0) == 3L)
    assert(spark.table("graft.pt.sales").count() == 5)
  }

  test("PARTITIONED TABLE: INSERT OVERWRITE with a static PARTITION " +
      "spec replaces only that partition; plain overwrite truncates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pt")
    spark.sql(
      """CREATE TABLE graft.pt.dyn (id BIGINT, grp STRING)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(
      "INSERT INTO graft.pt.dyn VALUES (1,'a'),(2,'a'),(3,'b')")
    // partition-grain replacement: only grp='a' is rewritten
    spark.sql(
      "INSERT OVERWRITE graft.pt.dyn PARTITION (grp='a') VALUES (9)")
    val rows = spark.table("graft.pt.dyn").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((3L, "b"), (9L, "a")),
      s"partition-spec overwrite must keep untouched partitions, got $rows")
    // plain overwrite truncates the whole table
    spark.sql("INSERT OVERWRITE graft.pt.dyn VALUES (7,'c')")
    assert(spark.table("graft.pt.dyn").collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("PARTITIONED TABLE: non-identity transforms and row-level " +
      "mutations refuse loudly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pt")
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE graft.pt.bkt (id BIGINT, v STRING)
        |PARTITIONED BY (bucket(4, id))""".stripMargin))
    assert(e.getMessage.toLowerCase.contains("identity"),
      s"bucket transform must refuse: ${e.getMessage}")
    spark.sql(
      """CREATE TABLE IF NOT EXISTS graft.pt.mut (id BIGINT, grp STRING)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql("INSERT INTO graft.pt.mut VALUES (1,'a')")
    val m = intercept[Exception](
      spark.sql("DELETE FROM graft.pt.mut WHERE id = 1"))
    assert(m.getMessage.toLowerCase.contains("partition"),
      s"row-level mutation must refuse on partitioned tables: " +
        m.getMessage)
  }
}
