package graft.hive

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CatalogQueries

/** End-to-end: the catalog GATE queries (q21 scan, q22 join, q83 write
  * round trip) running with the graft catalog bound to the LIVE hive2
  * backend over the embedded Derby metastore — the same SQL, the same
  * plans, a real HMS underneath. Results must equal the memory-backend
  * run bit-for-bit: the metadata backend must never change query output.
  */
class Hive2CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val hms = LocalHiveMetastore.instance

  // own session (not SparkSpec's): the graft catalog instance is cached
  // per-session at first use, so binding it to hive2 needs a fresh one
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("Hive2CatalogSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = {
    CatalogQueries.backendOverride = None
    spark.stop()
    super.afterAll()
  }

  test("q21/q22/q83 gates run green on backend=hive2 (embedded HMS)") {
    // memory-backend truth from an isolated session
    val memSession = spark.newSession()
    CatalogQueries.backendOverride = None
    val memQ21 = CatalogQueries.q21CatalogScan(memSession, sfDir).collect().toSeq
    val memQ22 = CatalogQueries.q22CatalogJoin(memSession, sfDir).collect().toSeq
    val memQ83 = CatalogQueries.q83CatalogRoundtrip(memSession, sfDir).collect().toSeq

    val hiveSession = spark.newSession()
    CatalogQueries.backendOverride = Some(("hive2", Map(
      "hive.metastore.uris" -> s"thrift://localhost:${hms.port}",
      "client.pool-size" -> "2")))
    try {
      assert(CatalogQueries.q21CatalogScan(hiveSession, sfDir).collect().toSeq == memQ21)
      assert(CatalogQueries.q22CatalogJoin(hiveSession, sfDir).collect().toSeq == memQ22)
      assert(CatalogQueries.q83CatalogRoundtrip(hiveSession, sfDir).collect().toSeq == memQ83)
      assert(memQ21.nonEmpty && memQ22.nonEmpty && memQ83.nonEmpty)

      // the lifecycle really went through HMS: the namespace and tables
      // are visible to a direct backend client
      val b = new graft.backend.hive.Hive2Backend
      b.initialize(Map("hive.metastore.uris" -> s"thrift://localhost:${hms.port}"))
      try {
        val ns = graft.core.ObjectIdentifier.of("tpch")
        assert(b.namespaceExists(ns))
        val tables = b.listTables(ns).map(_.name)
        assert(tables.contains("lineitem") && tables.contains("docs_curated"), tables)
        val curated = b.describeTable(ns.child("docs_curated"))
        assert(!curated.isOnlyDeclared, "q83 wrote real data")
        assert(curated.schemaJson.exists(_.contains("doc_id")))
      } finally b.close()
    } finally CatalogQueries.backendOverride = None
  }

  test("DSv2 DDL surface drives hive2: nested schema + drop purge") {
    val s = spark.newSession()
    CatalogQueries.backendOverride = None
    graft.Graft.registerCatalog(s, "hcat", "hive2", Map(
      "hive.metastore.uris" -> s"thrift://localhost:${hms.port}",
      "root" -> hms.warehouseDir))
    s.sql("CREATE NAMESPACE IF NOT EXISTS hcat.ddl_db")
    s.sql("CREATE TABLE hcat.ddl_db.t (id BIGINT NOT NULL, emb ARRAY<FLOAT>)")
    assert(s.table("hcat.ddl_db.t").count() == 0) // declared-only scan
    // declared schema (incl. NOT NULL) survived the HMS parameter round trip
    assert(s.table("hcat.ddl_db.t").schema("id").nullable == false)
    s.sql("INSERT INTO hcat.ddl_db.t VALUES (1, array(CAST(0.5 AS FLOAT)))")
    val row = s.table("hcat.ddl_db.t").head()
    assert(row.getLong(0) == 1L)

    val loc = s.sql("DESCRIBE TABLE EXTENDED hcat.ddl_db.t").collect()
      .find(_.getString(0) == "Location").map(_.getString(1)).get
    s.sql("DROP TABLE hcat.ddl_db.t PURGE")
    val p = new org.apache.hadoop.fs.Path(loc)
    assert(!p.getFileSystem(s.sessionState.newHadoopConf()).exists(p),
      "PURGE must remove storage")
    s.sql("DROP NAMESPACE hcat.ddl_db")
  }
}
