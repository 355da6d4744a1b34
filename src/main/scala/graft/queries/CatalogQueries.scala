package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate coverage for the catalog integration layer (SURVEY.md §2.1): runs the
  * reference lifecycle — register catalog, create namespace, register table at
  * a storage location, query through the catalog — and returns a result the
  * DuckDB oracle can hash-match. This exercises entry points A (plugin
  * bootstrap), C (DDL) and B (describeTable → pushed-down scan) of SURVEY.md
  * §3 in one pass.
  */
object CatalogQueries {

  /** Run-scoped warehouse root: q83 WRITES managed data under it, and a
    * fixed shared path would let concurrent gate/bench runs (or two users
    * on one box) clobber each other's overwrite snapshots. The JVM cleans
    * its own root on exit — otherwise every run would leak a directory. */
  private lazy val warehouseRoot: String = {
    val root = s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
      }
      del(new java.io.File(root))
    }))
    root
  }

  /** Backend seam for the catalog gates: q21/q22/q83 run against the
    * memory backend by default, but a test (or a user with a live
    * metastore) can point them at any registered backend — e.g.
    * `("hive2", Map("hive.metastore.uris" -> ...))` — and the SAME gate
    * queries drive the 13-op lifecycle through it. Must be set before the
    * session's first catalog call (Spark caches catalog instances). */
  @volatile var backendOverride: Option[(String, Map[String, String])] = None

  /** Idempotent per-session bootstrap of the graft catalog + the `tpch`
    * namespace — shared by the table gates here and the persisted-ANN-index
    * gates (q197/q198), which register index tables through the same
    * catalog. */
  def ensureCatalog(s: SparkSession): Unit = {
    val (backend, opts) =
      backendOverride.getOrElse(("memory", Map.empty[String, String]))
    s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.backend", backend)
    opts.foreach { case (k, v) => s.conf.set(s"spark.sql.catalog.graft.$k", v) }
    s.conf.set("spark.sql.catalog.graft.root", warehouseRoot)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.tpch")
    ()
  }

  /** Idempotent per-session registration of the graft catalog (memory
    * backend) + a namespace + an external table over the sf dir's parquet. */
  private def ensureTable(s: SparkSession, d: String, table: String): Unit = {
    ensureCatalog(s)
    if (!s.catalog.tableExists(s"graft.tpch.$table"))
      s.sql(s"CREATE TABLE graft.tpch.$table LOCATION '$d/$table.parquet'")
  }

  /** Full catalog lifecycle → aggregate over the catalog-registered table.
    * The scan under this plan is the same pushed-down columnar parquet scan
    * as a direct read — the catalog adds no data-plane overhead. */
  def q21CatalogScan(s: SparkSession, d: String): DataFrame = {
    ensureTable(s, d, "lineitem")
    s.sql(
      """SELECT l_returnflag,
        | round(sum(l_extendedprice), 2) AS total_price,
        | count(*) AS n
        |FROM graft.tpch.lineitem
        |WHERE l_quantity >= 10
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  val q21Sql: String =
    """SELECT l_returnflag, round(sum(l_extendedprice),2) AS total_price, count(*) AS n
      |FROM lineitem WHERE l_quantity >= 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Catalog join across two catalog-registered tables (orders ⋈ lineitem),
    * proving multi-table resolution through loadTable. */
  def q22CatalogJoin(s: SparkSession, d: String): DataFrame = {
    ensureTable(s, d, "lineitem")
    ensureTable(s, d, "orders")
    s.sql(
      """SELECT o.o_orderstatus,
        | round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        | count(*) AS n_lines
        |FROM graft.tpch.orders o JOIN graft.tpch.lineitem l
        |  ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_totalprice > 150000
        |GROUP BY o.o_orderstatus
        |ORDER BY o.o_orderstatus""".stripMargin)
  }

  val q22Sql: String =
    """SELECT o_orderstatus, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
      | count(*) AS n_lines
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_totalprice > 150000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Write-path round trip through the catalog (spec op 12, the
    * create-with-data flow): declare a managed table, INSERT OVERWRITE a
    * curated projection through GraftTable's truncate-capable write
    * builder, and aggregate reading BACK through the catalog. OVERWRITE
    * (not append) keeps the query idempotent across gate/bench re-runs. */
  def q83CatalogRoundtrip(s: SparkSession, d: String): DataFrame = {
    ensureTable(s, d, "lineitem") // registers catalog + namespace
    Tables.documents(s, d).createOrReplaceTempView("__q83_src")
    s.sql("""CREATE TABLE IF NOT EXISTS graft.tpch.docs_curated
            | (doc_id BIGINT, lang STRING, n_chars BIGINT)""".stripMargin)
    s.sql("""INSERT OVERWRITE graft.tpch.docs_curated
            |SELECT doc_id, lang, n_chars FROM __q83_src WHERE doc_id % 2 = 0""".stripMargin)
    s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
            |FROM graft.tpch.docs_curated
            |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val q83Sql: String =
    """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE doc_id % 2 = 0
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** q122: the q83 write-path round trip on the LIVE hive2 backend — boots
    * the embedded Derby-backed thrift metastore in-process (JVM singleton)
    * and drives the full DDL + INSERT OVERWRITE + read-back lifecycle
    * through the real `HiveMetaStoreClient` wire, so the live metastore
    * path has a CORRECTNESS row against the DuckDB oracle, not only
    * ScalaTest specs. A separate catalog name keeps it independent of the
    * memory-backend gates (q21/q22/q83) regardless of run order. */
  /** Register the `graft_hms` catalog (LIVE embedded thrift HMS) and
    * create `graft_hms.tpch.docs_hms` if absent — shared by the q122
    * round trip and the q180 property conformance row. */
  private def ensureHmsTable(s: SparkSession): Unit = {
    val hms = graft.hive.LocalHiveMetastore.instance
    s.conf.set("spark.sql.catalog.graft_hms", "graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_hms.backend", "hive2")
    s.conf.set("spark.sql.catalog.graft_hms.hive.metastore.uris",
      s"thrift://localhost:${hms.port}")
    s.conf.set("spark.sql.catalog.graft_hms.root", warehouseRoot)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_hms.tpch")
    s.sql("""CREATE TABLE IF NOT EXISTS graft_hms.tpch.docs_hms
            | (doc_id BIGINT, lang STRING, n_chars BIGINT)""".stripMargin)
  }

  def q122HmsRoundtrip(s: SparkSession, d: String): DataFrame = {
    ensureHmsTable(s)
    Tables.documents(s, d).createOrReplaceTempView("__q122_src")
    s.sql("""INSERT OVERWRITE graft_hms.tpch.docs_hms
            |SELECT doc_id, lang, n_chars FROM __q122_src WHERE doc_id % 3 = 0""".stripMargin)
    s.sql("""SELECT lang, count(*) AS n, sum(n_chars) AS sum_chars
            |FROM graft_hms.tpch.docs_hms
            |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** Lance-marker + managed-versioning conformance across a hermetic AND
    * a live backend: `SHOW TBLPROPERTIES` (the public DSv2 property
    * surface, backed by `GraftTable.properties`) must carry the
    * reference's `DescribeTableResponse` contract — `table_type=lance`
    * and `managed_by=storage` (the required markers,
    * `GlueNamespace.java:79,360`) and `managed_versioning=false` (every
    * reference backend: `GlueNamespace.java:263`,
    * `Hive2Namespace.java:306`) — identically through the memory backend
    * and the LIVE thrift HMS round trip. */
  def q180ManagedVersioning(s: SparkSession, d: String): DataFrame = {
    ensureTable(s, d, "lineitem")
    ensureHmsTable(s)
    val keys = Seq(graft.core.TableUtil.TableTypeKey,
      graft.core.TableUtil.ManagedByKey,
      graft.core.TableUtil.ManagedVersioningKey)
    // loadTable().properties() is the DescribeTableResponse analog — the
    // SQL-visible SHOW TBLPROPERTIES hides table_type because Spark 4
    // reserves it (TableCatalog.PROP_TABLE_TYPE), so the probe reads the
    // DSv2 surface the reference contract actually maps to
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    def props(backend: String, catName: String, tbl: String) = {
      val cat = s.sessionState.catalogManager.catalog(catName)
        .asInstanceOf[TableCatalog]
      val p = cat.loadTable(Identifier.of(Array("tpch"), tbl)).properties()
      keys.map(k => (backend, k, p.get(k)))
    }
    import s.implicits._
    (props("memory", "graft", "lineitem") ++
      props("hive2", "graft_hms", "docs_hms"))
      .toDF("backend", "key", "value")
      .orderBy(col("backend"), col("key"))
  }

  val q180Sql: String =
    """SELECT backend, key, value FROM (VALUES
      |  ('hive2',  'managed_by',         'storage'),
      |  ('hive2',  'managed_versioning', 'false'),
      |  ('hive2',  'table_type',         'lance'),
      |  ('memory', 'managed_by',         'storage'),
      |  ('memory', 'managed_versioning', 'false'),
      |  ('memory', 'table_type',         'lance')) t(backend, key, value)
      |ORDER BY backend, key""".stripMargin

  val q122Sql: String =
    """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE doc_id % 3 = 0
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Once-per-session bucketed copies of lineitem/orders, co-bucketed on
    * the join key (8 buckets, bucket-sorted). This is THE scale seam for
    * repeated fact-fact joins: both sides' bucketing satisfies the join's
    * distribution requirement, so the sort-merge join runs with NO
    * exchange — at 100 TB that deletes the dominant shuffle of every
    * downstream orderkey join, paid once at write time. */
  /** Table names are keyed on the SOURCE DIR: a session that runs q79 at
    * two scale factors must not reuse the first SF's materialized copies
    * against the second SF's oracle. */
  private def bucketedName(base: String, d: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${base}_$tag"
  }

  private def ensureBucketed(s: SparkSession, d: String): Unit = {
    val (ot, lt) = (bucketedName("graft_b_orders", d),
      bucketedName("graft_b_lineitem", d))
    if (!s.catalog.tableExists(ot)) {
      Tables.orders(s, d).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$warehouseRoot/$ot")
        .mode("overwrite").saveAsTable(ot)
    }
    if (!s.catalog.tableExists(lt)) {
      Tables.lineitem(s, d).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$warehouseRoot/$lt")
        .mode("overwrite").saveAsTable(lt)
    }
  }

  /** Shuffle-free bucketed join: revenue per order priority over the
    * co-bucketed copies. hint("merge") pins SMJ so the plan exercises the
    * bucketed-distribution path (a broadcast would also skip the shuffle,
    * but only while one side stays small — bucketing is the answer that
    * survives both sides growing 1000×). PlanShapeSpec asserts the
    * executed plan contains no Exchange. */
  def q79BucketedJoin(s: SparkSession, d: String): DataFrame = {
    ensureBucketed(s, d)
    s.table(bucketedName("graft_b_lineitem", d)).hint("merge")
      .join(s.table(bucketedName("graft_b_orders", d)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,6)")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  val q79Sql: String =
    """SELECT o_orderpriority,
      |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q253: SQL row-level DELETE on a catalog table —
    * [[graft.catalog.GraftTable]]'s copy-on-write
    * `SupportsRowLevelOperations` (group-based rewrite; the scan's
    * eager probe names only the files holding matching rows). The gate
    * copies orders into a MANAGED graft table (INSERT OVERWRITE keeps
    * the gate idempotent across runs — a mutation gate must rebuild its
    * own input), deletes a predicate slice in plain SQL, and returns
    * the survivors. Oracle: the negated predicate over the original
    * orders — DELETE must equal filter with SQL three-valued
    * semantics. */
  def q253SqlDelete(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    s.sql(
      """CREATE TABLE IF NOT EXISTS graft.tpch.mut_orders
        |(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        | o_totalprice DOUBLE)""".stripMargin)
    s.sql(
      s"""INSERT OVERWRITE graft.tpch.mut_orders
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         |FROM parquet.`$d/orders.parquet`""".stripMargin)
    s.sql(
      """DELETE FROM graft.tpch.mut_orders
        |WHERE o_orderstatus = 'F' AND o_totalprice < 100000.0""".stripMargin)
    s.table("graft.tpch.mut_orders").orderBy(col("o_orderkey"))
  }

  private val q253Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders
      |WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000.0)
      |ORDER BY o_orderkey""".stripMargin

  /** q254: SQL row-level UPDATE — same copy-on-write machinery, the
    * group-based rewrite computing updated-or-original rows per
    * affected file. The additive mutation keeps the oracle exact (IEEE
    * double addition is deterministic across engines; a multiply would
    * not hash-compare). */
  def q254SqlUpdate(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    s.sql(
      """CREATE TABLE IF NOT EXISTS graft.tpch.mut_orders_u
        |(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        | o_totalprice DOUBLE)""".stripMargin)
    s.sql(
      s"""INSERT OVERWRITE graft.tpch.mut_orders_u
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         |FROM parquet.`$d/orders.parquet`""".stripMargin)
    s.sql(
      """UPDATE graft.tpch.mut_orders_u
        |SET o_totalprice = o_totalprice + 1000.0
        |WHERE o_orderstatus = 'O'""".stripMargin)
    s.table("graft.tpch.mut_orders_u").orderBy(col("o_orderkey"))
  }

  private val q254Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 1000.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q255: SQL MERGE INTO — matched UPDATE + not-matched INSERT through
    * the same group-based rewrite (full-outer join of target groups and
    * source, actions applied row-wise, affected files replaced). The
    * source folds an exact COUNT per customer (a double SUM would not
    * hash-compare) plus one synthetic unmatched key to drive the INSERT
    * arm. Oracle: the equivalent left-join arithmetic over the original
    * tables plus the inserted literal row. */
  def q255SqlMerge(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    s.sql(
      """CREATE TABLE IF NOT EXISTS graft.tpch.mut_cust
        |(c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE)""".stripMargin)
    s.sql(
      s"""INSERT OVERWRITE graft.tpch.mut_cust
         |SELECT c_custkey, c_name, c_acctbal
         |FROM parquet.`$d/customer.parquet`""".stripMargin)
    s.sql(
      s"""MERGE INTO graft.tpch.mut_cust t
         |USING (
         |  SELECT o_custkey AS k, count(*) AS n
         |  FROM parquet.`$d/orders.parquet` GROUP BY o_custkey
         |  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(42 AS BIGINT)
         |) s
         |ON t.c_custkey = s.k
         |WHEN MATCHED THEN UPDATE SET c_acctbal = c_acctbal + s.n
         |WHEN NOT MATCHED THEN
         |  INSERT (c_custkey, c_name, c_acctbal) VALUES (s.k, 'merged', s.n)
         |""".stripMargin)
    s.table("graft.tpch.mut_cust").orderBy(col("c_custkey"))
  }

  private val q255Sql: String =
    """WITH n AS (
      |  SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY o_custkey)
      |SELECT c.c_custkey, c.c_name,
      |       c.c_acctbal + COALESCE(n.n, 0) AS c_acctbal
      |FROM customer c LEFT JOIN n ON c.c_custkey = n.k
      |UNION ALL
      |SELECT -1 AS c_custkey, 'merged' AS c_name, 42.0 AS c_acctbal
      |ORDER BY c_custkey""".stripMargin

  /** q260: `CALL graft.system.compact_table` — the lakehouse OPTIMIZE
    * loop on a catalog table: the gate seeds the table as 48 deliberate
    * small files (the streaming-ingest pathology), compacts with a
    * single-column range clustering, REQUIRES the receipt to show the
    * file count collapsed, and returns the table's full content —
    * compaction must be invisible in results. Oracle: the plain source
    * projection. */
  def q260CompactTable(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    s.sql(
      """CREATE TABLE IF NOT EXISTS graft.tpch.cmp_orders
        |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        |""".stripMargin)
    s.sql(
      s"""INSERT OVERWRITE graft.tpch.cmp_orders
         |SELECT /*+ REPARTITION(48) */ o_orderkey, o_custkey, o_totalprice
         |FROM parquet.`$d/orders.parquet`""".stripMargin)
    val receipt = s.sql(
      """CALL graft.system.compact_table(
        |  table => 'graft.tpch.cmp_orders', target_mb => '128',
        |  cluster_by => 'o_orderkey')""".stripMargin).collect().head
    val (before, after) =
      (receipt.getString(1).toInt, receipt.getString(2).toInt)
    require(before >= 48 && after < before,
      s"q260: compaction did not shrink the file count ($before -> $after)")
    s.table("graft.tpch.cmp_orders").orderBy(col("o_orderkey"))
  }

  private val q260Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q273: PARTITIONED catalog table — identity transforms accepted at
    * CREATE, writes laid out as hive-style `day_bucket=N/` dirs through
    * Spark's own partitioned-parquet committer (the DSv2 V1-write
    * fallback, [[graft.catalog.GraftTable]]), and a partition-pruned
    * SELECT pushing the partition conjunct into the scan (the gate
    * REQUIRES the filter in the scan leaves). The reference's metadata
    * model is partition-free (tables are location pointers), but a real
    * 100 TB lakehouse table IS a partitioned tree — VERDICT r16's top
    * item. Oracle: the same restriction over the flat events table. */
  def q273PartitionedTable(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    s.sql(
      """CREATE TABLE IF NOT EXISTS graft.tpch.pt_ev
        |(event_id BIGINT, value DOUBLE, day_bucket INT)
        |PARTITIONED BY (day_bucket)""".stripMargin)
    s.sql(
      s"""INSERT OVERWRITE graft.tpch.pt_ev
         |SELECT event_id, value, CAST(pmod(event_id, 4) AS INT)
         |FROM parquet.`$d/events.parquet`""".stripMargin)
    val df = s.sql(
      """SELECT event_id, value FROM graft.tpch.pt_ev
        |WHERE day_bucket = 1 ORDER BY event_id""".stripMargin)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    require(leaves.contains("day_bucket"),
      s"q273: expected the partition conjunct pushed into the scan:\n" +
        leaves)
    df
  }

  private val q273Sql: String =
    """SELECT event_id, value FROM events
      |WHERE event_id % 4 = 1 ORDER BY event_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q273_partitioned_table" -> (q273PartitionedTable _),
    "q21_catalog_scan" -> (q21CatalogScan _),
    "q22_catalog_join" -> (q22CatalogJoin _),
    "q79_bucketed_join" -> (q79BucketedJoin _),
    "q83_catalog_roundtrip" -> (q83CatalogRoundtrip _),
    "q122_hms_roundtrip" -> (q122HmsRoundtrip _),
    "q180_managed_versioning" -> (q180ManagedVersioning _),
    "q253_sql_delete" -> (q253SqlDelete _),
    "q254_sql_update" -> (q254SqlUpdate _),
    "q255_sql_merge" -> (q255SqlMerge _),
    "q260_compact_table" -> (q260CompactTable _))

  val oracles: Map[String, String] = Map(
    "q273_partitioned_table" -> q273Sql,
    "q21_catalog_scan" -> q21Sql,
    "q22_catalog_join" -> q22Sql,
    "q79_bucketed_join" -> q79Sql,
    "q83_catalog_roundtrip" -> q83Sql,
    "q122_hms_roundtrip" -> q122Sql,
    "q180_managed_versioning" -> q180Sql,
    // row-level mutations must equal their relational equivalents
    "q253_sql_delete" -> q253Sql,
    "q254_sql_update" -> q254Sql,
    "q255_sql_merge" -> q255Sql,
    // small-file compaction must be invisible in results
    "q260_compact_table" -> q260Sql)
}
