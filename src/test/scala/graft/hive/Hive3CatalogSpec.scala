package graft.hive

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end Spark SQL through a NON-DEFAULT Hive 3 catalog: 3-level
  * identifiers (`cat.db.table`) over the live hive3 backend against the
  * catalog-aware thrift front — `CREATE NAMESPACE` at depth 1 creates a
  * real HMS catalog, depth 2 a database inside it (via the `@cat#db`
  * wire encoding), and the full DDL + INSERT + SELECT + DROP lifecycle
  * runs through Catalyst exactly as a user would write it. */
class Hive3CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val h3 = LocalHive3Metastore.instance

  private lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-h3-wh").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("Hive3CatalogSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.g3", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.g3.backend", "hive3")
      .config("spark.sql.catalog.g3.hive.metastore.uris",
        s"thrift://localhost:${h3.port}")
      .config("spark.sql.catalog.g3.root", wh)
      .config("spark.sql.catalog.g3.client.pool-size", "2")
      .getOrCreate()
    s
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("SQL lifecycle in a second catalog: create, write, read, list, drop") {
    spark.sql("CREATE NAMESPACE g3.ml_cat")
    spark.sql("CREATE NAMESPACE g3.ml_cat.corpus")
    val cats = spark.sql("SHOW NAMESPACES IN g3").collect().map(_.getString(0))
    assert(cats.contains("ml_cat") && cats.contains("hive"), cats.toSeq)
    assert(spark.sql("SHOW NAMESPACES IN g3.ml_cat").collect()
      .map(_.getString(0)).toSeq == Seq("ml_cat.corpus"))

    spark.sql("CREATE TABLE g3.ml_cat.corpus.docs (id BIGINT, txt STRING)")
    assert(spark.table("g3.ml_cat.corpus.docs").count() == 0) // declared
    spark.sql("INSERT INTO g3.ml_cat.corpus.docs VALUES (1,'a'),(2,'b'),(3,'c')")
    assert(spark.sql("SELECT sum(id) FROM g3.ml_cat.corpus.docs")
      .head().getLong(0) == 6L)
    assert(spark.sql("SHOW TABLES IN g3.ml_cat.corpus").collect()
      .map(_.getString(1)).toSeq == Seq("docs"))

    // catalog isolation through SQL: the default catalog sees nothing
    assert(!spark.sql("SHOW NAMESPACES IN g3.hive").collect()
      .map(_.getString(0)).contains("hive.corpus"))

    spark.sql("DROP TABLE g3.ml_cat.corpus.docs")
    spark.sql("DROP NAMESPACE g3.ml_cat.corpus")
    spark.sql("DROP NAMESPACE g3.ml_cat")
    assert(!spark.sql("SHOW NAMESPACES IN g3").collect()
      .map(_.getString(0)).contains("ml_cat"))
  }
}
