package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One session per suite; graft catalog
  * pre-registered on the memory backend. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  protected lazy val warehouse: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-wh")

  protected lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    .config("spark.sql.catalog.graft.backend", "memory")
    .config("spark.sql.catalog.graft.root", warehouse.toString)
    .getOrCreate()

  protected val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}
