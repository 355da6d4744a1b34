package graft

import org.apache.spark.sql.SparkSession

/** One-call setup for the graft engine: registers the SQL extension
  * functions and a graft catalog on an existing builder or session.
  *
  * {{{
  *   val spark = Graft.configure(SparkSession.builder().master("local[*]"))
  *     .getOrCreate()
  *   // or on a live session (catalog only — extensions need the builder):
  *   Graft.registerCatalog(spark, "lake", "file", Map("path" -> "/tmp/cat.json"))
  * }}}
  */
object Graft {

  /** Builder-time setup: SQL functions (graft_cosine, graft_jaccard) + a
    * default in-memory catalog named `graft`. */
  def configure(builder: SparkSession.Builder,
      catalogName: String = "graft",
      backend: String = "memory",
      options: Map[String, String] = Map.empty): SparkSession.Builder = {
    val b = builder
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config(s"spark.sql.catalog.$catalogName", "graft.catalog.GraftCatalog")
      .config(s"spark.sql.catalog.$catalogName.backend", backend)
    options.foldLeft(b) { case (acc, (k, v)) =>
      acc.config(s"spark.sql.catalog.$catalogName.$k", v)
    }
  }

  /** Runtime catalog registration on a live session (Spark instantiates the
    * plugin lazily on first reference, so this works until the name has
    * been used). */
  def registerCatalog(spark: SparkSession, name: String, backend: String,
      options: Map[String, String] = Map.empty): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.backend", backend)
    options.foreach { case (k, v) =>
      spark.conf.set(s"spark.sql.catalog.$name.$k", v)
    }
  }
}
