package graft.backend

import graft.core.{GraftError, ObjectIdentifier}

/** Config surface of the one service backend without a usable client in
  * this build: the Hive 3.x metastore (its catalog-level thrift API needs
  * Hive 3 jars; only Hive 2.3 ships here — Hive 2.x has a LIVE
  * implementation in [[graft.backend.hive.Hive2Backend]], and Glue a live
  * wire-protocol one in [[graft.backend.glue.GlueRestBackend]]). The stub
  * parses and validates its reference-documented configuration, enforces
  * the reference's identifier-depth policy, and fails every RPC with the
  * spec's ServiceUnavailable error (code 17) — honest, with the full
  * config/validation surface, swappable for a live client without touching
  * the catalog layer.
  */
abstract class ServiceStubBackend(name: String, uriKey: String) extends MetadataBackend {
  protected var conf: Map[String, String] = Map.empty

  /** Reference-documented client defaults (BASELINE.md):
    * HMS pool size 3 (`Hive2NamespaceConfig.java:26-27`), connect/read
    * timeouts 10 s/30 s, ≤3 retries. Parsed and validated here so a future
    * live client inherits them. */
  protected var poolSize: Int = 3
  protected var connectTimeoutMs: Long = 10000
  protected var readTimeoutMs: Long = 30000

  override def initialize(props: Map[String, String]): Unit = {
    conf = props
    poolSize = props.get("client.pool-size").map(_.toInt).getOrElse(3)
    connectTimeoutMs = props.get("connect_timeout_ms").map(_.toLong).getOrElse(10000)
    readTimeoutMs = props.get("read_timeout_ms").map(_.toLong).getOrElse(30000)
    if (poolSize <= 0) throw GraftError.InvalidInput("client.pool-size must be > 0")
  }

  override def backendId: String = s"$name(${conf.getOrElse(uriKey, "<unconfigured>")})"

  /** Backend-specific identifier-depth policy (validated before any RPC,
    * as the reference does). */
  protected def validateNamespaceDepth(id: ObjectIdentifier): Unit

  protected def unavailable(op: String): Nothing =
    throw GraftError.ServiceUnavailable(
      s"$name backend requires a live service (${conf.getOrElse(uriKey, uriKey + " unset")}); " +
        s"no client available in this build — operation: $op")

  override def listNamespaces(parent: ObjectIdentifier): Seq[ObjectIdentifier] =
    unavailable("listNamespaces")
  override def createNamespace(id: ObjectIdentifier, properties: Map[String, String],
      mode: CreateMode): Map[String, String] = {
    validateNamespaceDepth(id); unavailable("createNamespace")
  }
  override def namespaceExists(id: ObjectIdentifier): Boolean = unavailable("namespaceExists")
  override def describeNamespace(id: ObjectIdentifier): Map[String, String] = {
    validateNamespaceDepth(id); unavailable("describeNamespace")
  }
  override def dropNamespace(id: ObjectIdentifier, mode: DropMode): Map[String, String] = {
    validateNamespaceDepth(id); unavailable("dropNamespace")
  }
  override def listTables(ns: ObjectIdentifier): Seq[ObjectIdentifier] = {
    validateNamespaceDepth(ns); unavailable("listTables")
  }
  override def tableExists(id: ObjectIdentifier): Boolean = unavailable("tableExists")
  override def describeTable(id: ObjectIdentifier): TableInfo = {
    validateNamespaceDepth(id.parent); unavailable("describeTable")
  }
  override def declareTable(id: ObjectIdentifier, location: Option[String],
      properties: Map[String, String], schemaJson: Option[String]): TableInfo = {
    validateNamespaceDepth(id.parent); unavailable("declareTable")
  }
  override def dropTable(id: ObjectIdentifier, purge: Boolean): TableInfo =
    unavailable("dropTable")
}

/** Hive 3.x metastore: ≤2 levels catalog.database (`Hive3Namespace.java:110`);
  * default catalog "hive" (`hive3.py:104`). */
class Hive3Backend extends ServiceStubBackend("hive3", "hive.metastore.uris") {
  override protected def validateNamespaceDepth(id: ObjectIdentifier): Unit =
    if (id.depth < 1 || id.depth > 2)
      throw GraftError.InvalidInput(
        s"hive3 namespaces are 1 (catalog) or 2 (catalog.database) levels, got $id")
}

