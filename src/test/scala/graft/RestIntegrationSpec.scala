package graft

import java.net.{InetSocketAddress, Socket, URI}

import org.scalatest.funsuite.AnyFunSuite

import graft.backend._
import graft.core.ObjectIdentifier

/** Socket-gated integration suites against REAL catalog services — the
  * reference's assume-and-skip pattern
  * (`hive2/TestHive2NamespaceIntegration.java:76-93`: probe the endpoint,
  * skip cleanly when absent, run the full lifecycle when present).
  *
  * Environment contract (documented in README):
  *  - `GRAFT_IT_ICEBERG_URI`  (+ optional `GRAFT_IT_ICEBERG_WAREHOUSE`,
  *    default `wh`) — an Iceberg REST catalog endpoint
  *  - `GRAFT_IT_UNITY_URI`    — a Unity Catalog server
  *  - `GRAFT_IT_POLARIS_URI`  (+ optional `GRAFT_IT_POLARIS_CATALOG`,
  *    default `graft_it`, `GRAFT_IT_POLARIS_TOKEN`) — an Apache Polaris
  *  - `GRAFT_IT_HIVE2_URI`    — a thrift HMS (e.g. thrift://host:9083)
  *
  * Unset variable OR unreachable socket → the suite cancels (shows as
  * "canceled", never green-washes); reachable → the 13-op lifecycle runs
  * against the live service. In this sandbox they always skip; on a dev
  * box with `docker compose up` catalogs they light up unchanged.
  */
class RestIntegrationSpec extends AnyFunSuite {

  /** None when the env var is unset or the endpoint socket is closed —
    * the gate condition for each suite. Default ports follow the scheme
    * (thrift 9083, http 80, https 443): probing 443 for a portless
    * thrift:// or http:// URI would silently cancel against a LIVE
    * service — exactly the green-washing this suite exists to avoid. */
  private def reachable(envVar: String): Option[String] =
    sys.env.get(envVar).filter { raw =>
      try {
        val lower = raw.toLowerCase // schemes are case-insensitive
        val u = URI.create(lower.replaceFirst("^thrift://", "tcp://"))
        val port =
          if (u.getPort > 0) u.getPort
          else if (lower.startsWith("thrift://")) 9083
          else if (u.getScheme == "http") 80
          else 443
        val s = new Socket()
        try { s.connect(new InetSocketAddress(u.getHost, port), 2000); true }
        finally s.close()
      } catch { case _: Exception => false }
    }

  /** Shared live-service lifecycle: namespace create/describe/list,
    * declare/describe/list/drop table, drop namespace — cleaned up even
    * on assertion failure so reruns stay idempotent. */
  private def lifecycle(b: MetadataBackend, ns: ObjectIdentifier): Unit = {
    val table = ns.child(s"graft_it_${ProcessHandle.current().pid()}")
    b.createNamespace(ns, Map("graft_it" -> "1"), CreateMode.ExistOk)
    try {
      assert(b.namespaceExists(ns))
      val info = b.declareTable(table, None, Map("origin" -> "graft-it"), None)
      try {
        assert(info.properties("table_type") == "lance")
        assert(b.tableExists(table))
        assert(b.listTables(ns).contains(table))
        assert(b.describeTable(table).location.nonEmpty)
      } finally b.dropTable(table, purge = false)
      assert(!b.tableExists(table))
    } finally b.dropNamespace(ns, DropMode.Skip)
  }

  test("iceberg REST: live-service lifecycle (gated on GRAFT_IT_ICEBERG_URI)") {
    val uri = reachable("GRAFT_IT_ICEBERG_URI")
    assume(uri.isDefined, "no live Iceberg REST catalog — skipping")
    val wh = sys.env.getOrElse("GRAFT_IT_ICEBERG_WAREHOUSE", "wh")
    val b = MetadataBackend.create("iceberg")
    b.initialize(Map("uri" -> uri.get, "warehouse" -> wh,
      "root" -> s"/tmp/graft-it-${ProcessHandle.current().pid()}"))
    lifecycle(b, ObjectIdentifier.of(wh, "graft_it_db"))
  }

  test("unity: live-service lifecycle (gated on GRAFT_IT_UNITY_URI)") {
    val uri = reachable("GRAFT_IT_UNITY_URI")
    assume(uri.isDefined, "no live Unity Catalog — skipping")
    val b = MetadataBackend.create("unity")
    b.initialize(Map("uri" -> uri.get,
      "root" -> s"/tmp/graft-it-${ProcessHandle.current().pid()}"))
    lifecycle(b, ObjectIdentifier.of("unity", "graft_it_schema"))
  }

  test("polaris: live-service lifecycle (gated on GRAFT_IT_POLARIS_URI)") {
    val uri = reachable("GRAFT_IT_POLARIS_URI")
    assume(uri.isDefined, "no live Polaris — skipping")
    val cat = sys.env.getOrElse("GRAFT_IT_POLARIS_CATALOG", "graft_it")
    val b = MetadataBackend.create("polaris")
    b.initialize(Map("uri" -> uri.get,
      "root" -> s"/tmp/graft-it-${ProcessHandle.current().pid()}") ++
      sys.env.get("GRAFT_IT_POLARIS_TOKEN").map("token" -> _))
    lifecycle(b, ObjectIdentifier.of(cat, "graft_it_db"))
  }

  test("glue: live-service lifecycle (gated on GRAFT_IT_GLUE_ENDPOINT)") {
    // a Glue-compatible endpoint: moto, LocalStack, or real AWS
    val uri = reachable("GRAFT_IT_GLUE_ENDPOINT")
    assume(uri.isDefined, "no live Glue-compatible endpoint — skipping")
    val b = MetadataBackend.create("glue")
    b.initialize(Map("endpoint" -> uri.get,
      "region" -> sys.env.getOrElse("GRAFT_IT_GLUE_REGION", "us-east-1"),
      "root" -> s"/tmp/graft-it-${ProcessHandle.current().pid()}") ++
      sys.env.get("GRAFT_IT_GLUE_ACCESS_KEY_ID").map("access_key_id" -> _) ++
      sys.env.get("GRAFT_IT_GLUE_SECRET_ACCESS_KEY").map("secret_access_key" -> _))
    lifecycle(b, ObjectIdentifier.of("graft_it_db"))
  }

  test("hive2: live external metastore lifecycle (gated on GRAFT_IT_HIVE2_URI)") {
    val uri = reachable("GRAFT_IT_HIVE2_URI")
    assume(uri.isDefined, "no live external Hive metastore — skipping " +
      "(the embedded-HMS coverage lives in Hive2BackendSpec)")
    val b = MetadataBackend.create("hive2")
    b.initialize(Map("hive.metastore.uris" -> uri.get,
      "root" -> s"/tmp/graft-it-${ProcessHandle.current().pid()}"))
    try lifecycle(b, ObjectIdentifier.of("graft_it_db"))
    finally b.asInstanceOf[AutoCloseable].close()
  }
}
