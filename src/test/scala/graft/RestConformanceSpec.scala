package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.backend.DropMode
import graft.core.{GraftError, ObjectIdentifier}

/** Wire-conformance pins for the three REST backends against behaviors the
  * reference documents in code — the analog of GlueBackendSpec's page-cap /
  * throttling / error-taxonomy blocks:
  *
  *  - Iceberg registers lance tables with the exact dummy 1-column schema
  *    of `IcebergModels.createDummySchema` (`IcebergModels.java:446-460`);
  *  - Iceberg's dropNamespace treats 404 as idempotent success
  *    (`IcebergNamespace.java:292-294`) — surfaced here through DropMode:
  *    Skip matches the reference's unconditional success, Fail keeps the
  *    trait's stricter not-found (documented divergence);
  *  - Unity maps declared schemas through the reference's Arrow→Unity type
  *    table with STRING as the catch-all for unmapped types
  *    (`UnityNamespace.java:505-558`), and registers the reference's
  *    `__placeholder_id` column when no schema is declared
  *    (`UnityNamespace.java:336-345`);
  *  - Polaris rejects a generic table whose `format` is not `lance` with
  *    the reference's InvalidInput wording (`PolarisNamespace.java:357-362`).
  */
class RestConformanceSpec extends AnyFunSuite {

  private case class Captured(method: String, path: String, body: String)

  /** One in-process HTTP server per test: every request is recorded, the
    * route function picks (status, json-body). */
  private def withServer(route: (String, String) => (Int, String))(
      f: (Int, mutable.Buffer[Captured]) => Unit): Unit = {
    val captured = mutable.Buffer.empty[Captured]
    val server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      captured.synchronized {
        captured += Captured(ex.getRequestMethod, ex.getRequestURI.getPath, body)
      }
      val (code, resp) = route(ex.getRequestMethod, ex.getRequestURI.getPath)
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(server.getAddress.getPort, captured)
    finally server.stop(0)
  }

  // ---- Iceberg --------------------------------------------------------

  private def icebergBackend(port: Int) = {
    val b = new graft.backend.rest.IcebergRestBackend
    b.initialize(Map("uri" -> s"http://localhost:$port", "max-retries" -> "0"))
    b
  }

  test("iceberg: register sends exactly the reference's dummy 1-column schema") {
    withServer {
      case ("GET", "/v1/config") => (200, "{}")
      case ("POST", p) if p.endsWith("/tables") => (200, "{}")
      case _ => (404, """{"error":{"message":"nope"}}""")
    } { (port, captured) =>
      val b = icebergBackend(port)
      b.declareTable(ObjectIdentifier.of("wh", "ns", "t1"),
        Some("file:/w/ns/t1"), Map("k" -> "v"), schemaJson = None)
      val post = captured.find(_.method == "POST").get
      val schema = JsonMethods.parse(post.body) \ "schema"
      // IcebergModels.createDummySchema (IcebergModels.java:446-460):
      // struct, schema-id 0 implied by catalog, one optional string field
      // {id:1, name:"dummy", required:false}
      assert(schema \ "type" == JString("struct"))
      val fields = (schema \ "fields").asInstanceOf[JArray].arr
      assert(fields.size == 1)
      val f0 = fields.head
      assert(f0 \ "id" == JInt(1))
      assert(f0 \ "name" == JString("dummy"))
      assert(f0 \ "required" == JBool(false))
      assert(f0 \ "type" == JString("string"))
    }
  }

  test("iceberg: declared schema registers NATIVE iceberg columns (DFS field " +
      "ids, nested element/key/value ids, string catch-all) and round-trips") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("ts", TimestampType),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(StringType, LongType)),
      StructField("nested", StructType(Seq(
        StructField("x", IntegerType), StructField("y", DoubleType))))))
    val declaredJson = graft.schema.JsonArrowSchema.toJson(schema)
    withServer {
      case ("GET", "/v1/config") => (200, "{}")
      case ("POST", p) if p.endsWith("/tables") => (200, "{}")
      case ("GET", p) if p.contains("/tables/") =>
        (200, s"""{"metadata":{"location":"file:/w/ns/t1","properties":{
                 "table_type":"lance",
                 "graft.schema":${JsonMethods.compact(JsonMethods.render(
                   JString(declaredJson)))}}}}""")
      case _ => (404, """{"error":{"message":"nope"}}""")
    } { (port, captured) =>
      val b = icebergBackend(port)
      b.declareTable(ObjectIdentifier.of("wh", "ns", "t1"),
        Some("file:/w/ns/t1"), Map.empty, Some(declaredJson))
      val post = captured.find(_.method == "POST").get
      val sent = JsonMethods.parse(post.body) \ "schema"
      assert(sent \ "type" == JString("struct"))
      val fields = (sent \ "fields").asInstanceOf[JArray].arr
      assert(fields.map(f => (f \ "name").asInstanceOf[JString].s) ==
        Seq("id", "name", "ts", "tags", "attrs", "nested"))
      // top-level types: long, string, timestamptz (Spark TimestampType is
      // session-tz-relative), then the nested spellings
      assert(fields(0) \ "type" == JString("long"))
      assert(fields(0) \ "required" == JBool(true))
      assert(fields(1) \ "type" == JString("string"))
      assert(fields(2) \ "type" == JString("timestamptz"))
      val list = fields(3) \ "type"
      assert(list \ "type" == JString("list"))
      assert(list \ "element" == JString("string"))
      val map = fields(4) \ "type"
      assert(map \ "type" == JString("map"))
      assert(map \ "key" == JString("string"))
      assert(map \ "value" == JString("long"))
      val nested = fields(5) \ "type"
      assert((nested \ "fields").asInstanceOf[JArray].arr
        .map(f => (f \ "type").asInstanceOf[JString].s) == Seq("int", "double"))
      // field ids are unique and DFS-sequential across the whole tree:
      // 1 id, 2 name, 3 ts, 4 tags, 5 element, 6 attrs, 7 key, 8 value,
      // 9 nested, 10 x, 11 y
      assert(fields.map(f => (f \ "id").asInstanceOf[JInt].num.toInt) ==
        Seq(1, 2, 3, 4, 6, 9))
      assert((list \ "element-id") == JInt(5))
      assert((map \ "key-id") == JInt(7))
      assert((map \ "value-id") == JInt(8))
      assert((nested \ "fields").asInstanceOf[JArray].arr
        .map(f => (f \ "id").asInstanceOf[JInt].num.toInt) == Seq(10, 11))
      // loadTable round trip: describeTable surfaces the exact declared
      // schema back through graft.schema
      val info = b.describeTable(ObjectIdentifier.of("wh", "ns", "t1"))
      assert(info.schemaJson.contains(declaredJson))
      assert(graft.schema.JsonArrowSchema.fromJson(info.schemaJson.get)
        == schema)
    }
  }

  test("iceberg: dropNamespace 404 — Skip is idempotent success, Fail surfaces not-found") {
    withServer {
      case ("GET", "/v1/config") => (200, "{}")
      case ("GET", p) if p.startsWith("/v1/namespaces/") =>
        (200, """{"namespace":["ns"],"properties":{}}""")
      case ("DELETE", _) => (404, """{"error":{"message":"no such namespace"}}""")
      case _ => (404, "{}")
    } { (port, _) =>
      val b = icebergBackend(port)
      // reference behavior (IcebergNamespace.java:292-294): DELETE→404 is
      // success; DropMode.Skip carries that surface
      assert(b.dropNamespace(ObjectIdentifier.of("wh", "ns"), DropMode.Skip) == Map.empty)
      // trait-level strictness on Fail — the documented divergence from
      // the reference's unconditional idempotency
      intercept[GraftError.NamespaceNotFound](
        b.dropNamespace(ObjectIdentifier.of("wh", "ns"), DropMode.Fail))
    }
  }

  // ---- Unity ----------------------------------------------------------

  private def unityBackend(port: Int) = {
    val b = new graft.backend.rest.UnityBackend
    b.initialize(Map("uri" -> s"http://localhost:$port", "max-retries" -> "0"))
    b
  }

  test("unity: declared schema maps through the reference type table, STRING catch-all") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("b", BooleanType),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("arr", ArrayType(LongType)), // unmapped → STRING catch-all
      StructField("dec", DecimalType(10, 2)))) // unmapped → STRING catch-all
    withServer {
      case ("POST", p) if p.endsWith("/tables") => (200, "{}")
      case _ => (404, "{}")
    } { (port, captured) =>
      val b = unityBackend(port)
      b.declareTable(ObjectIdentifier.of("cat", "sch", "t1"), Some("file:/w/t1"),
        Map.empty, Some(graft.schema.JsonArrowSchema.toJson(schema)))
      val cols = (JsonMethods.parse(captured.head.body) \ "columns")
        .asInstanceOf[JArray].arr
      // UnityNamespace.java:505-530: the eight mapped scalars, then the
      // catch-all `return "STRING"` for everything else
      val expected = Seq("STRING", "INT", "LONG", "FLOAT", "DOUBLE",
        "BOOLEAN", "DATE", "TIMESTAMP", "STRING", "STRING")
      assert(cols.map(c => (c \ "type_name").asInstanceOf[JString].s) == expected)
      // and the JSON twins (UnityNamespace.java:532-558)
      assert((cols.head \ "type_json") == JString("""{"type":"string"}"""))
      assert((cols(2) \ "type_json") == JString("""{"type":"long"}"""))
      assert((cols(8) \ "type_json") == JString("""{"type":"string"}"""))
      // positions are declaration order, names preserved
      assert(cols.map(c => (c \ "position").asInstanceOf[JInt].num.toInt)
        == (0 until 10))
      assert((cols.head \ "name") == JString("s"))
    }
  }

  test("unity: no declared schema registers the reference's placeholder column") {
    withServer {
      case ("POST", p) if p.endsWith("/tables") => (200, "{}")
      case _ => (404, "{}")
    } { (port, captured) =>
      val b = unityBackend(port)
      b.declareTable(ObjectIdentifier.of("cat", "sch", "t2"), Some("file:/w/t2"),
        Map.empty, schemaJson = None)
      val cols = (JsonMethods.parse(captured.head.body) \ "columns")
        .asInstanceOf[JArray].arr
      // UnityNamespace.java:336-345: single __placeholder_id LONG column
      assert(cols.size == 1)
      assert((cols.head \ "name") == JString("__placeholder_id"))
      assert((cols.head \ "type_name") == JString("LONG"))
      assert((cols.head \ "type_json") == JString("""{"type":"long"}"""))
      assert((cols.head \ "nullable") == JBool(true))
      val body = JsonMethods.parse(captured.head.body)
      assert(body \ "table_type" == JString("EXTERNAL"))
      assert(body \ "data_source_format" == JString("TEXT"))
    }
  }

  // ---- Polaris --------------------------------------------------------

  test("polaris: non-lance generic table is rejected with the reference's wording") {
    withServer {
      case ("GET", p) if p.contains("/generic-tables/") =>
        (200, """{"table":{"name":"t1","format":"delta",
                 "base-location":"file:/w/t1","properties":{}}}""")
      case _ => (404, "{}")
    } { (port, _) =>
      val b = new graft.backend.rest.PolarisBackend
      b.initialize(Map("uri" -> s"http://localhost:$port", "max-retries" -> "0"))
      // PolarisNamespace.java:357-362: InvalidInputException naming the
      // offending format
      val e = intercept[GraftError.InvalidInput](
        b.describeTable(ObjectIdentifier.of("cat", "ns", "t1")))
      assert(e.detail.contains("not a Lance table"))
      assert(e.detail.contains("delta"))
    }
  }

  test("polaris: declared schema rides the generic-table properties and " +
      "round-trips through describeTable") {
    import org.apache.spark.sql.types._
    // the Polaris generic-tables API carries NO native column list (its
    // create body is name/format/base-location/doc/properties only), so
    // unlike iceberg/unity/hive/glue the declared schema's ONLY carrier is
    // the graft.schema property — this row pins that the carrier is
    // complete: declared StructType → wire body property → loadTable
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("emb", ArrayType(FloatType)),
      StructField("meta", StructType(Seq(StructField("src", StringType))))))
    val declaredJson = graft.schema.JsonArrowSchema.toJson(schema)
    val stored = new java.util.concurrent.atomic.AtomicReference[String]("")
    withServer {
      case ("POST", p) if p.endsWith("/generic-tables") => (200, "{}")
      case ("GET", p) if p.contains("/generic-tables/") =>
        (200, s"""{"table":{"name":"t1","format":"lance",
                 "base-location":"file:/w/t1",
                 "properties":${stored.get}}}""")
      case _ => (404, "{}")
    } { (port, captured) =>
      val b = new graft.backend.rest.PolarisBackend
      b.initialize(Map("uri" -> s"http://localhost:$port", "max-retries" -> "0"))
      b.declareTable(ObjectIdentifier.of("cat", "ns", "t1"),
        Some("file:/w/t1"), Map.empty, Some(declaredJson))
      val post = captured.find(_.method == "POST").get
      val sentProps = JsonMethods.parse(post.body) \ "properties"
      assert((sentProps \ "graft.schema") == JString(declaredJson))
      assert(JsonMethods.parse(post.body) \ "format" == JString("lance"))
      // feed the captured wire properties back as the server's stored state
      stored.set(JsonMethods.compact(JsonMethods.render(sentProps)))
      val info = b.describeTable(ObjectIdentifier.of("cat", "ns", "t1"))
      assert(info.schemaJson.contains(declaredJson))
      assert(graft.schema.JsonArrowSchema.fromJson(info.schemaJson.get)
        == schema)
    }
  }

  test("polaris: lance-format generic table describes cleanly") {
    withServer {
      case ("GET", p) if p.contains("/generic-tables/") =>
        (200, """{"table":{"name":"t1","format":"lance",
                 "base-location":"file:/w/t1",
                 "properties":{"table_type":"lance"}}}""")
      case _ => (404, "{}")
    } { (port, _) =>
      val b = new graft.backend.rest.PolarisBackend
      b.initialize(Map("uri" -> s"http://localhost:$port", "max-retries" -> "0"))
      val info = b.describeTable(ObjectIdentifier.of("cat", "ns", "t1"))
      assert(info.location == "file:/w/t1")
    }
  }
}
