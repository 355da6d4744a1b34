package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.backend._
import graft.core.{GraftError, ObjectIdentifier}

/** Contract tests for the Glue wire-protocol backend against an in-JVM
  * fake speaking `application/x-amz-json-1.1` — the role the reference's
  * moto/LocalStack-gated tests play, self-contained. The fake VERIFIES
  * the SigV4 signature on every call: it re-derives the expected
  * signature from the request's own signed headers + payload with the
  * known test secret (what real AWS does) and compares byte-for-byte,
  * so a canonicalization bug in AwsSigV4 — header trimming, sorting,
  * payload hash — fails here, not only against real AWS/moto. */
class GlueBackendSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  // db name -> (Description, LocationUri, Parameters)
  private val dbs = scala.collection.mutable.LinkedHashMap[String, JValue]()
  // (db, table) -> TableInput JValue
  private val tbls = scala.collection.mutable.LinkedHashMap[(String, String), JValue]()
  @volatile private var lastAuth: Option[String] = None
  @volatile private var sawBadAuth: Option[String] = None
  @volatile private var sigMismatch: Option[String] = None
  // fault injection + wire observation for the conformance rows
  @volatile private var injectRemaining: Int = 0
  @volatile private var injectCode: Int = 400
  @volatile private var injectType: String = ""
  @volatile private var requestCount: Int = 0
  private val maxResultsLog = new java.util.concurrent.CopyOnWriteArrayList[Int]()

  /** Server-side SigV4 verification: parse SignedHeaders out of the
    * Authorization header, re-sign the request with the shared secret,
    * and demand an identical signature. */
  private def verifySignature(ex: HttpExchange, auth: String,
      payload: Array[Byte]): Unit = {
    val sigR = "Signature=([0-9a-f]{64})".r
    val shR = "SignedHeaders=([a-z0-9;-]+)".r
    val check = for {
      got <- sigR.findFirstMatchIn(auth).map(_.group(1))
      sh <- shR.findFirstMatchIn(auth).map(_.group(1))
      ts <- Option(ex.getRequestHeaders.getFirst("x-amz-date"))
    } yield {
      // the signer injects x-amz-date itself; hand it every OTHER header
      // the client claims to have signed, valued as actually received
      val hdrs = sh.split(';').toSeq.filterNot(_ == "x-amz-date")
        .map(h => h -> Option(ex.getRequestHeaders.getFirst(h)).getOrElse(""))
        .toMap
      val expected = graft.backend.glue.AwsSigV4.signedHeaders(
        "POST", ex.getRequestURI.getPath, hdrs, payload, "us-east-1", "glue",
        graft.backend.glue.AwsSigV4.Credentials("AKIATEST", "testsecret"), ts)
      val exp = sigR.findFirstMatchIn(expected("Authorization")).map(_.group(1))
      if (!exp.contains(got))
        s"signature mismatch: got=$got expected=$exp signedHeaders=$sh"
      else ""
    }
    check match {
      case Some("") => ()
      case Some(bad) => if (sigMismatch.isEmpty) sigMismatch = Some(bad)
      case None =>
        if (sigMismatch.isEmpty) sigMismatch = Some(s"unverifiable auth: $auth")
    }
  }

  private def err(ex: HttpExchange, code: Int, tpe: String, msg: String): Unit = {
    val body = s"""{"__type":"$tpe","Message":"$msg"}"""
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, b.length); ex.getResponseBody.write(b); ex.close()
  }
  private def ok(ex: HttpExchange, jv: JValue): Unit = {
    val b = JsonMethods.compact(JsonMethods.render(jv)).getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
  }
  private def str(jv: JValue): Option[String] =
    jv match { case JString(s) if s.nonEmpty => Some(s); case _ => None }

  /** Native NextToken paging: token = "gtok<offset>". Records every
    * MaxResults so tests can pin the reference's min(remaining, 100)
    * page cap (`GlueNamespace.java:82,127`). */
  private def page[T](items: List[T], body: JValue): (List[T], Option[String]) = {
    val size = (body \ "MaxResults") match {
      case JInt(n) => maxResultsLog.add(n.toInt); n.toInt
      case _ => 100
    }
    val off = str(body \ "NextToken").map(_.stripPrefix("gtok").toInt).getOrElse(0)
    val slice = items.slice(off, off + size)
    val next = if (off + size < items.size) Some(s"gtok${off + size}") else None
    (slice, next)
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    port = server.getAddress.getPort
    server.createContext("/", (ex: HttpExchange) => try {
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      lastAuth = auth
      val raw = ex.getRequestBody.readAllBytes()
      // SigV4 shape check: scope + signed headers + 64-hex signature
      auth.foreach { a =>
        val okShape = a.matches(
          "AWS4-HMAC-SHA256 Credential=[^/]+/\\d{8}/[^/]+/glue/aws4_request, " +
          "SignedHeaders=[a-z0-9;-]+, Signature=[0-9a-f]{64}")
        if (!okShape && sawBadAuth.isEmpty) sawBadAuth = Some(a)
        verifySignature(ex, a, raw)
      }
      val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
      val body = JsonMethods.parse(new String(raw, StandardCharsets.UTF_8))
      requestCount += 1
      if (injectRemaining > 0) {
        injectRemaining -= 1
        if (injectType.isEmpty) {
          // a proxy/LB shedding load: bare 429, non-Glue body
          val b = "slow down".getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(injectCode, b.length)
          ex.getResponseBody.write(b); ex.close()
        } else err(ex, injectCode, injectType, "injected fault")
      } else route(ex, target.stripPrefix("AWSGlue."), body)
    } catch { case e: Exception => err(ex, 500, "InternalServiceException", e.toString) })
    server.start()
  }

  private def route(ex: HttpExchange, op: String, body: JValue): Unit = op match {
    case "GetDatabases" =>
      val (slice, next) = page(dbs.keys.toList.sorted, body)
      ok(ex, JObject(List(
        "DatabaseList" -> JArray(slice.map(n =>
          JObject("Name" -> JString(n)) merge dbs(n).asInstanceOf[JObject]))) ++
        next.map(t => "NextToken" -> (JString(t): JValue))))
    case "GetDatabase" =>
      val name = str(body \ "Name").getOrElse("")
      dbs.get(name) match {
        case Some(d) => ok(ex, JObject("Database" ->
          (JObject("Name" -> JString(name)) merge d.asInstanceOf[JObject])))
        case None => err(ex, 400, "EntityNotFoundException", s"Database $name not found")
      }
    case "CreateDatabase" =>
      val in = body \ "DatabaseInput"
      val name = str(in \ "Name").getOrElse("")
      if (dbs.contains(name)) err(ex, 400, "AlreadyExistsException", "exists")
      else { dbs(name) = in.removeField(_._1 == "Name"); ok(ex, JObject()) }
    case "UpdateDatabase" =>
      val name = str(body \ "Name").getOrElse("")
      if (!dbs.contains(name)) err(ex, 400, "EntityNotFoundException", "no db")
      else { dbs(name) = (body \ "DatabaseInput").removeField(_._1 == "Name"); ok(ex, JObject()) }
    case "DeleteDatabase" =>
      val name = str(body \ "Name").getOrElse("")
      if (dbs.remove(name).isDefined) ok(ex, JObject())
      else err(ex, 400, "EntityNotFoundException", "no db")
    case "GetTables" =>
      val db = str(body \ "DatabaseName").getOrElse("")
      if (!dbs.contains(db)) err(ex, 400, "EntityNotFoundException", "no db")
      else {
        val (slice, next) = page(tbls.keys.filter(_._1 == db).map(_._2).toList.sorted, body)
        ok(ex, JObject(List(
          "TableList" -> JArray(slice.map(t => tbls((db, t)).asInstanceOf[JObject]))) ++
          next.map(t => "NextToken" -> (JString(t): JValue))))
      }
    case "GetTable" =>
      val db = str(body \ "DatabaseName").getOrElse("")
      val t = str(body \ "Name").getOrElse("")
      tbls.get((db, t)) match {
        case Some(jv) => ok(ex, JObject("Table" -> jv))
        case None => err(ex, 400, "EntityNotFoundException", "no table")
      }
    case "CreateTable" =>
      val db = str(body \ "DatabaseName").getOrElse("")
      val in = body \ "TableInput"
      val name = str(in \ "Name").getOrElse("")
      if (!dbs.contains(db)) err(ex, 400, "EntityNotFoundException", "no db")
      else if (tbls.contains((db, name))) err(ex, 400, "AlreadyExistsException", "exists")
      else { tbls((db, name)) = in; ok(ex, JObject()) }
    case "DeleteTable" =>
      val db = str(body \ "DatabaseName").getOrElse("")
      val t = str(body \ "Name").getOrElse("")
      if (tbls.remove((db, t)).isDefined) ok(ex, JObject())
      else err(ex, 400, "EntityNotFoundException", "no table")
    case other => err(ex, 400, "InvalidInputException", s"unhandled op $other")
  }

  override def afterAll(): Unit = server.stop(0)

  private def newBackend(): MetadataBackend = {
    val b = MetadataBackend.create("glue")
    b.initialize(Map(
      "endpoint" -> s"http://127.0.0.1:$port",
      "region" -> "us-east-1",
      "access_key_id" -> "AKIATEST",
      "secret_access_key" -> "testsecret",
      "root" -> "/tmp/graft-glue-wh",
      "retry_base_delay_ms" -> "10"))
    b
  }

  test("glue backend: full namespace + table lifecycle over the wire protocol") {
    val b = newBackend()
    val ns = ObjectIdentifier.of("gdb1")
    b.createNamespace(ns, Map("k" -> "v", "description" -> "a glue db"),
      CreateMode.Create)
    intercept[GraftError.NamespaceAlreadyExists](
      b.createNamespace(ns, Map.empty, CreateMode.Create))
    b.createNamespace(ns, Map.empty, CreateMode.ExistOk)
    val props = b.describeNamespace(ns)
    assert(props("k") == "v" && props("description") == "a glue db")
    assert(props("location_uri") == "/tmp/graft-glue-wh/gdb1")
    assert(b.namespaceExists(ns))
    assert(b.listNamespaces(ObjectIdentifier.root).contains(ns))

    val t = ns.child("t1")
    val schemaJson = """{"fields":[{"name":"id","nullable":true,"type":{"name":"int","bitWidth":64,"isSigned":true}}]}"""
    val info = b.declareTable(t, None, Map("custom" -> "1", "storage.region" -> "x"),
      Some(schemaJson))
    assert(info.location == "/tmp/graft-glue-wh/gdb1/t1.lance")
    assert(info.properties("table_type") == "lance")
    assert(info.storageOptions == Map("region" -> "x"))
    intercept[GraftError.TableAlreadyExists](b.declareTable(t, None, Map.empty, None))
    val described = b.describeTable(t)
    assert(described.schemaJson.contains(schemaJson))
    assert(described.isOnlyDeclared)
    assert(b.tableExists(t) && !b.tableExists(ns.child("nope")))
    assert(b.listTables(ns) == Seq(t))

    // catalog-native columns on the wire: the declared schema mapped to
    // Glue's hive-style types lands in StorageDescriptor.Columns (Athena/
    // console-visible), not only in Parameters; a schema-less declare
    // registers the reference's placeholder (glue.py:416-422)
    def storedCols(tbl: String): Seq[(String, String)] =
      (tbls(("gdb1", tbl)) \ "StorageDescriptor" \ "Columns") match {
        case JArray(cs) => cs.map(c =>
          ((c \ "Name").values.toString, (c \ "Type").values.toString))
        case other => fail(s"no Columns: $other")
      }
    assert(storedCols("t1") == Seq(("id", "bigint")))
    val tNoSchema = ns.child("t_noschema")
    b.declareTable(tNoSchema, None, Map.empty, None)
    assert(storedCols("t_noschema") == Seq(("__placeholder_id", "bigint")))
    b.dropTable(tNoSchema, purge = false)

    // restrict-only drop
    intercept[GraftError.InvalidInput](b.dropNamespace(ns, DropMode.Fail))
    b.dropTable(t, purge = false)
    intercept[GraftError.TableNotFound](b.describeTable(t))
    b.dropNamespace(ns, DropMode.Fail)
    assert(!b.namespaceExists(ns))
    assert(b.dropNamespace(ns, DropMode.Skip) == Map.empty)
  }

  test("every request carries a well-formed SigV4 Authorization header") {
    val b = newBackend()
    b.createNamespace(ObjectIdentifier.of("sig_db"), Map.empty, CreateMode.ExistOk)
    assert(lastAuth.isDefined, "expected Authorization header")
    assert(sawBadAuth.isEmpty, s"malformed SigV4 header: $sawBadAuth")
    assert(lastAuth.get.contains("/glue/aws4_request"))
    b.dropNamespace(ObjectIdentifier.of("sig_db"), DropMode.Skip)
  }

  test("every request's SigV4 signature verifies against the shared secret") {
    // the whole suite routes through verifySignature; any prior test's
    // request failing byte-equality is reported here
    val b = newBackend()
    b.createNamespace(ObjectIdentifier.of("sig_db2"),
      Map("k" -> " padded value ", "description" -> "multi word desc"),
      CreateMode.ExistOk)
    b.dropNamespace(ObjectIdentifier.of("sig_db2"), DropMode.Skip)
    assert(sigMismatch.isEmpty, sigMismatch.getOrElse(""))
  }

  test("AwsSigV4 matches a hand-derived vector (deterministic timestamp)") {
    // independent pin: signing is pure given a fixed timestamp, so the
    // signature must be bit-stable across refactors of the signer
    val out = graft.backend.glue.AwsSigV4.signedHeaders(
      "POST", "/",
      Map("host" -> "glue.us-east-1.amazonaws.com",
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "AWSGlue.GetDatabases"),
      """{"MaxResults":100}""".getBytes(StandardCharsets.UTF_8),
      "us-east-1", "glue",
      graft.backend.glue.AwsSigV4.Credentials(
        "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"),
      "20150830T123600Z")
    assert(out("x-amz-date") == "20150830T123600Z")
    val auth = out("Authorization")
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/" +
      "20150830/us-east-1/glue/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date;x-amz-target, Signature="))
    // self-consistency under re-derivation + sensitivity to every input
    def sig(s: String) = "Signature=([0-9a-f]{64})".r
      .findFirstMatchIn(s).get.group(1)
    val again = graft.backend.glue.AwsSigV4.signedHeaders(
      "POST", "/",
      Map("host" -> "glue.us-east-1.amazonaws.com",
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "AWSGlue.GetDatabases"),
      """{"MaxResults":100}""".getBytes(StandardCharsets.UTF_8),
      "us-east-1", "glue",
      graft.backend.glue.AwsSigV4.Credentials(
        "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"),
      "20150830T123600Z")
    assert(sig(auth) == sig(again("Authorization")), "signing must be pure")
    val otherPayload = graft.backend.glue.AwsSigV4.signedHeaders(
      "POST", "/",
      Map("host" -> "glue.us-east-1.amazonaws.com",
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "AWSGlue.GetDatabases"),
      """{"MaxResults":101}""".getBytes(StandardCharsets.UTF_8),
      "us-east-1", "glue",
      graft.backend.glue.AwsSigV4.Credentials(
        "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"),
      "20150830T123600Z")
    assert(sig(auth) != sig(otherPayload("Authorization")),
      "payload hash must reach the signature")
  }

  test("native NextToken pagination: tokens pass through, unpaged listing loops pages") {
    val b = newBackend()
    val ns = ObjectIdentifier.of("pg_db")
    b.createNamespace(ns, Map.empty, CreateMode.Create)
    (1 to 5).foreach(i => b.declareTable(ns.child(s"t$i"), None, Map.empty, None))
    val p1 = b.listTablesPaged(ns, None, Some(2))
    assert(p1.items.map(_.name) == Seq("t1", "t2") && p1.nextToken.contains("gtok2"))
    val p2 = b.listTablesPaged(ns, p1.nextToken, Some(2))
    assert(p2.items.map(_.name) == Seq("t3", "t4") && p2.nextToken.contains("gtok4"))
    val p3 = b.listTablesPaged(ns, p2.nextToken, Some(2))
    assert(p3.items.map(_.name) == Seq("t5") && p3.nextToken.isEmpty)
    // unpaged listing drives the native loop to completion
    assert(b.listTables(ns).map(_.name) == (1 to 5).map(i => s"t$i"))
    (1 to 5).foreach(i => b.dropTable(ns.child(s"t$i"), purge = false))
    b.dropNamespace(ns, DropMode.Fail)
  }

  test("non-lance tables are filtered; in-place UpdateDatabase keeps tables") {
    val b = newBackend()
    val ns = ObjectIdentifier.of("mix_db")
    b.createNamespace(ns, Map("a" -> "1", "b" -> "2"), CreateMode.Create)
    b.declareTable(ns.child("lance_t"), None, Map.empty, None)
    // plant a non-lance table directly in the fake
    tbls(("mix_db", "plain_t")) = JObject(
      "Name" -> JString("plain_t"),
      "TableType" -> JString("EXTERNAL_TABLE"),
      "Parameters" -> JObject(),
      "StorageDescriptor" -> JObject("Location" -> JString("/tmp/x")))
    assert(b.listTables(ns).map(_.name) == Seq("lance_t"))
    val after = b.updateNamespaceProperties(ns, Map("c" -> "3"), Set("b"))
    assert(after("a") == "1" && after("c") == "3" && !after.contains("b"))
    assert(b.listTables(ns).map(_.name) == Seq("lance_t"), "tables survive the update")
    b.dropTable(ns.child("lance_t"), purge = false)
    tbls.remove(("mix_db", "plain_t"))
    b.dropNamespace(ns, DropMode.Fail)
  }

  test("overwrite mode refuses a non-empty database (Glue DeleteDatabase cascades)") {
    val b = newBackend()
    val ns = ObjectIdentifier.of("ow_db")
    b.createNamespace(ns, Map("gen" -> "1"), CreateMode.Create)
    b.declareTable(ns.child("t"), None, Map.empty, None)
    intercept[GraftError.InvalidInput](
      b.createNamespace(ns, Map.empty, CreateMode.Overwrite))
    assert(b.listTables(ns).map(_.name) == Seq("t"), "table must survive")
    b.dropTable(ns.child("t"), purge = false)
    b.createNamespace(ns, Map("gen" -> "2"), CreateMode.Overwrite) // empty → ok
    assert(b.describeNamespace(ns)("gen") == "2")
    b.dropNamespace(ns, DropMode.Fail)
  }

  test("page cap conformance: MaxResults never exceeds 100, native pages accumulate") {
    val b = newBackend()
    val ns = ObjectIdentifier.of("cap_db")
    b.createNamespace(ns, Map.empty, CreateMode.Create)
    b.declareTable(ns.child("t000"), None, Map.empty, None)
    // plant 249 more lance tables directly (same wire shape)
    val template = tbls(("cap_db", "t000"))
    (1 to 249).foreach { i =>
      val name = f"t$i%03d"
      tbls(("cap_db", name)) =
        template merge JObject("Name" -> JString(name))
    }
    maxResultsLog.clear()
    // unpaged listing must drive the native NextToken loop to completion
    // with the reference's min(remaining, 100) fetch cap
    // (`GlueNamespace.java:82,217-233`) — never one giant MaxResults
    val all = b.listTables(ns)
    assert(all.size == 250)
    assert(maxResultsLog.size() >= 3, "250 tables need >= 3 capped pages")
    maxResultsLog.forEach(m => assert(m <= 100, s"MaxResults $m exceeds the cap"))
    // a paged call with limit > 100 sends the capped fetch size too
    maxResultsLog.clear()
    val p = b.listTablesPaged(ns, None, Some(250))
    assert(maxResultsLog.size() == 1 && maxResultsLog.get(0) == 100)
    assert(p.items.size == 100 && p.nextToken.isDefined,
      "an over-cap limit yields one capped native page + token")
    (0 to 249).foreach(i => tbls.remove(("cap_db", f"t$i%03d")))
    b.dropNamespace(ns, DropMode.Fail)
  }

  test("throttling conformance: HTTP-400 ThrottlingException retries then succeeds") {
    val b = newBackend()
    val ns = ObjectIdentifier.of("thr_db")
    b.createNamespace(ns, Map("k" -> "v"), CreateMode.Create)
    try {
      // 2 throttles then success: with max_retries=3 the 3rd attempt lands
      injectCode = 400; injectType = "ThrottlingException"
      val before = requestCount
      injectRemaining = 2
      assert(b.describeNamespace(ns)("k") == "v")
      assert(requestCount - before == 3, "2 throttled + 1 successful attempt")

      // TooManyRequestsException is the same transient class
      injectType = "TooManyRequestsException"
      injectRemaining = 1
      assert(b.namespaceExists(ns))

      // sustained throttling exhausts retries -> code-17, not a hang
      injectType = "ThrottlingException"
      injectRemaining = 10
      intercept[GraftError.ServiceUnavailable](b.describeNamespace(ns))
    } finally { injectRemaining = 0; b.dropNamespace(ns, DropMode.Fail) }
  }

  test("throttling conformance: a bare 429 from a proxy/LB is retried too") {
    val b = newBackend()
    val ns = ObjectIdentifier.of("thr429_db")
    b.createNamespace(ns, Map.empty, CreateMode.Create)
    try {
      injectCode = 429; injectType = "" // non-Glue body
      injectRemaining = 2
      assert(b.namespaceExists(ns), "429s must be retried like throttling")
    } finally { injectRemaining = 0; injectCode = 400; b.dropNamespace(ns, DropMode.Fail) }
  }

  test("error taxonomy conformance (GlueToLanceErrorConverter.java:26-57)") {
    val b = newBackend()
    val ns = ObjectIdentifier.of("tax_db")
    b.createNamespace(ns, Map.empty, CreateMode.Create)
    b.declareTable(ns.child("t"), None, Map.empty, None)
    try {
      // EntityNotFound -> the not-found pair (codes 1/3)
      intercept[GraftError.NamespaceNotFound](
        b.describeNamespace(ObjectIdentifier.of("ghost")))
      intercept[GraftError.TableNotFound](b.describeTable(ns.child("ghost")))
      // AlreadyExists -> the conflict pair (codes 2/4)
      intercept[GraftError.NamespaceAlreadyExists](
        b.createNamespace(ns, Map.empty, CreateMode.Create))
      intercept[GraftError.TableAlreadyExists](
        b.declareTable(ns.child("t"), None, Map.empty, None))
      // InvalidInput/Validation -> code 5 (caller error, not retried)
      injectCode = 400; injectType = "InvalidInputException"; injectRemaining = 1
      val before = requestCount
      intercept[GraftError.InvalidInput](b.describeNamespace(ns))
      assert(requestCount - before == 1, "caller errors must not retry")
      injectType = "ValidationException"; injectRemaining = 1
      intercept[GraftError.InvalidInput](b.describeNamespace(ns))
      // AccessDenied (any other 4xx type) -> code 17, fail-fast
      injectType = "AccessDeniedException"; injectRemaining = 1
      val before2 = requestCount
      intercept[GraftError.ServiceUnavailable](b.describeNamespace(ns))
      assert(requestCount - before2 == 1, "access denial must not retry")
      // 5xx InternalServiceException -> retried, then code 17
      injectCode = 500; injectType = "InternalServiceException"
      injectRemaining = 10
      val before3 = requestCount
      intercept[GraftError.ServiceUnavailable](b.describeNamespace(ns))
      assert(requestCount - before3 == 4, "3 retries + the first attempt")
    } finally {
      injectRemaining = 0; injectCode = 400; injectType = ""
      b.dropTable(ns.child("t"), purge = false)
      b.dropNamespace(ns, DropMode.Fail)
    }
  }

  test("end-to-end Spark SQL through the glue catalog") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val wh = java.nio.file.Files.createTempDirectory("glue-wh").toString
      graft.Graft.registerCatalog(spark, "glue_cat", "glue", Map(
        "endpoint" -> s"http://127.0.0.1:$port",
        "region" -> "us-east-1",
        "access_key_id" -> "AKIATEST",
        "secret_access_key" -> "testsecret",
        "root" -> wh,
        "retry_base_delay_ms" -> "10"))
      spark.sql("CREATE NAMESPACE glue_cat.sqldb")
      spark.sql("CREATE TABLE glue_cat.sqldb.t (id BIGINT, v STRING)")
      assert(spark.table("glue_cat.sqldb.t").count() == 0)
      spark.sql("INSERT INTO glue_cat.sqldb.t VALUES (1,'a'),(2,'b')")
      assert(spark.sql("SELECT sum(id) FROM glue_cat.sqldb.t").head().getLong(0) == 3L)
      spark.sql("DROP TABLE glue_cat.sqldb.t")
      spark.sql("DROP NAMESPACE glue_cat.sqldb")
    } finally spark.stop()
  }
}
