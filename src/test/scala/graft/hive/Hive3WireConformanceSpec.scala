package graft.hive

import java.io.ByteArrayOutputStream
import java.net.ServerSocket

import org.apache.thrift.protocol.{TBinaryProtocol, TProtocolUtil, TType}
import org.apache.thrift.transport.TIOStreamTransport
import org.scalatest.funsuite.AnyFunSuite

import graft.backend.hive.{CatalogsUnsupported, Hive3CatalogClient, HmsCatalog}
import graft.core.GraftError

/** Byte-level conformance for the hand-framed Hive 3 catalog RPCs.
  *
  * The end-to-end hive3 suites validate behavior against
  * [[LocalHive3Metastore]], a builder-written front — circular as a WIRE
  * check, since front and client could share one wrong idea of the
  * protocol. This spec breaks the circle with the two independent
  * artifacts available offline (the genuine Hive 3 generated stubs ship
  * in no jar in this sandbox — hive jars are 2.3.10):
  *
  *  1. GOLDEN FRAMES: every byte the client must emit is written out
  *     literally below, hand-derived from the published thrift binary
  *     protocol spec (strict header `0x8001` version word, big-endian
  *     i16 field ids, type bytes STRING=0x0B STRUCT=0x0C LIST=0x0F,
  *     field-STOP=0x00) and the public Hive 3 `hive_metastore.thrift`
  *     declarations (HIVE-18685): `GetCatalogRequest {1: name}`,
  *     `CreateCatalogRequest {1: Catalog}`, `DropCatalogRequest
  *     {1: name}`, `Catalog {1: name, 2: optional description,
  *     3: locationUri}`. Requests are compared byte-for-byte — exactly
  *     what a generated `ThriftHiveMetastore$Client` would put on the
  *     wire, since generated code writes fields in declaration order
  *     with these same ids.
  *  2. APACHE'S DECODER: the test server bounds each captured request by
  *     parsing it with libthrift's own `TBinaryProtocol` reader — an
  *     implementation of the protocol the builder did not write — so a
  *     frame the real library cannot parse fails before any comparison.
  *
  * Replies are likewise canned golden bytes, pinning the client's READ
  * side (success structs, declared-exception structs, TApplicationException,
  * stale sequence ids) to the same public layout. */
class Hive3WireConformanceSpec extends AnyFunSuite {

  /** Raw big-endian packing only — every type byte, field id, and layout
    * decision is written literally at the call sites. */
  private final class Frame {
    private val out = new ByteArrayOutputStream()
    def raw(bs: Int*): Frame = { bs.foreach(b => out.write(b & 0xff)); this }
    def i16(v: Int): Frame = raw((v >> 8) & 0xff, v & 0xff)
    def i32(v: Int): Frame =
      raw((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
    def str(s: String): Frame = {
      val b = s.getBytes("UTF-8"); i32(b.length); out.write(b, 0, b.length); this
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def hex(bs: Array[Byte]): String =
    bs.map(b => f"$b%02x").grouped(16).map(_.mkString(" ")).mkString("\n")

  /** Records every byte a FilterInputStream client reads. */
  private final class Recording(in: java.io.InputStream)
      extends java.io.FilterInputStream(in) {
    private val buf = new ByteArrayOutputStream()
    override def read(): Int = { val b = super.read(); if (b >= 0) buf.write(b); b }
    override def read(a: Array[Byte], off: Int, len: Int): Int = {
      val n = super.read(a, off, len); if (n > 0) buf.write(a, off, n); n
    }
    def bytes: Array[Byte] = buf.toByteArray
  }

  /** One-shot server on a real socket: accepts one connection, bounds and
    * records the request frame via libthrift's generic reader, writes the
    * canned reply, then lingers until the client closes. Returns the
    * exact request bytes and the client-side outcome. */
  private def exchange[R](replyBytes: Array[Byte])(
      call: Hive3CatalogClient => R): (Array[Byte], Either[Throwable, R]) = {
    val server = new ServerSocket(0)
    val recorded = new java.util.concurrent.atomic.AtomicReference[Array[Byte]]
    val t = new Thread(() => {
      val s = server.accept()
      try {
        val rec = new Recording(s.getInputStream)
        val in = new TBinaryProtocol(new TIOStreamTransport(rec))
        in.readMessageBegin()
        TProtocolUtil.skip(in, TType.STRUCT)
        in.readMessageEnd()
        recorded.set(rec.bytes)
        s.getOutputStream.write(replyBytes)
        s.getOutputStream.flush()
        s.getInputStream.read() // -1 once the client hangs up
      } catch { case _: Throwable => () } finally s.close()
    }, "graft-wire-oneshot")
    t.setDaemon(true); t.start()
    val c = new Hive3CatalogClient("localhost", server.getLocalPort, 5000)
    val result = try Right(call(c)) catch { case e: Throwable => Left(e) }
    c.close()
    t.join(5000)
    server.close()
    (recorded.get(), result)
  }

  private def assertFrame(actual: Array[Byte], golden: Array[Byte]): Unit =
    assert(actual != null && actual.sameElements(golden),
      s"\nwire frame mismatch\nactual:\n${hex(Option(actual).getOrElse(Array.empty))}\ngolden:\n${hex(golden)}")

  // Every exchange uses a fresh client, so the message sequence id is
  // deterministically 1 — the first call on the connection.

  test("get_catalogs: request frame and list-response decode") {
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01) // strict-binary version word | CALL(1)
      .str("get_catalogs")         // method name
      .i32(1)                      // seqid
      .raw(0x00)                   // get_catalogs_args {}: field-STOP only
      .bytes
    val reply = new Frame()
      .raw(0x80, 0x01, 0x00, 0x02) // strict-binary version word | REPLY(2)
      .str("get_catalogs").i32(1)
      .raw(0x0C).i16(0)            // result field 0 (success): STRUCT GetCatalogsResponse
      .raw(0x0F).i16(1)            // GetCatalogsResponse field 1: LIST names
      .raw(0x0B).i32(2)            // element type STRING, 2 elements
      .str("hive").str("ab")       // deliberately unsorted
      .raw(0x00)                   // GetCatalogsResponse field-STOP
      .raw(0x00)                   // result field-STOP
      .bytes
    val (req, res) = exchange(reply)(_.getCatalogs())
    assertFrame(req, golden)
    assert(res == Right(Seq("ab", "hive")), "client sorts the returned names")
  }

  test("get_catalog: request frame and Catalog decode (optional description absent)") {
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01)
      .str("get_catalog").i32(1)
      .raw(0x0C).i16(1)            // args field 1: STRUCT GetCatalogRequest
      .raw(0x0B).i16(1).str("c1")  // GetCatalogRequest.name (field 1, STRING)
      .raw(0x00)                   // GetCatalogRequest field-STOP
      .raw(0x00)                   // args field-STOP
      .bytes
    val reply = new Frame()
      .raw(0x80, 0x01, 0x00, 0x02)
      .str("get_catalog").i32(1)
      .raw(0x0C).i16(0)            // success: STRUCT GetCatalogResponse
      .raw(0x0C).i16(1)            // GetCatalogResponse field 1: STRUCT Catalog
      .raw(0x0B).i16(1).str("c1")  // Catalog.name
      .raw(0x0B).i16(3).str("file:/w/c1") // Catalog.locationUri (desc omitted)
      .raw(0x00)                   // Catalog field-STOP
      .raw(0x00)                   // GetCatalogResponse field-STOP
      .raw(0x00)                   // result field-STOP
      .bytes
    val (req, res) = exchange(reply)(_.getCatalog("c1"))
    assertFrame(req, golden)
    assert(res == Right(Some(HmsCatalog("c1", None, "file:/w/c1"))))
  }

  test("create_catalog: nested Catalog struct frame and void-success decode") {
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01)
      .str("create_catalog").i32(1)
      .raw(0x0C).i16(1)            // args field 1: STRUCT CreateCatalogRequest
      .raw(0x0C).i16(1)            // CreateCatalogRequest field 1: STRUCT Catalog
      .raw(0x0B).i16(1).str("c2")  // Catalog.name
      .raw(0x0B).i16(2).str("second") // Catalog.description (optional, set)
      .raw(0x0B).i16(3).str("file:/w/c2") // Catalog.locationUri
      .raw(0x00)                   // Catalog field-STOP
      .raw(0x00)                   // CreateCatalogRequest field-STOP
      .raw(0x00)                   // args field-STOP
      .bytes
    val reply = new Frame()
      .raw(0x80, 0x01, 0x00, 0x02)
      .str("create_catalog").i32(1)
      .raw(0x00)                   // void result: field-STOP only
      .bytes
    val (req, res) =
      exchange(reply)(_.createCatalog(HmsCatalog("c2", Some("second"), "file:/w/c2")))
    assertFrame(req, golden)
    assert(res == Right(()))
  }

  test("drop_catalog: request frame and void-success decode") {
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01)
      .str("drop_catalog").i32(1)
      .raw(0x0C).i16(1)            // args field 1: STRUCT DropCatalogRequest
      .raw(0x0B).i16(1).str("c2")  // DropCatalogRequest.name
      .raw(0x00).raw(0x00)
      .bytes
    val reply = new Frame()
      .raw(0x80, 0x01, 0x00, 0x02)
      .str("drop_catalog").i32(1)
      .raw(0x00)
      .bytes
    val (req, res) = exchange(reply)(_.dropCatalog("c2"))
    assertFrame(req, golden)
    assert(res == Right(()))
  }

  test("declared-exception reply: AlreadyExistsException at result field 1") {
    // create_catalog throws (1: AlreadyExistsException, 2: InvalidObjectException,
    // 3: MetaException); every metastore exception carries {1: string message}
    val reply = new Frame()
      .raw(0x80, 0x01, 0x00, 0x02)
      .str("create_catalog").i32(1)
      .raw(0x0C).i16(1)            // result field 1: AlreadyExistsException
      .raw(0x0B).i16(1).str("catalog c2 already exists")
      .raw(0x00).raw(0x00)
      .bytes
    val (_, res) =
      exchange(reply)(_.createCatalog(HmsCatalog("c2", None, "file:/w/c2")))
    res match {
      case Left(GraftError.NamespaceAlreadyExists(id)) =>
        assert(id.levels == Seq("c2"))
      case other => fail(s"expected NamespaceAlreadyExists, got $other")
    }
  }

  test("TApplicationException UNKNOWN_METHOD maps to CatalogsUnsupported") {
    // pre-3.0 server: EXCEPTION(3) message carrying TApplicationException
    // {1: string message, 2: i32 type} with type UNKNOWN_METHOD=1
    val reply = new Frame()
      .raw(0x80, 0x01, 0x00, 0x03) // strict-binary version word | EXCEPTION(3)
      .str("get_catalogs").i32(1)
      .raw(0x0B).i16(1).str("Invalid method name: 'get_catalogs'")
      .raw(0x08).i16(2).i32(1)     // type (I32=0x08): UNKNOWN_METHOD
      .raw(0x00)
      .bytes
    val (_, res) = exchange(reply)(_.getCatalogs())
    res match {
      case Left(CatalogsUnsupported(msg)) => assert(msg.contains("get_catalogs"))
      case other => fail(s"expected CatalogsUnsupported, got $other")
    }
  }

  test("reply with a stale sequence id is a transport failure, never parsed") {
    // a late duplicate from a previous exchange: REPLY seqid 7 against call 1
    val reply = new Frame()
      .raw(0x80, 0x01, 0x00, 0x02)
      .str("drop_catalog").i32(7)
      .raw(0x00)
      .bytes
    val (_, res) = exchange(reply)(_.dropCatalog("c9"))
    res match {
      case Left(GraftError.ServiceUnavailable(detail, _)) =>
        assert(detail.contains("out-of-sequence"))
      case other => fail(s"expected code-17 on seqid mismatch, got $other")
    }
  }
}
