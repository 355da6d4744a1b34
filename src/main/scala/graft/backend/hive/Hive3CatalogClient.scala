package graft.backend.hive

import org.apache.thrift.TApplicationException
import org.apache.thrift.protocol.{TBinaryProtocol, TField, TMessage, TMessageType, TProtocol, TProtocolUtil, TStruct, TType}
import org.apache.thrift.transport.TSocket

import graft.core.{GraftError, ObjectIdentifier}

/** Catalog object of the Hive 3+ metastore (public IDL
  * `hive_metastore.thrift`, HIVE-18685): name, optional description,
  * location URI. */
final case class HmsCatalog(
    name: String, description: Option[String], locationUri: String)

/** The connected metastore predates catalogs (HMS < 3.0): it answers the
  * catalog RPCs with thrift UNKNOWN_METHOD. Callers decide whether that
  * means "default catalog only" (listing) or a hard error (mutation). */
final case class CatalogsUnsupported(detail: String)
    extends RuntimeException(detail)

/** Hand-rolled thrift client for the Hive 3 catalog-scoped metastore
  * calls: `get_catalogs`, `get_catalog`, `create_catalog`,
  * `drop_catalog` (the operations `Hive3Namespace.java:389-469,681-714`
  * performs through the Hive 3 client jar).
  *
  * This build carries only the Hive 2.3 client jars, whose generated
  * `ThriftHiveMetastore` predates HIVE-18685 and cannot frame these four
  * messages — but the wire protocol is public (Hive 3
  * `hive_metastore.thrift`) and the transport is plain unframed
  * TBinaryProtocol, so the messages are written field-by-field over a
  * dedicated socket to the same metastore the pooled 2.3 clients talk
  * to. One connection, synchronized — catalog operations are rare
  * control-plane calls, never data-plane.
  *
  * Wire shapes (field ids from the public IDL):
  *  - `Catalog {1: name, 2: optional description, 3: locationUri}`
  *  - `get_catalogs() -> GetCatalogsResponse {1: list<string>}` throws
  *    `(1: MetaException)`
  *  - `get_catalog(GetCatalogRequest {1: name}) -> GetCatalogResponse
  *    {1: Catalog}` throws `(1: NoSuchObjectException, 2: MetaException)`
  *  - `create_catalog(CreateCatalogRequest {1: Catalog})` throws
  *    `(1: AlreadyExists, 2: InvalidObject, 3: MetaException)`
  *  - `drop_catalog(DropCatalogRequest {1: name})` throws
  *    `(1: NoSuchObject, 2: InvalidOperation, 3: MetaException)`
  * Every metastore exception struct carries `1: string message`.
  */
final class Hive3CatalogClient(host: String, port: Int, timeoutMs: Int)
    extends AutoCloseable {

  private var transport: TSocket = _
  private var prot: TProtocol = _
  private var seqId = 0

  private def ensureOpen(): Unit =
    if (transport == null || !transport.isOpen) {
      transport = new TSocket(host, port, timeoutMs)
      transport.open()
      prot = new TBinaryProtocol(transport)
    }

  override def close(): Unit = synchronized {
    if (transport != null) { transport.close(); transport = null; prot = null }
  }

  // ---- public surface -------------------------------------------------

  /** Sorted catalog names ([[CatalogsUnsupported]] on pre-3.0 servers). */
  def getCatalogs(): Seq[String] =
    roundTrip("get_catalogs", idempotent = true)(_ => ()) { p =>
      val (names, err) = readResult(p) { q =>
        // GetCatalogsResponse {1: list<string> names}
        var out = Seq.empty[String]
        readStruct(q) { (f, r) =>
          if (f.id == 1 && f.`type` == TType.LIST) {
            val l = r.readListBegin()
            out = (0 until l.size).map(_ => r.readString())
            r.readListEnd()
          } else TProtocolUtil.skip(r, f.`type`)
        }
        out
      }
      err.foreach { case (_, m) => throw serviceErr("get_catalogs", m) }
      names.getOrElse(Nil).sorted
    }

  /** The catalog, or None when it does not exist. */
  def getCatalog(name: String): Option[HmsCatalog] =
    roundTrip("get_catalog", idempotent = true) { p =>
      writeStructField(p, 1) { q =>
        q.writeFieldBegin(new TField("name", TType.STRING, 1))
        q.writeString(name); q.writeFieldEnd()
      }
    } { p =>
      val (cat, err) = readResult(p) { q =>
        // GetCatalogResponse {1: Catalog}
        var out: Option[HmsCatalog] = None
        readStruct(q) { (f, r) =>
          if (f.id == 1 && f.`type` == TType.STRUCT) out = Some(readCatalog(r))
          else TProtocolUtil.skip(r, f.`type`)
        }
        out
      }
      err match {
        case Some((1, _)) => None // NoSuchObjectException
        case Some((_, m)) => throw serviceErr("get_catalog", m)
        case None => cat.flatten
      }
    }

  /** Create a catalog (`Hive3Namespace.createCatalog:431-469` semantics
    * live in the backend; this is the bare RPC). */
  def createCatalog(cat: HmsCatalog): Unit =
    roundTrip("create_catalog") { p =>
      writeStructField(p, 1) { q =>
        q.writeFieldBegin(new TField("catalog", TType.STRUCT, 1))
        writeCatalog(q, cat); q.writeFieldEnd()
      }
    } { p =>
      val (_, err) = readResult(p)(q => TProtocolUtil.skip(q, TType.STRUCT))
      err.foreach {
        case (1, _) =>
          throw GraftError.NamespaceAlreadyExists(ObjectIdentifier.of(cat.name))
        case (2, m) => throw GraftError.InvalidInput(s"create_catalog: $m")
        case (_, m) => throw serviceErr("create_catalog", m)
      }
    }

  /** Drop a catalog; the server refuses non-empty ones. */
  def dropCatalog(name: String): Unit =
    roundTrip("drop_catalog") { p =>
      writeStructField(p, 1) { q =>
        q.writeFieldBegin(new TField("name", TType.STRING, 1))
        q.writeString(name); q.writeFieldEnd()
      }
    } { p =>
      val (_, err) = readResult(p)(q => TProtocolUtil.skip(q, TType.STRUCT))
      err.foreach {
        case (1, _) =>
          throw GraftError.NamespaceNotFound(ObjectIdentifier.of(name))
        case (2, m) => throw GraftError.InvalidInput(s"drop_catalog: $m")
        case (_, m) => throw serviceErr("drop_catalog", m)
      }
    }

  // ---- framing --------------------------------------------------------

  private def serviceErr(op: String, m: String): GraftError =
    GraftError.ServiceUnavailable(s"$op failed: $m")

  /** One request/response exchange. Any transport-level failure closes
    * the socket (next call reconnects) and surfaces as code-17 — except
    * that IDEMPOTENT reads transparently reconnect-and-retry once, so a
    * long-idle connection reaped by a firewall/LB does not fail the next
    * `get_catalogs`/`get_catalog`. Mutations never auto-retry: a
    * create/drop whose reply was lost may already have been applied, and
    * replaying it would mask the real outcome. */
  private def roundTrip[R](method: String, idempotent: Boolean = false)(
      writeArgs: TProtocol => Unit)(readReply: TProtocol => R): R = synchronized {
    try once(method)(writeArgs)(readReply)
    catch {
      // only transport failures carry a cause; server-answered errors
      // (MetaException et al.) came over a healthy socket — no retry
      case GraftError.ServiceUnavailable(_, cause) if idempotent && cause != null =>
        once(method)(writeArgs)(readReply) // fresh socket via ensureOpen
    }
  }

  private def once[R](method: String)(writeArgs: TProtocol => Unit)(
      readReply: TProtocol => R): R = {
    try {
      ensureOpen()
      seqId += 1
      prot.writeMessageBegin(new TMessage(method, TMessageType.CALL, seqId))
      prot.writeStructBegin(new TStruct(method + "_args"))
      writeArgs(prot)
      prot.writeFieldStop()
      prot.writeStructEnd()
      prot.writeMessageEnd()
      prot.getTransport.flush()
      val msg = prot.readMessageBegin()
      // A reply that does not echo the call's sequence id is a stale or
      // duplicate frame from a previous exchange on this reused socket
      // (e.g. a server that wrote a late second reply after a timeout).
      // Parsing it as the current result would return the wrong call's
      // data, so it is a transport failure: close + code-17, never parsed.
      if (msg.seqid != seqId)
        throw new org.apache.thrift.TException(
          s"out-of-sequence reply: expected seqid $seqId, got ${msg.seqid}")
      val out =
        if (msg.`type` == TMessageType.EXCEPTION) {
          val ex = TApplicationException.readFrom(prot)
          if (ex.getType == TApplicationException.UNKNOWN_METHOD ||
              ex.getType == TApplicationException.WRONG_METHOD_NAME)
            throw CatalogsUnsupported(
              s"$method: metastore predates catalogs (HMS < 3.0): ${ex.getMessage}")
          throw serviceErr(method, ex.getMessage)
        } else readReply(prot)
      prot.readMessageEnd()
      out
    } catch {
      case e: GraftError => throw e
      case e: CatalogsUnsupported => prot.readMessageEnd(); throw e
      case e: org.apache.thrift.TException =>
        close()
        throw GraftError.ServiceUnavailable(s"$method failed: ${e.getMessage}", e)
    }
  }

  /** Write one STRUCT-typed argument field at `id` whose body is produced
    * by `body` (the body writes its own fields; stop/end added here). */
  private def writeStructField(p: TProtocol, id: Short)(
      body: TProtocol => Unit): Unit = {
    p.writeFieldBegin(new TField("request", TType.STRUCT, id))
    p.writeStructBegin(new TStruct(""))
    body(p)
    p.writeFieldStop()
    p.writeStructEnd()
    p.writeFieldEnd()
  }

  /** Iterate a struct's fields until STOP. */
  private def readStruct(p: TProtocol)(
      onField: (TField, TProtocol) => Unit): Unit = {
    p.readStructBegin()
    var done = false
    while (!done) {
      val f = p.readFieldBegin()
      if (f.`type` == TType.STOP) done = true
      else { onField(f, p); p.readFieldEnd() }
    }
    p.readStructEnd()
  }

  /** Read a thrift method-result struct: field 0 is success (parsed by
    * `readSuccess`), any other field is a declared exception struct whose
    * `1: string message` is extracted. Returns (success, firstError). */
  private def readResult[R](p: TProtocol)(
      readSuccess: TProtocol => R): (Option[R], Option[(Short, String)]) = {
    var success: Option[R] = None
    var err: Option[(Short, String)] = None
    readStruct(p) { (f, r) =>
      if (f.id == 0) success = Some(readSuccess(r))
      else if (f.`type` == TType.STRUCT) {
        var m = ""
        readStruct(r) { (g, s) =>
          if (g.id == 1 && g.`type` == TType.STRING) m = s.readString()
          else TProtocolUtil.skip(s, g.`type`)
        }
        if (err.isEmpty) err = Some((f.id, m))
      } else TProtocolUtil.skip(r, f.`type`)
    }
    (success, err)
  }

  private def writeCatalog(p: TProtocol, c: HmsCatalog): Unit = {
    p.writeStructBegin(new TStruct("Catalog"))
    p.writeFieldBegin(new TField("name", TType.STRING, 1))
    p.writeString(c.name); p.writeFieldEnd()
    c.description.foreach { d =>
      p.writeFieldBegin(new TField("description", TType.STRING, 2))
      p.writeString(d); p.writeFieldEnd()
    }
    p.writeFieldBegin(new TField("locationUri", TType.STRING, 3))
    p.writeString(c.locationUri); p.writeFieldEnd()
    p.writeFieldStop()
    p.writeStructEnd()
  }

  private def readCatalog(p: TProtocol): HmsCatalog = {
    var name = ""; var desc: Option[String] = None; var loc = ""
    readStruct(p) { (f, r) =>
      (f.id, f.`type`) match {
        case (1, TType.STRING) => name = r.readString()
        case (2, TType.STRING) => desc = Some(r.readString())
        case (3, TType.STRING) => loc = r.readString()
        case _ => TProtocolUtil.skip(r, f.`type`)
      }
    }
    HmsCatalog(name, desc, loc)
  }
}
