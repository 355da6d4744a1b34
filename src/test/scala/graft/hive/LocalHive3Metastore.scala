package graft.hive

import java.util.concurrent.Executors

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.thrift.TProcessor
import org.apache.thrift.protocol.{TBinaryProtocol, TField, TList, TMessage, TMessageType, TProtocol, TProtocolDecorator, TProtocolUtil, TStruct, TType}
import org.apache.thrift.server.{TServer, TThreadPoolServer}
import org.apache.thrift.transport.{TServerSocket, TTransportFactory}

/** Catalog-aware Hive 3-STYLE thrift front over the embedded 2.3
  * metastore, for end-to-end Hive3Backend tests (the embedded server
  * itself predates HIVE-18685 and cannot speak catalogs):
  *
  *  - the Hive 3 catalog RPCs (`get_catalogs` / `get_catalog` /
  *    `create_catalog` / `drop_catalog`) are answered from an in-memory
  *    catalog registry seeded with the default `hive` catalog;
  *  - the HMS 3.x catalog-prefixed database encoding (`@cat#db`, the
  *    `parseDbName` compat path the live backend emits) is resolved by
  *    rewriting names into a mangled flat namespace
  *    (`zc3_<cat>__<db>`) on the INBOUND protocol, then delegating the
  *    message to the real Derby-backed handler — real wire, real
  *    metastore code path for every db/table operation;
  *  - `get_all_databases` / `get_databases` are answered here so that
  *    default-catalog listings exclude the mangled names and
  *    `@cat#*` patterns list exactly one catalog's databases, matching
  *    HMS 3.x semantics.
  *
  * Everything a Hive 3 server would persist for db/table ops lands in
  * the same Derby store the hive2 suites use; only the catalog registry
  * is front-local.
  */
class LocalHive3Metastore(base: LocalHiveMetastore) {
  import LocalHive3Metastore._

  private var server: TServer = _
  private val executor = Executors.newSingleThreadExecutor(
    LocalHiveMetastore.daemonFactory("graft-hms3-serve"))
  var port: Int = _

  def start(): Unit = {
    val socket = new TServerSocket(0)
    port = socket.getServerSocket.getLocalPort
    val processor = new Hive3FrontProcessor(
      base.newProcessor(),
      () => base.rawHandler.get_all_databases().asScala.toSeq,
      base.warehouseDir)
    val args = new TThreadPoolServer.Args(socket)
      .processor(processor)
      .transportFactory(new TTransportFactory())
      .protocolFactory(new TBinaryProtocol.Factory())
      .executorService(new java.util.concurrent.ThreadPoolExecutor(
        2, 5, 60L, java.util.concurrent.TimeUnit.SECONDS,
        new java.util.concurrent.SynchronousQueue[Runnable](),
        LocalHiveMetastore.daemonFactory("graft-hms3-worker")))
    server = new TThreadPoolServer(args)
    executor.submit(new Runnable { override def run(): Unit = server.serve() })
  }

  def stop(): Unit = {
    if (server != null) server.stop()
    executor.shutdown()
  }
}

object LocalHive3Metastore {

  /** JVM-singleton front over the shared embedded metastore. */
  lazy val instance: LocalHive3Metastore = {
    val m = new LocalHive3Metastore(LocalHiveMetastore.instance)
    m.start()
    Runtime.getRuntime.addShutdownHook(new Thread(() => m.stop()))
    m
  }

  private val Encoded = "^@([A-Za-z0-9_]+)#(.*)$".r

  private[hive] def manglePrefix(cat: String): String = s"zc3_${cat}__"

  /** `@cat#db` → `zc3_cat__db` (valid HMS 2.3 database name). */
  private[hive] def mangleIfEncoded(s: String): String = s match {
    case Encoded(cat, rest) => manglePrefix(cat) + rest
    case other => other
  }

  private[hive] def isMangled(s: String): Boolean = s.startsWith("zc3_")

  /** The exact positions where real HMS 3.x strips the `@cat#db` prefix
    * from a 2.x client's frames (the HIVE-18685 compat path:
    * `MetaStoreUtils.parseDbName` applied by `HiveMetaStore$HMSHandler`
    * to string db-name args, and to struct-carried names before the
    * `isSetCatName` default kicks in). Keys are thrift method names; each
    * value lists the field-id PATHS (root args field id, then nested
    * struct field ids) of the name positions, per the public IDL:
    * `Database.name` is field 1, `Table.dbName` is field 2.
    *
    * The front rewrites ONLY these positions. An `@cat#...`-shaped string
    * arriving anywhere else throws, so a client that starts relying on
    * parseDbName where HMS does not apply it fails the suite loudly
    * instead of being quietly accommodated. (Stricter than a real server,
    * which would pass e.g. a property VALUE of that shape through — no
    * suite data uses that shape, and the loud failure is the point.) */
  private[hive] val NameFieldPaths: Map[String, Set[List[Short]]] = Map(
    "get_database" -> Set(List(1)),
    "drop_database" -> Set(List(1)),
    // alter_database(1: dbname, 2: Database newDb) — both carry names
    "alter_database" -> Set(List(1), List(2, 1)),
    // create_database(1: Database db) — Database.name is field 1
    "create_database" -> Set(List(1, 1)),
    "get_all_tables" -> Set(List(1)),
    "get_tables" -> Set(List(1)),
    "get_tables_by_type" -> Set(List(1)),
    "get_table" -> Set(List(1)),
    "get_table_objects_by_name" -> Set(List(1)),
    "get_table_names_by_filter" -> Set(List(1)),
    // create_table(1: Table tbl) — Table.dbName is field 2
    "create_table" -> Set(List(1, 2)),
    "create_table_with_environment_context" -> Set(List(1, 2)),
    // alter_table(1: dbname, 2: tbl_name, 3: Table newTbl)
    "alter_table" -> Set(List(1), List(3, 2)),
    "alter_table_with_environment_context" -> Set(List(1), List(3, 2)),
    "drop_table" -> Set(List(1)),
    "drop_table_with_environment_context" -> Set(List(1)))

  /** Inbound decorator: replays the already-consumed message header and
    * rewrites the catalog-name encoding in EXACTLY the per-method name
    * positions of [[NameFieldPaths]], tracked by walking the generated
    * code's readStructBegin/readFieldBegin calls. */
  private final class RewritingInProtocol(in: TProtocol, stashed: TMessage)
      extends TProtocolDecorator(in) {
    private var first = true
    private val namePaths: Set[List[Short]] =
      NameFieldPaths.getOrElse(stashed.name, Set.empty)
    // root args struct is entered by the generated reader immediately
    // after the (replayed) message header; depth counts structs below it
    private var depth = -1
    private var path = List.empty[Short]

    override def readMessageBegin(): TMessage =
      if (first) { first = false; stashed } else super.readMessageBegin()
    override def readStructBegin(): TStruct = { depth += 1; super.readStructBegin() }
    override def readStructEnd(): Unit = { depth -= 1; super.readStructEnd() }
    override def readFieldBegin(): TField = {
      val f = super.readFieldBegin()
      if (f.`type` != TType.STOP) path = path.take(depth) :+ f.id
      f
    }
    override def readString(): String = {
      val s = super.readString()
      if (namePaths.contains(path.take(depth + 1))) mangleIfEncoded(s)
      else s match {
        case Encoded(_, _) => throw new IllegalStateException(
          s"encoded catalog name '$s' at unmapped position ${stashed.name}/" +
            s"${path.mkString(".")} — real HMS 3.x parseDbName does not " +
            "apply there; fix the client or extend NameFieldPaths")
        case other => other
      }
    }
  }

  private final class Hive3FrontProcessor(
      delegate: TProcessor,
      allDbs: () => Seq[String],
      defaultWarehouse: String) extends TProcessor {

    /** name → (description, locationUri); seeded default catalog. */
    private val catalogs = TrieMap[String, (Option[String], String)](
      "hive" -> (Some("default catalog"), defaultWarehouse))

    override def process(in: TProtocol, out: TProtocol): Unit = {
      val msg = in.readMessageBegin()
      msg.name match {
        case "get_catalogs" =>
          skipArgs(in)
          reply(out, msg) { p =>
            writeStructField(p, 0, "GetCatalogsResponse") { q =>
              q.writeFieldBegin(new TField("names", TType.LIST, 1))
              val names = catalogs.keys.toSeq.sorted
              q.writeListBegin(new TList(TType.STRING, names.size))
              names.foreach(q.writeString)
              q.writeListEnd()
              q.writeFieldEnd()
            }
          }

        case "get_catalog" =>
          val name = readNestedString(in)
          catalogs.get(name) match {
            case Some((desc, loc)) => reply(out, msg) { p =>
              writeStructField(p, 0, "GetCatalogResponse") { q =>
                q.writeFieldBegin(new TField("catalog", TType.STRUCT, 1))
                writeCatalog(q, name, desc, loc)
                q.writeFieldEnd()
              }
            }
            case None => replyErr(out, msg, 1, s"catalog $name does not exist")
          }

        case "create_catalog" =>
          val (name, desc, loc) = readCreateCatalog(in)
          if (catalogs.putIfAbsent(
              name, (desc, if (loc.isEmpty) s"$defaultWarehouse/$name" else loc))
              .isDefined)
            replyErr(out, msg, 1, s"catalog $name already exists")
          else reply(out, msg)(_ => ())

        case "drop_catalog" =>
          val name = readNestedString(in)
          if (!catalogs.contains(name))
            replyErr(out, msg, 1, s"catalog $name does not exist")
          else if (name == "hive")
            replyErr(out, msg, 2, "cannot drop the default catalog")
          else if (allDbs().exists(_.startsWith(manglePrefix(name))))
            replyErr(out, msg, 2, s"catalog $name is not empty")
          else { catalogs.remove(name); reply(out, msg)(_ => ()) }

        case "get_all_databases" =>
          // HMS 3.x: only the DEFAULT catalog's databases
          skipArgs(in)
          replyStringList(out, msg, allDbs().filterNot(isMangled).sorted)

        case "get_databases" =>
          // args {1: string pattern}; '@cat#*' lists one catalog
          val pattern = readTopLevelString(in)
          val names = mangleIfEncoded(pattern) match {
            case m if isMangled(m) =>
              val prefix = m.stripSuffix("*")
              allDbs().filter(_.startsWith(prefix))
                .map(_.substring(prefix.length)).sorted
            case _ => allDbs().filterNot(isMangled).sorted
          }
          replyStringList(out, msg, names)

        case _ =>
          delegate.process(new RewritingInProtocol(in, msg), out)
      }
    }

    // ---- wire helpers -------------------------------------------------

    private def skipArgs(in: TProtocol): Unit = {
      TProtocolUtil.skip(in, TType.STRUCT)
      in.readMessageEnd()
    }

    /** args `{1: Request {1: string}}` → the string. */
    private def readNestedString(in: TProtocol): String = {
      var v = ""
      eachField(in) { (f, p) =>
        if (f.id == 1 && f.`type` == TType.STRUCT)
          eachField(p) { (g, q) =>
            if (g.id == 1 && g.`type` == TType.STRING) v = q.readString()
            else TProtocolUtil.skip(q, g.`type`)
          }
        else TProtocolUtil.skip(p, f.`type`)
      }
      in.readMessageEnd()
      v
    }

    /** args `{1: string}` → the string. */
    private def readTopLevelString(in: TProtocol): String = {
      var v = ""
      eachField(in) { (f, p) =>
        if (f.id == 1 && f.`type` == TType.STRING) v = p.readString()
        else TProtocolUtil.skip(p, f.`type`)
      }
      in.readMessageEnd()
      v
    }

    /** args `{1: CreateCatalogRequest {1: Catalog {1,2,3}}}`. */
    private def readCreateCatalog(in: TProtocol): (String, Option[String], String) = {
      var name = ""; var desc: Option[String] = None; var loc = ""
      eachField(in) { (f, p) =>
        if (f.id == 1 && f.`type` == TType.STRUCT)
          eachField(p) { (g, q) =>
            if (g.id == 1 && g.`type` == TType.STRUCT)
              eachField(q) { (h, r) =>
                (h.id, h.`type`) match {
                  case (1, TType.STRING) => name = r.readString()
                  case (2, TType.STRING) => desc = Some(r.readString())
                  case (3, TType.STRING) => loc = r.readString()
                  case _ => TProtocolUtil.skip(r, h.`type`)
                }
              }
            else TProtocolUtil.skip(q, g.`type`)
          }
        else TProtocolUtil.skip(p, f.`type`)
      }
      in.readMessageEnd()
      (name, desc, loc)
    }

    private def eachField(p: TProtocol)(f: (TField, TProtocol) => Unit): Unit = {
      p.readStructBegin()
      var done = false
      while (!done) {
        val fld = p.readFieldBegin()
        if (fld.`type` == TType.STOP) done = true
        else { f(fld, p); p.readFieldEnd() }
      }
      p.readStructEnd()
    }

    private def reply(out: TProtocol, msg: TMessage)(
        writeFields: TProtocol => Unit): Unit = {
      out.writeMessageBegin(new TMessage(msg.name, TMessageType.REPLY, msg.seqid))
      out.writeStructBegin(new TStruct(msg.name + "_result"))
      writeFields(out)
      out.writeFieldStop()
      out.writeStructEnd()
      out.writeMessageEnd()
      out.getTransport.flush()
    }

    private def replyErr(out: TProtocol, msg: TMessage, fieldId: Short,
        message: String): Unit = reply(out, msg) { p =>
      writeStructField(p, fieldId, "MetaException") { q =>
        q.writeFieldBegin(new TField("message", TType.STRING, 1))
        q.writeString(message)
        q.writeFieldEnd()
      }
    }

    private def replyStringList(out: TProtocol, msg: TMessage,
        names: Seq[String]): Unit = reply(out, msg) { p =>
      p.writeFieldBegin(new TField("success", TType.LIST, 0))
      p.writeListBegin(new TList(TType.STRING, names.size))
      names.foreach(p.writeString)
      p.writeListEnd()
      p.writeFieldEnd()
    }

    private def writeStructField(p: TProtocol, id: Short, name: String)(
        body: TProtocol => Unit): Unit = {
      p.writeFieldBegin(new TField(name, TType.STRUCT, id))
      p.writeStructBegin(new TStruct(name))
      body(p)
      p.writeFieldStop()
      p.writeStructEnd()
      p.writeFieldEnd()
    }

    private def writeCatalog(p: TProtocol, name: String, desc: Option[String],
        loc: String): Unit = {
      p.writeStructBegin(new TStruct("Catalog"))
      p.writeFieldBegin(new TField("name", TType.STRING, 1))
      p.writeString(name); p.writeFieldEnd()
      desc.foreach { d =>
        p.writeFieldBegin(new TField("description", TType.STRING, 2))
        p.writeString(d); p.writeFieldEnd()
      }
      p.writeFieldBegin(new TField("locationUri", TType.STRING, 3))
      p.writeString(loc); p.writeFieldEnd()
      p.writeFieldStop()
      p.writeStructEnd()
    }
  }
}
