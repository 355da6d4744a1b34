package graft.hive

import java.io.File
import java.nio.file.Files
import java.util.concurrent.Executors

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.{HiveMetaStore, RetryingHMSHandler, TSetIpAddressProcessor}
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.server.{TServer, TThreadPoolServer}
import org.apache.thrift.transport.{TServerSocket, TTransportFactory}

/** In-process Hive 2.x metastore for tests: a real thrift server over a
  * Derby-backed `HMSHandler` on a random localhost port — the no-Docker
  * embedded-metastore pattern the reference proves out in its own suite
  * (`hive2/LocalHive2Metastore.java:42-260`). Everything the live
  * [[graft.backend.hive.Hive2Backend]] talks to is the real metastore
  * code path: thrift wire, retrying handler, DataNucleus over Derby.
  *
  * One instance per JVM (Derby allows a single embedded boot per
  * directory, and HMS keeps static state); the suite object below owns
  * the lifecycle.
  */
class LocalHiveMetastore {
  private var server: TServer = _
  private var baseHandler: HiveMetaStore.HMSHandler = _
  private var serverConf: HiveConf = _
  // all server threads are daemons: an embedded metastore must never pin
  // a host JVM (the gate mains exit after their run; specs hold the
  // singleton for the JVM's life either way)
  private val executor = Executors.newSingleThreadExecutor(
    LocalHiveMetastore.daemonFactory("graft-hms-serve"))
  var hiveConf: HiveConf = _
  var warehouseDir: String = _
  var port: Int = _

  def start(): Unit = {
    val localDir = Files.createTempDirectory("graft-hms").toFile
    val derbyPath = new File(localDir, "metastore_db").getPath
    System.setProperty("derby.stream.error.file",
      new File(localDir, "derby.log").getAbsolutePath)
    warehouseDir = s"file:${localDir.getAbsolutePath}/warehouse"

    val socket = new TServerSocket(0)
    port = socket.getServerSocket.getLocalPort

    val conf = new HiveConf(classOf[LocalHiveMetastore])
    conf.set("hive.metastore.uris", s"thrift://localhost:$port")
    conf.set("hive.metastore.warehouse.dir", warehouseDir)
    conf.set("hive.metastore.try.direct.sql", "false")
    conf.set("hive.metastore.disallow.incompatible.col.type.changes", "false")
    conf.set("hive.metastore.schema.verification", "false")
    conf.set("datanucleus.schema.autoCreateAll", "true")
    conf.set("datanucleus.autoCreateSchema", "true")
    conf.set("datanucleus.connectionPoolingType", "DBCP")
    conf.set("javax.jdo.option.ConnectionURL", s"jdbc:derby:$derbyPath;create=true")
    hiveConf = conf

    serverConf = new HiveConf(conf)
    baseHandler = new HiveMetaStore.HMSHandler("graft embedded metastore", serverConf)
    val handler = RetryingHMSHandler.getProxy(serverConf, baseHandler, false)
    val args = new TThreadPoolServer.Args(socket)
      .processor(new TSetIpAddressProcessor(handler))
      .transportFactory(new TTransportFactory())
      .protocolFactory(new TBinaryProtocol.Factory())
      .executorService(new java.util.concurrent.ThreadPoolExecutor(
        2, 5, 60L, java.util.concurrent.TimeUnit.SECONDS,
        new java.util.concurrent.SynchronousQueue[Runnable](),
        LocalHiveMetastore.daemonFactory("graft-hms-worker")))
    server = new TThreadPoolServer(args)
    executor.submit(new Runnable { override def run(): Unit = server.serve() })
  }

  def stop(): Unit = {
    if (server != null) server.stop()
    executor.shutdown()
    if (baseHandler != null) baseHandler.shutdown()
  }

  /** The raw Derby-backed handler — lets protocol-level test fronts make
    * in-process metadata peeks (e.g. catalog-emptiness checks) without a
    * second client connection. */
  def rawHandler: HiveMetaStore.HMSHandler = baseHandler

  /** A fresh thrift processor over the SAME handler, so a test can boot
    * a second server front (e.g. the Hive 3 catalog front) on another
    * port sharing this Derby store. */
  def newProcessor(): org.apache.thrift.TProcessor =
    new TSetIpAddressProcessor(RetryingHMSHandler.getProxy(serverConf, baseHandler, false))
}

/** JVM-singleton metastore shared by hive suites (Derby single-boot). */
object LocalHiveMetastore {

  /** Daemon thread factory shared by the embedded server fronts. */
  private[hive] def daemonFactory(name: String): java.util.concurrent.ThreadFactory =
    (r: Runnable) => { val t = new Thread(r, name); t.setDaemon(true); t }

  lazy val instance: LocalHiveMetastore = {
    val m = new LocalHiveMetastore
    m.start()
    Runtime.getRuntime.addShutdownHook(new Thread(() => m.stop()))
    m
  }
}
