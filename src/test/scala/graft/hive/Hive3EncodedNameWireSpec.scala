package graft.hive

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.metastore.api.{Database, PrincipalType, SerDeInfo, StorageDescriptor, Table => HmsTable, ThriftHiveMetastore}
import org.apache.thrift.protocol.{TBinaryProtocol, TProtocol, TProtocolUtil, TType}
import org.apache.thrift.transport.TIOStreamTransport
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level conformance for the `@cat#db` encoded-name frames the POOLED
  * 2.x client emits for non-default Hive 3 catalogs — the struct-carried
  * RPCs (`create_database`, `create_table[_with_environment_context]`,
  * `alter_database`) plus the batched-listing string-arg RPC
  * (`get_table_objects_by_name`).
  *
  * [[Hive3WireConformanceSpec]] pins the hand-framed catalog RPCs; the
  * db/table RPCs ride Apache's generated `ThriftHiveMetastore$Client`
  * instead, so here the trust directions flip: the EMITTER is the genuine
  * generated code (driven through its public `send_*` methods into a byte
  * sink — exactly the frames `HiveMetaStoreClient` puts on a socket), and
  * what is pinned is the builder's documentation of WHERE the encoded name
  * lands, i.e. the per-RPC name-field positions that HMS 3.x's
  * `parseDbName` compat path strips (HIVE-18685; `Hive3Backend.encodeDb`
  * doc, `Hive3Backend.scala:90-112`). Three binds per frame:
  *
  *  1. GOLDEN FRAMES, byte-for-byte: the full frame hand-derived from the
  *     thrift strict-binary layout + the public 2.3 IDL field ids
  *     (`Database.name` = 1, `Table.dbName` = 2, `alter_database` args
  *     `{1: dbname, 2: Database}`), with struct content mirroring what
  *     `Hive2Backend.createNamespace`/`declareTable` actually set.
  *     Agreement means the hand-derivation (and therefore the position
  *     documentation) matches what Apache's writer really emits.
  *  2. POSITION MAP: an independent generic walk of the frame with
  *     libthrift's `TBinaryProtocol` reader collects every STRING field by
  *     its field-id path; the encoded name must appear at EXACTLY the
  *     paths [[LocalHive3Metastore.NameFieldPaths]] documents for that
  *     method — the same executable map the test front rewrites by — and
  *     NOWHERE else in the frame.
  *  3. NAME-FIELD BYTES: the wire encoding of the name field itself
  *     (type byte 0x0B, big-endian i16 field id, i32 length, UTF-8 bytes)
  *     is asserted as a contiguous byte run, pinning the exact bytes a
  *     real HMS 3.x handler's `parseDbName` sees at that position.
  */
class Hive3EncodedNameWireSpec extends AnyFunSuite {

  private val Enc = "@c1#db1"

  /** Raw big-endian packing; layout decisions literal at call sites. */
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

  /** Drive the generated client's send_* into a byte sink — the exact
    * frame `HiveMetaStoreClient` writes to its socket transport. */
  private def capture(call: ThriftHiveMetastore.Client => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val proto = new TBinaryProtocol(new TIOStreamTransport(out))
    call(new ThriftHiveMetastore.Client(proto))
    out.toByteArray
  }

  /** Generic STRING-by-field-id-path walk with libthrift's own reader
    * (strings inside LIST/MAP elements are recorded under the container
    * field's path — no name position lives in a container). */
  private def stringFields(frame: Array[Byte]): (String, Seq[(List[Short], String)]) = {
    val p = new TBinaryProtocol(
      new TIOStreamTransport(new java.io.ByteArrayInputStream(frame)))
    val acc = ListBuffer.empty[(List[Short], String)]
    def walkStruct(path: List[Short]): Unit = {
      p.readStructBegin()
      var done = false
      while (!done) {
        val f = p.readFieldBegin()
        if (f.`type` == TType.STOP) done = true
        else { walkValue(f.`type`, path :+ f.id); p.readFieldEnd() }
      }
      p.readStructEnd()
    }
    def walkValue(t: Byte, path: List[Short]): Unit = t match {
      case TType.STRING => acc += path -> p.readString()
      case TType.STRUCT => walkStruct(path)
      case TType.LIST =>
        val l = p.readListBegin()
        (0 until l.size).foreach(_ => walkValue(l.elemType, path))
        p.readListEnd()
      case TType.MAP =>
        val m = p.readMapBegin()
        (0 until m.size).foreach { _ =>
          walkValue(m.keyType, path); walkValue(m.valueType, path)
        }
        p.readMapEnd()
      case other => TProtocolUtil.skip(p, other)
    }
    val msg = p.readMessageBegin()
    walkStruct(Nil)
    p.readMessageEnd()
    (msg.name, acc.toSeq)
  }

  private def occurrences(frame: Array[Byte], run: Array[Byte]): Int =
    frame.indices.count(i => i + run.length <= frame.length &&
      run.indices.forall(j => frame(i + j) == run(j)))

  private def contains(frame: Array[Byte], run: Array[Byte]): Boolean =
    occurrences(frame, run) > 0

  /** The wire bytes of `(STRING, fieldId, Enc)` — what parseDbName sees. */
  private def nameFieldBytes(fieldId: Int): Array[Byte] =
    new Frame().raw(0x0B).i16(fieldId).str(Enc).bytes

  private def assertFrame(actual: Array[Byte], golden: Array[Byte]): Unit =
    assert(actual.sameElements(golden),
      s"\nwire frame mismatch\nactual:\n${hex(actual)}\ngolden:\n${hex(golden)}")

  /** Encoded strings must sit at exactly the front's documented rewrite
    * positions for this method — the executable tie to NameFieldPaths. */
  private def assertPositions(frame: Array[Byte], expectMethod: String,
      expected: Set[List[Short]]): Unit = {
    val (method, strings) = stringFields(frame)
    assert(method == expectMethod, method)
    val encodedAt = strings.collect { case (path, s) if s.startsWith("@") => path }.toSet
    assert(encodedAt == expected,
      s"encoded-name positions $encodedAt != documented $expected")
    assert(expected.subsetOf(
      LocalHive3Metastore.NameFieldPaths.getOrElse(method, Set.empty)),
      s"front's NameFieldPaths($method) misses a position the client emits")
  }

  /** Database mirroring `Hive2Backend.createNamespace` (name, description,
    * locationUri, parameters always set — empty map here — ownerName,
    * ownerType USER). */
  private def mirrorDatabase(): Database = {
    val d = new Database()
    d.setName(Enc)
    d.setDescription("d1")
    d.setLocationUri("file:/w/c1/db1")
    d.setOwnerName("tester")
    d.setOwnerType(PrincipalType.USER)
    d.setParameters(new java.util.HashMap[String, String]())
    d
  }

  /** Database golden: fields in IDL declaration order 1,2,3,4,6,7. */
  private def databaseGolden(f: Frame): Frame = f
    .raw(0x0B).i16(1).str(Enc)              // Database.name  ← parseDbName
    .raw(0x0B).i16(2).str("d1")             // description
    .raw(0x0B).i16(3).str("file:/w/c1/db1") // locationUri
    .raw(0x0D).i16(4).raw(0x0B, 0x0B).i32(0) // parameters: MAP<STR,STR> empty
    .raw(0x0B).i16(6).str("tester")         // ownerName
    .raw(0x08).i16(7).i32(1)                // ownerType: I32 enum USER=1
    .raw(0x00)                              // Database field-STOP

  test("create_database: Database.name (field 1.1) carries the encoded db") {
    val frame = capture(_.send_create_database(mirrorDatabase()))
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01)          // strict version | CALL(1)
      .str("create_database").i32(1)        // method, first-call seqid
      .raw(0x0C).i16(1)                     // args field 1: STRUCT Database
    databaseGolden(golden)
      .raw(0x00)                            // args field-STOP
    assertFrame(frame, golden.bytes)
    assertPositions(frame, "create_database", Set(List[Short](1, 1)))
    assert(contains(frame, nameFieldBytes(1)))
  }

  test("alter_database: both arg 1 (string) and arg 2's Database.name carry names") {
    // mirror of updateNamespaceProperties: alterDatabase(encodedDb, fetched)
    // — against a real HMS 3.x the fetched Database comes back with the
    // PLAIN name, but parseDbName is applied at 2.1 too, so the frame is
    // pinned with the encoded shape in both positions
    val frame = capture(_.send_alter_database(Enc, mirrorDatabase()))
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01)
      .str("alter_database").i32(1)
      .raw(0x0B).i16(1).str(Enc)            // args 1: dbname ← parseDbName
      .raw(0x0C).i16(2)                     // args 2: STRUCT Database
    databaseGolden(golden)
      .raw(0x00)
    assertFrame(frame, golden.bytes)
    assertPositions(frame, "alter_database",
      Set(List[Short](1), List[Short](2, 1)))
    // both name positions encode as a field-id-1 STRING run: args field 1
    // (dbname) and Database.name (field 1 INSIDE args field 2)
    assert(occurrences(frame, nameFieldBytes(1)) == 2)
  }

  /** Table mirroring `Hive2Backend.declareTable`: EXTERNAL_TABLE, empty
    * partition keys, SD with graft formats + SerDe, single-entry params
    * (one entry keeps the MAP region order-deterministic for the golden —
    * the real call adds the other markers the same way). */
  private def mirrorTable(): HmsTable = {
    val t = new HmsTable()
    t.setDbName(Enc)
    t.setTableName("t1")
    t.setTableType("EXTERNAL_TABLE")
    t.setPartitionKeys(new java.util.ArrayList())
    val sd = new StorageDescriptor()
    sd.setLocation("file:/w/c1/db1/t1")
    sd.setCols(new java.util.ArrayList())
    sd.setInputFormat("graft.mapred.GraftInputFormat")
    sd.setOutputFormat("graft.mapred.GraftOutputFormat")
    val serde = new SerDeInfo()
    serde.setSerializationLib("graft.mapred.GraftSerDe")
    sd.setSerdeInfo(serde)
    t.setSd(sd)
    val params = new java.util.HashMap[String, String]()
    params.put("table_type", "lance")
    t.setParameters(params)
    t
  }

  /** Table golden: declaration order 1,2,4,5,6,7,8,9,12 (owner/view/
    * privileges null-skipped; optional `temporary` unset-skipped;
    * non-optional primitives createTime/lastAccessTime/retention always
    * written as 0 by the generated writer). */
  private def tableGolden(f: Frame): Frame = f
    .raw(0x0B).i16(1).str("t1")             // tableName
    .raw(0x0B).i16(2).str(Enc)              // dbName  ← parseDbName
    .raw(0x08).i16(4).i32(0)                // createTime
    .raw(0x08).i16(5).i32(0)                // lastAccessTime
    .raw(0x08).i16(6).i32(0)                // retention
    .raw(0x0C).i16(7)                       // sd: STRUCT StorageDescriptor
    .raw(0x0F).i16(1).raw(0x0C).i32(0)      //   cols: LIST<STRUCT> empty
    .raw(0x0B).i16(2).str("file:/w/c1/db1/t1") // location
    .raw(0x0B).i16(3).str("graft.mapred.GraftInputFormat")
    .raw(0x0B).i16(4).str("graft.mapred.GraftOutputFormat")
    .raw(0x02).i16(5).raw(0x00)             //   compressed: BOOL false
    .raw(0x08).i16(6).i32(0)                //   numBuckets
    .raw(0x0C).i16(7)                       //   serdeInfo: STRUCT
    .raw(0x0B).i16(2).str("graft.mapred.GraftSerDe") // serializationLib
    .raw(0x00)                              //   SerDeInfo field-STOP
    .raw(0x00)                              //   StorageDescriptor field-STOP
    .raw(0x0F).i16(8).raw(0x0C).i32(0)      // partitionKeys: LIST<STRUCT> empty
    .raw(0x0D).i16(9).raw(0x0B, 0x0B).i32(1) // parameters: MAP, 1 entry
    .str("table_type").str("lance")
    .raw(0x0B).i16(12).str("EXTERNAL_TABLE") // tableType
    .raw(0x00)                              // Table field-STOP

  test("create_table: Table.dbName (field 1.2) carries the encoded db") {
    val frame = capture(_.send_create_table(mirrorTable()))
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01)
      .str("create_table").i32(1)
      .raw(0x0C).i16(1)                     // args field 1: STRUCT Table
    tableGolden(golden)
      .raw(0x00)
    assertFrame(frame, golden.bytes)
    assertPositions(frame, "create_table", Set(List[Short](1, 2)))
    assert(contains(frame, nameFieldBytes(2)))
  }

  test("create_table_with_environment_context (what HiveMetaStoreClient.createTable " +
      "actually sends): same Table position, null context skipped") {
    val frame = capture(_.send_create_table_with_environment_context(mirrorTable(), null))
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01)
      .str("create_table_with_environment_context").i32(1)
      .raw(0x0C).i16(1)
    tableGolden(golden)
      .raw(0x00)                            // args STOP: null context skipped
    assertFrame(frame, golden.bytes)
    assertPositions(frame, "create_table_with_environment_context",
      Set(List[Short](1, 2)))
    assert(contains(frame, nameFieldBytes(2)))
  }

  test("get_table_objects_by_name (bulk describeTables): encoded db at arg 1 only") {
    val frame = capture(_.send_get_table_objects_by_name(
      Enc, java.util.Arrays.asList("t1", "t2")))
    val golden = new Frame()
      .raw(0x80, 0x01, 0x00, 0x01)
      .str("get_table_objects_by_name").i32(1)
      .raw(0x0B).i16(1).str(Enc)            // args 1: dbname ← parseDbName
      .raw(0x0F).i16(2)                     // args 2: LIST<STRING> names
      .raw(0x0B).i32(2).str("t1").str("t2")
      .raw(0x00)
      .bytes
    assertFrame(frame, golden)
    assertPositions(frame, "get_table_objects_by_name", Set(List[Short](1)))
    assert(contains(frame, nameFieldBytes(1)))
  }
}
