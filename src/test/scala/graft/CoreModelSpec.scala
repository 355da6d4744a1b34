package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.core.{GraftError, ObjectIdentifier, TableUtil}
import graft.backend.{CreateMode, DropMode, MemoryBackend}
import graft.schema.JsonArrowSchema

class CoreModelSpec extends AnyFunSuite {

  test("ObjectIdentifier parent/child/name/depth") {
    val id = ObjectIdentifier.of("cat", "db", "t")
    assert(id.depth == 3 && id.name == "t")
    assert(id.parent == ObjectIdentifier.of("cat", "db"))
    assert(id.parent.child("t2") == ObjectIdentifier.of("cat", "db", "t2"))
    assert(ObjectIdentifier.root.isRoot)
    assert(ObjectIdentifier.of("A", "B").lowered == ObjectIdentifier.of("a", "b"))
    intercept[IllegalArgumentException](ObjectIdentifier.of("ok", ""))
  }

  test("property merge: required lance markers win") {
    val merged = TableUtil.mergeTableProperties(
      Map("table_type" -> "parquet", "custom" -> "x"))
    assert(merged("table_type") == "lance" && merged("managed_by") == "storage")
    assert(merged("custom") == "x")
    assert(TableUtil.isLanceTable(Map("table_type" -> "LANCE"))) // case-insensitive
    assert(!TableUtil.isLanceTable(Map("table_type" -> "iceberg")))
  }

  test("storage option split strips prefix") {
    val (props, storage) = TableUtil.splitStorageOptions(
      Map("storage.aws_region" -> "us-east-1", "table_type" -> "lance"))
    assert(storage == Map("aws_region" -> "us-east-1"))
    assert(props == Map("table_type" -> "lance"))
  }

  test("offset pagination (PageUtil semantics)") {
    val items = (0 until 250).map(i => f"t$i%03d")
    val (p1, tok1) = TableUtil.page(items, None, Some(100))
    assert(p1.size == 100 && tok1.contains("100"))
    val (p2, tok2) = TableUtil.page(items, tok1, Some(100))
    assert(p2.head == "t100" && tok2.contains("200"))
    val (p3, tok3) = TableUtil.page(items, tok2, Some(100))
    assert(p3.size == 50 && tok3.isEmpty)
    intercept[GraftError.InvalidInput](TableUtil.page(items, Some("not-a-token"), None))
  }

  test("JSON Arrow schema roundtrip preserves nested types") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("score", FloatType),
      StructField("flags", ArrayType(BooleanType)),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("meta", MapType(StringType, StringType)),
      StructField("nested", StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", ArrayType(StructType(Seq(StructField("c", DateType)))))))),
      StructField("price", DecimalType(12, 2)),
      StructField("ts", TimestampType),
      StructField("ts_ntz", TimestampNTZType),
      StructField("blob", BinaryType)))
    assert(JsonArrowSchema.fromJson(JsonArrowSchema.toJson(schema)) == schema)
  }

  test("JSON Arrow schema decodes reference wire examples") {
    // the reference's own shapes (schema.py:92-135): ints with bitWidth,
    // floatingpoint with precision, timestamps with tz
    val json =
      """{"fields":[
        |{"name":"i8","nullable":true,"type":{"name":"int","bitWidth":8,"isSigned":true}},
        |{"name":"u32","nullable":true,"type":{"name":"int","bitWidth":32,"isSigned":false}},
        |{"name":"u64","nullable":true,"type":{"name":"int","bitWidth":64,"isSigned":false}},
        |{"name":"f","nullable":true,"type":{"name":"floatingpoint","precision":"SINGLE"}},
        |{"name":"s","nullable":false,"type":{"name":"utf8"}},
        |{"name":"t","nullable":true,"type":{"name":"timestamp","unit":"us","timezone":"UTC"}},
        |{"name":"lst","nullable":true,"type":{"name":"list"}}]}""".stripMargin
    val st = JsonArrowSchema.fromJson(json)
    assert(st("i8").dataType == ByteType)
    assert(st("u32").dataType == LongType)          // widened
    assert(st("u64").dataType == DecimalType(20, 0)) // widened
    assert(st("f").dataType == FloatType)
    assert(!st("s").nullable)
    assert(st("t").dataType == TimestampType)
    assert(st("lst").dataType == ArrayType(StringType)) // lossy ref encoding
    intercept[GraftError.InvalidInput](
      JsonArrowSchema.fromJson("""{"fields":[{"name":"x","type":{"name":"zzz"}}]}"""))
  }

  test("compat wire format drops nested children like the reference") {
    val schema = StructType(Seq(
      StructField("tags", ArrayType(StringType)),
      StructField("doc", StructType(Seq(StructField("a", IntegerType)))),
      StructField("kv", MapType(StringType, LongType)),
      StructField("id", LongType)))
    val compat = JsonArrowSchema.toJsonCompat(schema)
    assert(!compat.contains("children"))
    // still parseable by our decoder (lossy corners land on the documented
    // fallbacks: list->array<string>, struct->empty, map->string/string)
    val back = JsonArrowSchema.fromJson(compat)
    assert(back("tags").dataType == ArrayType(StringType))
    assert(back("doc").dataType == StructType(Nil))
    assert(back("kv").dataType == MapType(StringType, StringType))
    assert(back("id").dataType == LongType) // flat types round-trip exactly
    // full-fidelity form still round-trips completely
    assert(JsonArrowSchema.fromJson(JsonArrowSchema.toJson(schema)) == schema)
  }

  test("memory backend: 13-op semantics") {
    val b = new MemoryBackend
    b.initialize(Map("root" -> "/tmp/graft-test-wh"))
    val ns = ObjectIdentifier.of("db")
    b.createNamespace(ns, Map("k" -> "v"), CreateMode.Create)
    intercept[GraftError.NamespaceAlreadyExists](
      b.createNamespace(ns, Map.empty, CreateMode.Create))
    b.createNamespace(ns, Map.empty, CreateMode.ExistOk) // no-op
    assert(b.describeNamespace(ns) == Map("k" -> "v"))
    b.createNamespace(ns, Map("k2" -> "v2"), CreateMode.Overwrite)
    assert(b.describeNamespace(ns) == Map("k2" -> "v2"))

    val t = ns.child("t")
    val info = b.declareTable(t, None, Map("custom" -> "1"), None)
    assert(info.location == "/tmp/graft-test-wh/db/t.lance")
    assert(info.properties("table_type") == "lance")
    intercept[GraftError.TableAlreadyExists](b.declareTable(t, None, Map.empty, None))
    assert(b.listTables(ns) == Seq(t))
    assert(b.describeTable(t).isOnlyDeclared)

    // non-lance entries are filtered from listings — simulate via props
    intercept[GraftError.NamespaceNotFound](b.listTables(ObjectIdentifier.of("nope")))

    intercept[GraftError.InvalidInput](b.dropNamespace(ns, DropMode.Fail)) // non-empty
    b.dropTable(t, purge = false)
    b.dropNamespace(ns, DropMode.Fail)
    assert(!b.namespaceExists(ns))
    assert(b.dropNamespace(ns, DropMode.Skip).isEmpty) // skip mode no-op
    intercept[GraftError.NamespaceNotFound](b.dropNamespace(ns, DropMode.Fail))
  }
}
