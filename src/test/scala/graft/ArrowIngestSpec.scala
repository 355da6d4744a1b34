package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

import scala.jdk.CollectionConverters._

import graft.schema.ArrowIngest

/** Arrow IPC ingestion: the spec's op-12 payload path (IPC schema is
  * authoritative; data lands through the normal catalog write). */
class ArrowIngestSpec extends SparkSpec {
  import spark.implicits._

  private def buildIpc(): Array[Byte] = {
    val allocator = new RootAllocator()
    val schema = new Schema(List(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("name", FieldType.nullable(ArrowType.Utf8.INSTANCE), null),
      new Field("score", FieldType.nullable(
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)).asJava)
    val root = VectorSchemaRoot.create(schema, allocator)
    val ids = root.getVector("id").asInstanceOf[BigIntVector]
    val names = root.getVector("name").asInstanceOf[VarCharVector]
    val scores = root.getVector("score").asInstanceOf[Float8Vector]
    root.allocateNew()
    (0 until 5).foreach { i =>
      ids.setSafe(i, i.toLong * 10)
      names.setSafe(i, s"row$i".getBytes(StandardCharsets.UTF_8))
      if (i == 3) scores.setNull(i) else scores.setSafe(i, i * 1.5)
    }
    root.setRowCount(5)
    val out = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, out)
    writer.start(); writer.writeBatch(); writer.end(); writer.close()
    root.close(); allocator.close()
    out.toByteArray
  }

  test("IPC stream decodes with its embedded schema as authoritative") {
    val df = ArrowIngest.ipcToDataFrame(spark, buildIpc())
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(df.schema("id").dataType.typeName == "long")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 10L, 20L, 30L, 40L))
    assert(rows(1).getString(1) == "row1")
    assert(rows(3).isNullAt(2)) // nulls survive the IPC roundtrip
  }

  test("schema-only IPC stream (reference's canonical empty payload)") {
    // TestHelper.java:65-77: the spec's hello-world payload is an IPC
    // stream with a schema and ZERO batches
    val allocator = new RootAllocator()
    val schema = new Schema(List(
      new Field("id", FieldType.nullable(new ArrowType.Int(32, true)), null),
      new Field("name", FieldType.nullable(ArrowType.Utf8.INSTANCE), null)).asJava)
    val root = VectorSchemaRoot.create(schema, allocator)
    val out = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, out)
    writer.start(); writer.end(); writer.close()
    root.close(); allocator.close()

    val df = ArrowIngest.ipcToDataFrame(spark, out.toByteArray)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(df.schema("id").dataType.typeName == "integer")
    assert(df.count() == 0)
    // declared-table flow: schema-only payload creates an empty table
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.arrow")
    ArrowIngest.createTableWithData(spark, "graft.arrow.empty_t", out.toByteArray)
    assert(spark.table("graft.arrow.empty_t").count() == 0)
    assert(spark.table("graft.arrow.empty_t").schema.fieldNames.toSeq == Seq("id", "name"))
  }

  test("op-12 createTable with initial Arrow data through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.arrow")
    ArrowIngest.createTableWithData(spark, "graft.arrow.ingested", buildIpc())
    val back = spark.table("graft.arrow.ingested").orderBy("id")
      .select("id", "name").as[(Long, String)].collect()
    assert(back.length == 5 && back.head == (0L, "row0"))
    // schema round-tripped through the catalog's JSON Arrow codec
    assert(spark.table("graft.arrow.ingested").schema("score").dataType.typeName == "double")
  }

  test("export: DataFrame → IPC → DataFrame round-trips values, nulls, empty") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.5), (2L, null, null), (null, "c", -0.25))
      .toDF("id", "name", "score")
    val back = ArrowIngest.ipcToDataFrame(spark, ArrowIngest.dataFrameToIpc(df))
    assert(back.schema == df.schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // schema-only stream for an empty frame, decodable like the
    // reference's canonical empty payload
    val empty = ArrowIngest.ipcToDataFrame(spark,
      ArrowIngest.dataFrameToIpc(df.limit(0)))
    assert(empty.schema == df.schema && empty.count() == 0)
    // and the exported bytes feed op-12 table creation directly
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.arrow")
    ArrowIngest.createTableWithData(spark, "graft.arrow.exported",
      ArrowIngest.dataFrameToIpc(df))
    assert(spark.table("graft.arrow.exported").count() == 3)
  }
}
