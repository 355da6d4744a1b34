package graft.schema

import org.apache.spark.sql.types._
import org.json4s._

/** Catalog-native column registration for the Iceberg REST catalog — the
  * REST-side sibling of [[CatalogColumns]] (Hive/Glue) and Unity's type
  * table.
  *
  * The reference registers every lance table with a dummy 1-column struct
  * (`IcebergModels.java:446-460`) because the real schema lives in the
  * Lance data; graft keeps that wire shape when NO schema was declared
  * (conformance-pinned), but when the caller declared a schema it maps the
  * fields to Iceberg-native types so non-graft REST readers (Trino, a
  * catalog UI) see the real column list. Fidelity still rides the
  * `graft.schema` property — the native mapping is best-effort display
  * parity, with Unity's catch-all-`string` convention for types Iceberg
  * cannot spell.
  *
  * Field IDs are assigned depth-first in declaration order starting at 1,
  * covering nested element/key/value IDs the way the Iceberg spec
  * requires unique IDs across the whole schema tree.
  */
object IcebergColumns {

  /** Iceberg REST schema JValue for a declared schema; the reference's
    * dummy 1-column struct when none (or an empty one) was declared. */
  def schemaFor(schemaJson: Option[String]): JObject =
    schemaJson.map(JsonArrowSchema.fromJson).filter(_.nonEmpty) match {
      case Some(st) =>
        val ids = new java.util.concurrent.atomic.AtomicInteger(0)
        JObject(
          "type" -> JString("struct"),
          "fields" -> JArray(st.fields.toList.map(fieldJson(_, ids))))
      case None => dummySchema
    }

  /** The reference's exact dummy schema (`IcebergModels.java:446-460`). */
  val dummySchema: JObject = JObject(
    "type" -> JString("struct"),
    "fields" -> JArray(List(JObject(
      "id" -> JInt(1), "name" -> JString("dummy"),
      "required" -> JBool(false), "type" -> JString("string")))))

  private def fieldJson(f: StructField,
      ids: java.util.concurrent.atomic.AtomicInteger): JObject = {
    val id = ids.incrementAndGet()
    JObject(
      "id" -> JInt(id),
      "name" -> JString(f.name),
      "required" -> JBool(!f.nullable),
      "type" -> typeJson(f.dataType, ids))
  }

  /** Iceberg type for a Spark type; nested types compose recursively with
    * spec-required element/key/value IDs, anything unspellable degrades
    * to `string` (the Unity catch-all convention; exact fidelity rides
    * `graft.schema`). */
  private def typeJson(dt: DataType,
      ids: java.util.concurrent.atomic.AtomicInteger): JValue = dt match {
    case BooleanType => JString("boolean")
    // iceberg has no 8/16-bit ints; they widen to int (display parity)
    case ByteType | ShortType | IntegerType => JString("int")
    case LongType => JString("long")
    case FloatType => JString("float")
    case DoubleType => JString("double")
    case StringType => JString("string")
    case BinaryType => JString("binary")
    case DateType => JString("date")
    // Spark TimestampType is session-tz-relative → timestamptz;
    // TimestampNTZ is the tz-less spelling
    case TimestampType => JString("timestamptz")
    case TimestampNTZType => JString("timestamp")
    case d: DecimalType => JString(s"decimal(${d.precision}, ${d.scale})")
    case ArrayType(e, nullable) => JObject(
      "type" -> JString("list"),
      "element-id" -> JInt(ids.incrementAndGet()),
      "element" -> typeJson(e, ids),
      "element-required" -> JBool(!nullable))
    case MapType(k, v, valueNullable) => JObject(
      "type" -> JString("map"),
      "key-id" -> JInt(ids.incrementAndGet()),
      "key" -> typeJson(k, ids),
      "value-id" -> JInt(ids.incrementAndGet()),
      "value" -> typeJson(v, ids),
      "value-required" -> JBool(!valueNullable))
    case s: StructType => JObject(
      "type" -> JString("struct"),
      "fields" -> JArray(s.fields.toList.map(fieldJson(_, ids))))
    case _ => JString("string")
  }
}
