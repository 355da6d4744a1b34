package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.GraftError

/** Bidirectional codec between the JSON Arrow schema wire format and Spark
  * `StructType`.
  *
  * The wire shape follows the reference's codec
  * (`python/src/lance_namespace_impls/schema.py:24-209`):
  * `{"fields": [{"name", "nullable", "type": {"name", ...params}}]}` with type
  * names `bool|int|floatingpoint|utf8|binary|timestamp|date|decimal|list|
  * struct|map|null`. Two deliberate deviations, both flagged in SURVEY.md
  * §1.2:
  *  - nested types carry their children (the reference drops list element /
  *    struct fields / map kv — `schema.py:128-133` — a lossy corner we fix by
  *    emitting Arrow-style `"children"` arrays);
  *  - unsigned ints widen (uint8→Short, uint16→Int, uint32→Long,
  *    uint64→Decimal(20,0)) since Spark has no unsigned types.
  * Unknown type names raise, matching `schema.py:209`.
  */
object JsonArrowSchema {

  def toJson(schema: StructType): String =
    JsonMethods.compact(JsonMethods.render(schemaToJValue(schema)))

  /** Reference-exact wire compatibility: nested types WITHOUT children
    * (`schema.py:128-133` drops list element / struct fields / map kv).
    * Use only when a reference reader must parse the payload; [[toJson]]
    * keeps full fidelity and [[fromJson]] accepts both shapes. */
  def toJsonCompat(schema: StructType): String = {
    def strip(jv: JValue): JValue = jv match {
      case JObject(fields) => JObject(fields.flatMap {
        case ("children", _) => None
        case (k, v) => Some(k -> strip(v))
      })
      case JArray(items) => JArray(items.map(strip))
      case other => other
    }
    JsonMethods.compact(JsonMethods.render(strip(schemaToJValue(schema))))
  }

  def fromJson(json: String): StructType =
    jValueToSchema(JsonMethods.parse(json))

  // ---- encode ----

  private def schemaToJValue(schema: StructType): JObject =
    JObject("fields" -> JArray(schema.fields.map(fieldToJValue).toList))

  private def fieldToJValue(f: StructField): JObject =
    JObject(
      "name" -> JString(f.name),
      "nullable" -> JBool(f.nullable),
      "type" -> typeToJValue(f.dataType))

  private def typeToJValue(dt: DataType): JObject = dt match {
    case NullType => JObject("name" -> JString("null"))
    case BooleanType => JObject("name" -> JString("bool"))
    case ByteType => intType(8)
    case ShortType => intType(16)
    case IntegerType => intType(32)
    case LongType => intType(64)
    case FloatType =>
      JObject("name" -> JString("floatingpoint"), "precision" -> JString("SINGLE"))
    case DoubleType =>
      JObject("name" -> JString("floatingpoint"), "precision" -> JString("DOUBLE"))
    case StringType => JObject("name" -> JString("utf8"))
    case BinaryType => JObject("name" -> JString("binary"))
    case TimestampType =>
      JObject("name" -> JString("timestamp"), "unit" -> JString("us"),
        "timezone" -> JString("UTC"))
    case TimestampNTZType =>
      JObject("name" -> JString("timestamp"), "unit" -> JString("us"))
    case DateType => JObject("name" -> JString("date"), "unit" -> JString("DAY"))
    case d: DecimalType =>
      JObject("name" -> JString("decimal"),
        "precision" -> JInt(d.precision), "scale" -> JInt(d.scale))
    case ArrayType(elem, containsNull) =>
      JObject("name" -> JString("list"), "children" -> JArray(List(
        fieldToJValue(StructField("item", elem, containsNull)))))
    case StructType(fields) =>
      JObject("name" -> JString("struct"),
        "children" -> JArray(fields.map(fieldToJValue).toList))
    case MapType(k, v, valueContainsNull) =>
      JObject("name" -> JString("map"), "children" -> JArray(List(
        fieldToJValue(StructField("key", k, nullable = false)),
        fieldToJValue(StructField("value", v, valueContainsNull)))))
    case other =>
      throw GraftError.InvalidInput(s"unsupported Spark type for Arrow JSON: $other")
  }

  private def intType(bits: Int, signed: Boolean = true): JObject =
    JObject("name" -> JString("int"), "bitWidth" -> JInt(bits), "isSigned" -> JBool(signed))

  // ---- decode ----

  private def jValueToSchema(jv: JValue): StructType = jv \ "fields" match {
    case JArray(fields) => StructType(fields.map(jValueToField))
    case _ => throw GraftError.InvalidInput("JSON Arrow schema missing 'fields' array")
  }

  private def jValueToField(jv: JValue): StructField = {
    val name = jv \ "name" match {
      case JString(s) => s
      case _ => throw GraftError.InvalidInput("JSON Arrow field missing 'name'")
    }
    val nullable = jv \ "nullable" match {
      case JBool(b) => b
      case _ => true
    }
    StructField(name, jValueToType(jv \ "type"), nullable)
  }

  private def children(jv: JValue): List[JValue] = jv \ "children" match {
    case JArray(cs) => cs
    case _ => Nil
  }

  private def str(jv: JValue): Option[String] = jv match {
    case JString(s) => Some(s)
    case _ => None
  }

  private def jValueToType(jv: JValue): DataType = {
    val typeName = str(jv \ "name").getOrElse(
      throw GraftError.InvalidInput("JSON Arrow type missing 'name'"))
    typeName.toLowerCase match {
      case "null" => NullType
      case "bool" | "boolean" => BooleanType
      case "int" =>
        val bits = jv \ "bitWidth" match { case JInt(b) => b.toInt; case _ => 32 }
        val signed = jv \ "isSigned" match { case JBool(b) => b; case _ => true }
        (bits, signed) match {
          case (8, true) => ByteType
          case (16, true) => ShortType
          case (32, true) => IntegerType
          case (64, true) => LongType
          // unsigned: widen to the next signed container (SURVEY.md §1.2)
          case (8, false) => ShortType
          case (16, false) => IntegerType
          case (32, false) => LongType
          case (64, false) => DecimalType(20, 0)
          case other => throw GraftError.InvalidInput(s"unsupported int width $other")
        }
      case "floatingpoint" =>
        str(jv \ "precision").map(_.toUpperCase) match {
          case Some("SINGLE") => FloatType
          case Some("DOUBLE") | None => DoubleType
          case Some("HALF") => FloatType // no half type in Spark; widen
          case other => throw GraftError.InvalidInput(s"unsupported fp precision $other")
        }
      case "utf8" | "string" | "largeutf8" => StringType
      case "binary" | "largebinary" => BinaryType
      case "timestamp" =>
        // tz-aware → TimestampType; no tz → NTZ (schema.py:190-196)
        if (str(jv \ "timezone").exists(_.nonEmpty)) TimestampType else TimestampNTZType
      case "date" | "date32" | "date64" => DateType
      case "decimal" =>
        val p = jv \ "precision" match { case JInt(v) => v.toInt; case _ => 38 }
        val s = jv \ "scale" match { case JInt(v) => v.toInt; case _ => 10 }
        DecimalType(p, s)
      case "list" | "largelist" =>
        children(jv) match {
          case elem :: Nil =>
            val f = jValueToField(elem)
            ArrayType(f.dataType, f.nullable)
          // reference-compat: element type dropped on the wire → opaque string
          case Nil => ArrayType(StringType)
          case other => throw GraftError.InvalidInput(s"list with ${other.size} children")
        }
      case "struct" =>
        StructType(children(jv).map(jValueToField))
      case "map" =>
        children(jv) match {
          case k :: v :: Nil =>
            val vf = jValueToField(v)
            MapType(jValueToField(k).dataType, vf.dataType, vf.nullable)
          case Nil => MapType(StringType, StringType)
          case other => throw GraftError.InvalidInput(s"map with ${other.size} children")
        }
      case other => throw GraftError.InvalidInput(s"unsupported Arrow type name '$other'")
    }
  }
}
