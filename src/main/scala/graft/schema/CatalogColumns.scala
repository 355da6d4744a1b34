package graft.schema

import org.apache.spark.sql.types._

/** Catalog-native column registration for the Hive-typed catalogs (HMS,
  * Glue — both validate hive-style type strings).
  *
  * The reference registers only a placeholder column (`__placeholder_id
  * bigint`, `hive2.py:490-498`, `glue.py:416-422`) because the real schema
  * lives in the Lance data. This repo keeps the exact declared schema in
  * table parameters (`graft.arrow_schema`) for graft-side fidelity, AND
  * maps it here to native columns so NON-graft catalog readers (a Hive
  * CLI, the Glue console, Athena) see the real column list — the same
  * parity Unity's backend gained via its type table
  * (`UnityNamespace.java:505-558`, with its catch-all-STRING convention
  * for unrepresentable types).
  */
object CatalogColumns {

  /** Reference placeholder column name (`hive2.py:493`, `glue.py:419`). */
  val PlaceholderName = "__placeholder_id"
  val PlaceholderType = "bigint"

  /** Hive/Glue type string for a Spark type — the subset both catalogs
    * validate, nested types composed recursively; anything with no hive
    * spelling degrades to `string` (Unity's catch-all convention). */
  def hiveTypeString(dt: DataType): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    // hive has no tz-less timestamp type; both Spark timestamps register
    // as the catalog's `timestamp` (fidelity rides graft.arrow_schema)
    case TimestampType | TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"array<${hiveTypeString(e)}>"
    case MapType(k, v, _) => s"map<${hiveTypeString(k)},${hiveTypeString(v)}>"
    case s: StructType =>
      s"struct<${s.fields.map(f => s"${f.name}:${hiveTypeString(f.dataType)}")
        .mkString(",")}>"
    case _ => "string"
  }

  /** (name, hiveType) per declared column; the reference's placeholder
    * when no (or an empty) schema was declared. */
  def columnsFor(schemaJson: Option[String]): Seq[(String, String)] =
    schemaJson.map(JsonArrowSchema.fromJson).filter(_.nonEmpty) match {
      case Some(st) => st.fields.toSeq.map(f => f.name -> hiveTypeString(f.dataType))
      case None => Seq(PlaceholderName -> PlaceholderType)
    }
}
