package graft.backend.rest

import org.json4s._

import graft.backend._
import graft.core.{GraftError, ObjectIdentifier, TableUtil}

/** Unity Catalog backend (`/api/2.1/unity-catalog`).
  *
  * Semantics per the reference (`python/src/lance_namespace_impls/unity.py`,
  * `java/lance-namespace-unity/.../UnityNamespace.java`):
  *  - namespace depth is exactly 2: catalog.schema (`UnityNamespace.java:163`);
  *    the root level lists catalogs, one level lists schemas of a catalog;
  *  - tables are EXTERNAL with `data_source_format=TEXT` placeholder
  *    (`UnityNamespace.java:333-334`) and the lance marker in properties;
  *  - schemas/tables are addressed by `catalog.schema[.table]` full names.
  */
class UnityBackend extends MetadataBackend {
  private var conf: Map[String, String] = Map.empty
  private var client: RestClient = _

  override def initialize(props: Map[String, String]): Unit = {
    conf = props
    val base = props.get("uri").orElse(props.get("endpoint")).getOrElse(
      throw GraftError.InvalidInput("unity backend needs 'uri'")).stripSuffix("/")
    val full =
      if (base.endsWith("/api/2.1/unity-catalog")) base
      else if (base.endsWith("/api/2.1")) s"$base/unity-catalog"
      else s"$base/api/2.1/unity-catalog"
    // Unity diverges from the shared 30 s read-timeout default: the
    // reference documents 300 s (`docs/src/unity.md:19`) because Unity
    // table creation can block on cloud-storage validation. An explicit
    // read_timeout_ms still wins.
    val timeouts =
      if (conf.contains("read_timeout_ms")) conf
      else conf + ("read_timeout_ms" -> "300000")
    client = RestClient.fromConfig(timeouts + ("uri" -> full), Seq("uri"))
  }

  override def backendId: String = s"unity(${conf.getOrElse("uri", "")})"

  private def requireDepth(id: ObjectIdentifier, n: Int, what: String): Unit =
    if (id.depth != n)
      throw GraftError.InvalidInput(s"unity $what needs exactly $n levels, got $id")

  private def names(jv: JValue, key: String): Seq[String] = jv \ key match {
    case JArray(items) => items.flatMap(i => i \ "name" match {
      case JString(s) => Some(s); case _ => None
    })
    case _ => Nil
  }

  private def propsOf(jv: JValue): Map[String, String] = jv match {
    case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
    case _ => Map.empty
  }

  override def listNamespaces(parent: ObjectIdentifier): Seq[ObjectIdentifier] =
    parent.depth match {
      case 0 => names(client.get("/catalogs"), "catalogs").sorted
        .map(ObjectIdentifier.of(_))
      case 1 =>
        val resp = client.get("/schemas", Map("catalog_name" -> parent.name))
        names(resp, "schemas").sorted.map(parent.child)
      case _ => Nil // depth-2 namespaces have no children in unity
    }

  override def createNamespace(id: ObjectIdentifier, properties: Map[String, String],
      mode: CreateMode): Map[String, String] = {
    requireDepth(id, 2, "namespace")
    val body = JObject(
      "name" -> JString(id.name),
      "catalog_name" -> JString(id.levels.head),
      "properties" -> JObject(properties.map { case (k, v) => k -> (JString(v): JValue) }.toList))
    try propsOf(client.post("/schemas", body) \ "properties")
    catch {
      case e: RestError if e.isConflict => mode match {
        case CreateMode.Create => throw GraftError.NamespaceAlreadyExists(id)
        case CreateMode.ExistOk => describeNamespace(id)
        case CreateMode.Overwrite =>
          dropNamespace(id, DropMode.Fail); createNamespace(id, properties, CreateMode.Create)
      }
      case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(id.parent)
    }
  }

  override def namespaceExists(id: ObjectIdentifier): Boolean =
    try { describeNamespace(id); true }
    catch { case _: GraftError.NamespaceNotFound => false }

  override def describeNamespace(id: ObjectIdentifier): Map[String, String] = id.depth match {
    case 1 =>
      try propsOf(client.get(s"/catalogs/${id.name}") \ "properties")
      catch { case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(id) }
    case 2 =>
      try propsOf(client.get(s"/schemas/${id.toDelimited()}") \ "properties")
      catch { case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(id) }
    case _ => throw GraftError.InvalidInput(s"unity namespace depth 1 or 2, got $id")
  }

  /** Unity updates schema properties via PATCH on the full name. */
  override def updateNamespaceProperties(id: ObjectIdentifier,
      updates: Map[String, String], removals: Set[String]): Map[String, String] = {
    requireDepth(id, 2, "namespace")
    val next = describeNamespace(id) -- removals ++ updates
    try {
      client.patch(s"/schemas/${id.toDelimited()}",
        JObject("properties" ->
          JObject(next.map { case (k, v) => k -> (JString(v): JValue) }.toList)))
      next
    } catch {
      case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(id)
    }
  }

  override def dropNamespace(id: ObjectIdentifier, mode: DropMode): Map[String, String] = {
    requireDepth(id, 2, "namespace")
    try {
      val snapshot = describeNamespace(id)
      client.delete(s"/schemas/${id.toDelimited()}")
      snapshot
    } catch {
      case _: GraftError.NamespaceNotFound if mode == DropMode.Skip => Map.empty
    }
  }

  override def listTables(ns: ObjectIdentifier): Seq[ObjectIdentifier] = {
    requireDepth(ns, 2, "namespace")
    val resp = client.get("/tables", Map(
      "catalog_name" -> ns.levels.head, "schema_name" -> ns.name))
    (resp \ "tables" match {
      case JArray(items) => items.flatMap { t =>
        val name = t \ "name" match { case JString(s) => Some(s); case _ => None }
        // lance predicate applied on the listing response (unity.py:614-630)
        val isLance = TableUtil.isLanceTable(propsOf(t \ "properties"))
        if (isLance) name else None
      }
      case _ => Nil
    }).sorted.map(ns.child)
  }

  override def tableExists(id: ObjectIdentifier): Boolean =
    try { describeTable(id); true } catch { case _: GraftError => false }

  override def describeTable(id: ObjectIdentifier): TableInfo = {
    requireDepth(id, 3, "table")
    try {
      val resp = client.get(s"/tables/${id.toDelimited()}")
      val props = propsOf(resp \ "properties")
      TableUtil.validateLanceTable(id, props)
      val location = resp \ "storage_location" match {
        case JString(l) => l
        case _ => throw GraftError.Internal(s"table $id has no storage_location")
      }
      val (clean, storage) = TableUtil.splitStorageOptions(props)
      TableInfo(id, location, clean, storage, clean.get("graft.schema"))
    } catch {
      case e: RestError if e.isNotFound => throw GraftError.TableNotFound(id)
    }
  }

  /** The reference's Arrow→Unity type map (`UnityNamespace.java:505-558`,
    * `convertArrowTypeToUnityType`/`...Json`), re-expressed over the Spark
    * types our Arrow codec round-trips. Anything outside the eight mapped
    * scalars — arrays, structs, decimals, binary — falls back to STRING,
    * the reference's catch-all. Returns (type_name, type_json). */
  private def unityType(dt: org.apache.spark.sql.types.DataType): (String, String) = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => ("STRING", """{"type":"string"}""")
      case IntegerType => ("INT", """{"type":"integer"}""")
      case LongType => ("LONG", """{"type":"long"}""")
      case FloatType => ("FLOAT", """{"type":"float"}""")
      case DoubleType => ("DOUBLE", """{"type":"double"}""")
      case BooleanType => ("BOOLEAN", """{"type":"boolean"}""")
      case DateType => ("DATE", """{"type":"date"}""")
      case TimestampType | TimestampNTZType => ("TIMESTAMP", """{"type":"timestamp"}""")
      case _ => ("STRING", """{"type":"string"}""")
    }
  }

  /** Columns registered with the catalog: the declared schema mapped
    * through [[unityType]] when one exists (`convertArrowSchemaToUnityColumns`,
    * `UnityNamespace.java:489-503` — type_text carries the same uppercase
    * name the reference sets), else the reference's single placeholder
    * column (`UnityNamespace.java:336-345`). */
  private def columnsFor(schemaJson: Option[String]): JArray = {
    val declared = schemaJson.map(graft.schema.JsonArrowSchema.fromJson)
      .filter(_.nonEmpty)
    declared match {
      case Some(st) => JArray(st.fields.toList.zipWithIndex.map { case (f, i) =>
        val (tn, tj) = unityType(f.dataType)
        JObject(
          "name" -> JString(f.name),
          "type_name" -> JString(tn),
          "type_text" -> JString(tn),
          "type_json" -> JString(tj),
          "position" -> JInt(i),
          "nullable" -> JBool(f.nullable))
      })
      case None => JArray(List(JObject(
        "name" -> JString("__placeholder_id"),
        "type_name" -> JString("LONG"),
        "type_text" -> JString("LONG"),
        "type_json" -> JString("""{"type":"long"}"""),
        "position" -> JInt(0),
        "nullable" -> JBool(true))))
    }
  }

  override def declareTable(id: ObjectIdentifier, location: Option[String],
      properties: Map[String, String], schemaJson: Option[String]): TableInfo = {
    requireDepth(id, 3, "table")
    val loc = location.getOrElse(
      (conf.getOrElse("root", "/tmp/graft-warehouse").stripSuffix("/") +:
        id.levels).mkString("/"))
    val props = TableUtil.mergeTableProperties(properties) ++
      schemaJson.map("graft.schema" -> _)
    val body = JObject(
      "name" -> JString(id.name),
      "catalog_name" -> JString(id.levels.head),
      "schema_name" -> JString(id.levels(1)),
      "table_type" -> JString("EXTERNAL"),
      // placeholder format, as the reference registers
      // (UnityNamespace.java:333-334)
      "data_source_format" -> JString("TEXT"),
      "columns" -> columnsFor(schemaJson),
      "storage_location" -> JString(loc),
      "properties" -> JObject(props.map { case (k, v) => k -> (JString(v): JValue) }.toList))
    try {
      client.post("/tables", body)
      val (clean, storage) = TableUtil.splitStorageOptions(props)
      TableInfo(id, loc, clean, storage, schemaJson, isOnlyDeclared = true)
    } catch {
      case e: RestError if e.isConflict => throw GraftError.TableAlreadyExists(id)
      case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(id.parent)
    }
  }

  override def dropTable(id: ObjectIdentifier, purge: Boolean): TableInfo = {
    val info = describeTable(id)
    try client.delete(s"/tables/${id.toDelimited()}")
    catch { case e: RestError if e.isNotFound => throw GraftError.TableNotFound(id) }
    info
  }
}
