package graft.backend.rest

import java.net.URLEncoder
import java.nio.charset.StandardCharsets

import org.json4s._

import graft.backend._
import graft.core.{GraftError, ObjectIdentifier, TableUtil}

/** Apache Polaris backend via its generic-tables API.
  *
  * Semantics per the reference (`python/src/lance_namespace_impls/polaris.py`,
  * `java/lance-namespace-polaris/.../PolarisNamespace.java`):
  *  - level 1 = Polaris catalog; deeper levels = iceberg-style namespaces
  *    under `/api/catalog/v1/{catalog}/namespaces` (arbitrary depth,
  *    `PolarisNamespace.java:100-102`);
  *  - lance tables live under
  *    `/polaris/v1/{catalog}/namespaces/{ns}/generic-tables` with
  *    `format=lance` (`polaris.py:296-360`);
  *  - deregister-only drops, like all REST backends.
  */
class PolarisBackend extends MetadataBackend {
  private var conf: Map[String, String] = Map.empty
  private var client: RestClient = _

  override def initialize(props: Map[String, String]): Unit = {
    conf = props
    val base = props.get("uri").orElse(props.get("endpoint")).getOrElse(
      throw GraftError.InvalidInput("polaris backend needs 'uri'")).stripSuffix("/")
    val full = if (base.endsWith("/api/catalog")) base else s"$base/api/catalog"
    client = RestClient.fromConfig(conf + ("uri" -> full), Seq("uri"))
  }

  override def backendId: String = s"polaris(${conf.getOrElse("uri", "")})"

  private def quote(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def encodeNs(ns: Seq[String]): String =
    quote(ns.map(quote).mkString("\u001f"))

  private def catalogOf(id: ObjectIdentifier): String = id.levels.head

  private def propsOf(jv: JValue): Map[String, String] = jv match {
    case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
    case _ => Map.empty
  }

  override def listNamespaces(parent: ObjectIdentifier): Seq[ObjectIdentifier] = {
    if (parent.isRoot)
      return conf.get("catalog").toSeq.map(ObjectIdentifier.of(_))
    val rest = parent.levels.tail
    val params = if (rest.isEmpty) Map.empty[String, String]
      else Map("parent" -> rest.mkString("\u001f"))
    val resp = client.get(s"/v1/${quote(catalogOf(parent))}/namespaces", params)
    (resp \ "namespaces" match {
      case JArray(items) => items.map {
        case JArray(parts) => catalogOf(parent) +: parts.collect { case JString(s) => s }
        case _ => Nil
      }.filter(_.nonEmpty)
      case _ => Nil
    }).map(ObjectIdentifier(_)).sortBy(_.toDelimited())
  }

  override def createNamespace(id: ObjectIdentifier, properties: Map[String, String],
      mode: CreateMode): Map[String, String] = {
    if (id.depth < 2)
      throw GraftError.InvalidInput(s"polaris namespace needs catalog + path: $id")
    val body = JObject(
      "namespace" -> JArray(id.levels.tail.map(JString(_)).toList),
      "properties" -> JObject(properties.map { case (k, v) => k -> (JString(v): JValue) }.toList))
    try propsOf(client.post(s"/v1/${quote(catalogOf(id))}/namespaces", body) \ "properties")
    catch {
      case e: RestError if e.isConflict => mode match {
        case CreateMode.Create => throw GraftError.NamespaceAlreadyExists(id)
        case CreateMode.ExistOk => describeNamespace(id)
        case CreateMode.Overwrite =>
          dropNamespace(id, DropMode.Fail); createNamespace(id, properties, CreateMode.Create)
      }
    }
  }

  override def namespaceExists(id: ObjectIdentifier): Boolean =
    try { describeNamespace(id); true }
    catch { case _: GraftError.NamespaceNotFound => false }

  override def describeNamespace(id: ObjectIdentifier): Map[String, String] = {
    if (id.depth < 2) {
      if (conf.get("catalog").contains(id.levels.headOption.orNull)) return Map.empty
      throw GraftError.NamespaceNotFound(id)
    }
    try propsOf(client.get(
      s"/v1/${quote(catalogOf(id))}/namespaces/${encodeNs(id.levels.tail)}") \ "properties")
    catch { case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(id) }
  }

  /** Iceberg-style in-place property update under the catalog prefix. */
  override def updateNamespaceProperties(id: ObjectIdentifier,
      updates: Map[String, String], removals: Set[String]): Map[String, String] = {
    if (id.depth < 2)
      throw GraftError.InvalidInput(s"polaris namespace needs catalog + path: $id")
    try {
      client.post(
        s"/v1/${quote(catalogOf(id))}/namespaces/${encodeNs(id.levels.tail)}/properties",
        JObject(
          "removals" -> JArray(removals.toList.sorted.map(JString(_))),
          "updates" -> JObject(updates.map { case (k, v) => k -> (JString(v): JValue) }.toList)))
      describeNamespace(id)
    } catch {
      case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(id)
    }
  }

  override def dropNamespace(id: ObjectIdentifier, mode: DropMode): Map[String, String] =
    try {
      val snapshot = describeNamespace(id)
      client.delete(s"/v1/${quote(catalogOf(id))}/namespaces/${encodeNs(id.levels.tail)}")
      snapshot
    } catch {
      case _: GraftError.NamespaceNotFound if mode == DropMode.Skip => Map.empty
    }

  private def genericTables(id: ObjectIdentifier): String =
    s"/polaris/v1/${quote(catalogOf(id))}/namespaces/${encodeNs(id.levels.tail)}/generic-tables"

  override def listTables(ns: ObjectIdentifier): Seq[ObjectIdentifier] = {
    if (ns.depth < 2) throw GraftError.InvalidInput(s"need catalog + namespace: $ns")
    try {
      val resp = client.get(genericTables(ns))
      (resp \ "identifiers" match {
        case JArray(items) => items.flatMap(i => i \ "name" match {
          case JString(s) => Some(s); case _ => None
        })
        case _ => Nil
      }).distinct.sorted.map(ns.child)
        .filter(id => try TableUtil.isLanceTable(describeTable(id).properties)
                      catch { case _: GraftError => false })
    } catch {
      case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(ns)
    }
  }

  override def tableExists(id: ObjectIdentifier): Boolean =
    try { describeTable(id); true } catch { case _: GraftError => false }

  override def describeTable(id: ObjectIdentifier): TableInfo = {
    if (id.depth < 3)
      throw GraftError.InvalidInput(s"need catalog + namespace + table: $id")
    try {
      val resp = client.get(s"${genericTables(id.parent)}/${quote(id.name)}")
      val t = resp \ "table"
      // format must be lance (PolarisNamespace.java:357-362)
      (t \ "format") match {
        case JString(f) if f.equalsIgnoreCase("lance") => ()
        case other =>
          // reference wording incl. the offending format (PolarisNamespace.java:357-362)
          val got = other match { case JString(f) => f; case _ => "<unset>" }
          throw GraftError.InvalidInput(
            s"table $id is not a Lance table (format: $got)")
      }
      val props = propsOf(t \ "properties")
      val location = (t \ "base-location", t \ "baseLocation") match {
        case (JString(l), _) => l
        case (_, JString(l)) => l
        case _ => throw GraftError.Internal(s"table $id has no base-location")
      }
      val (clean, storage) = TableUtil.splitStorageOptions(props)
      TableInfo(id, location, clean, storage, clean.get("graft.schema"))
    } catch {
      case e: RestError if e.isNotFound => throw GraftError.TableNotFound(id)
    }
  }

  override def declareTable(id: ObjectIdentifier, location: Option[String],
      properties: Map[String, String], schemaJson: Option[String]): TableInfo = {
    if (id.depth < 3)
      throw GraftError.InvalidInput(s"need catalog + namespace + table: $id")
    val loc = location.getOrElse(
      (conf.getOrElse("root", "/tmp/graft-warehouse").stripSuffix("/") +:
        id.levels).mkString("/"))
    val props = TableUtil.mergeTableProperties(properties) ++
      schemaJson.map("graft.schema" -> _)
    val body = JObject(
      "name" -> JString(id.name),
      "format" -> JString("lance"),
      "base-location" -> JString(loc),
      "doc" -> JString("lance table"),
      "properties" -> JObject(props.map { case (k, v) => k -> (JString(v): JValue) }.toList))
    try {
      client.post(genericTables(id.parent), body)
      val (clean, storage) = TableUtil.splitStorageOptions(props)
      TableInfo(id, loc, clean, storage, schemaJson, isOnlyDeclared = true)
    } catch {
      case e: RestError if e.isConflict => throw GraftError.TableAlreadyExists(id)
      case e: RestError if e.isNotFound => throw GraftError.NamespaceNotFound(id.parent)
    }
  }

  override def dropTable(id: ObjectIdentifier, purge: Boolean): TableInfo = {
    val info = describeTable(id)
    try client.delete(s"${genericTables(id.parent)}/${quote(id.name)}")
    catch { case e: RestError if e.isNotFound => throw GraftError.TableNotFound(id) }
    info
  }
}
