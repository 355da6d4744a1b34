package graft.backend

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{GraftError, ObjectIdentifier}

/** Durable single-node catalog: [[MemoryBackend]] semantics persisted to one
  * JSON file with atomic tmp-file + rename writes. The local-filesystem
  * stand-in for a metastore service — catalogs survive across Spark
  * sessions, which the pure memory backend cannot offer. Driver-side only,
  * like every backend (SURVEY.md §3).
  *
  * Not a distributed catalog: concurrent writers on different hosts would
  * race. That is the same contract as the reference's embedded-Derby HMS
  * used for tests (`LocalHive2Metastore.java:42-120`).
  */
class FileBackend extends MemoryBackend {
  private var path: Path = _

  override def initialize(props: Map[String, String]): Unit = {
    super.initialize(props)
    path = Paths.get(props.getOrElse("path",
      throw GraftError.InvalidInput("file backend needs 'path' (catalog JSON file)")))
    if (Files.exists(path)) load()
  }

  override def backendId: String = s"file($path)"

  // persist after every mutation
  override def createNamespace(id: ObjectIdentifier, properties: Map[String, String],
      mode: CreateMode): Map[String, String] = {
    val r = super.createNamespace(id, properties, mode); save(); r
  }
  override def dropNamespace(id: ObjectIdentifier, mode: DropMode): Map[String, String] = {
    val r = super.dropNamespace(id, mode); save(); r
  }
  override def declareTable(id: ObjectIdentifier, location: Option[String],
      properties: Map[String, String], schemaJson: Option[String]): TableInfo = {
    val r = super.declareTable(id, location, properties, schemaJson); save(); r
  }
  override def dropTable(id: ObjectIdentifier, purge: Boolean): TableInfo = {
    val r = super.dropTable(id, purge); save(); r
  }

  private def jmap(m: Map[String, String]): JObject =
    JObject(m.toList.map { case (k, v) => k -> (JString(v): JValue) })
  private def smap(jv: JValue): Map[String, String] = jv match {
    case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
    case _ => Map.empty
  }

  private def save(): Unit = synchronized {
    val doc = JObject(
      "namespaces" -> JArray(snapshotNamespaces.map { case (levels, props) =>
        JObject("levels" -> JArray(levels.map(JString(_)).toList), "properties" -> jmap(props))
      }.toList),
      "tables" -> JArray(snapshotTables.map { info =>
        JObject(
          "levels" -> JArray(info.id.levels.map(JString(_)).toList),
          "location" -> JString(info.location),
          "properties" -> jmap(info.properties),
          "storageOptions" -> jmap(info.storageOptions),
          "schemaJson" -> info.schemaJson.map(JString(_)).getOrElse(JNull),
          "isOnlyDeclared" -> JBool(info.isOnlyDeclared))
      }.toList))
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.write(tmp, JsonMethods.compact(JsonMethods.render(doc))
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def load(): Unit = synchronized {
    val doc = JsonMethods.parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
    (doc \ "namespaces") match {
      case JArray(items) => items.foreach { ns =>
        val levels = (ns \ "levels").asInstanceOf[JArray].arr.collect { case JString(s) => s }
        restoreNamespace(levels, smap(ns \ "properties"))
      }
      case _ => ()
    }
    (doc \ "tables") match {
      case JArray(items) => items.foreach { t =>
        val levels = (t \ "levels").asInstanceOf[JArray].arr.collect { case JString(s) => s }
        val schema = (t \ "schemaJson") match { case JString(s) => Some(s); case _ => None }
        restoreTable(TableInfo(
          ObjectIdentifier(levels),
          (t \ "location").asInstanceOf[JString].s,
          smap(t \ "properties"), smap(t \ "storageOptions"), schema,
          (t \ "isOnlyDeclared") match { case JBool(b) => b; case _ => false }))
      }
      case _ => ()
    }
  }
}
