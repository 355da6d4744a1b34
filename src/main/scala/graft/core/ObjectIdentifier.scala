package graft.core

/** Hierarchical object identifier: a list of string levels.
  *
  * Semantics follow the reference's core identifier util
  * (`java/lance-namespace-impls-core/src/main/java/org/lance/namespace/util/ObjectIdentifier.java:24-106`):
  * 0 levels = root, 1 = catalog/database (backend-dependent), last level = leaf
  * name. Instances are immutable; backends impose their own depth policy
  * (e.g. Hive2 = 1-level namespaces, Unity = exactly 2).
  */
final case class ObjectIdentifier(levels: Seq[String]) {
  require(levels.forall(l => l != null && l.nonEmpty), s"empty identifier level in $levels")

  def depth: Int = levels.size
  def isRoot: Boolean = levels.isEmpty
  /** Leaf name (last level). */
  def name: String = {
    require(levels.nonEmpty, "root identifier has no name")
    levels.last
  }
  /** All levels but the last. */
  def parent: ObjectIdentifier = {
    require(levels.nonEmpty, "root identifier has no parent")
    ObjectIdentifier(levels.dropRight(1))
  }
  def child(n: String): ObjectIdentifier = ObjectIdentifier(levels :+ n)
  /** Lower-cased copy (Hive-family backends are case-insensitive;
    * cf. `Hive2Namespace.java:156,235`). */
  def lowered: ObjectIdentifier = ObjectIdentifier(levels.map(_.toLowerCase))
  def toDelimited(sep: String = "."): String = levels.mkString(sep)
  override def toString: String = toDelimited()
}

object ObjectIdentifier {
  val root: ObjectIdentifier = ObjectIdentifier(Nil)
  def of(levels: String*): ObjectIdentifier = ObjectIdentifier(levels)
  def of(ns: Array[String], name: String): ObjectIdentifier =
    ObjectIdentifier(ns.toIndexedSeq :+ name)
}
