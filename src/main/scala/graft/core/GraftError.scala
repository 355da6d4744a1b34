package graft.core

/** Spec error taxonomy with numeric codes, per the reference's documented
  * error model (`docs/src/hive2.md:57-107`, `Hive2ErrorType.java:17-22`,
  * REST mapping `rest_client.py:254-295`).
  *
  * The Spark catalog layer re-maps these to
  * `org.apache.spark.sql.catalyst.analysis.*Exception` at the DSv2 boundary;
  * backends and the REST facade speak this ADT.
  */
sealed abstract class GraftError(val code: Int, msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

object GraftError {
  final case class NamespaceNotFound(id: ObjectIdentifier)
      extends GraftError(1, s"namespace not found: $id")
  final case class NamespaceAlreadyExists(id: ObjectIdentifier)
      extends GraftError(2, s"namespace already exists: $id")
  final case class TableNotFound(id: ObjectIdentifier)
      extends GraftError(3, s"table not found: $id")
  final case class TableAlreadyExists(id: ObjectIdentifier)
      extends GraftError(4, s"table already exists: $id")
  final case class InvalidInput(detail: String)
      extends GraftError(5, s"invalid input: $detail")
  final case class Internal(detail: String, causeOpt: Throwable = null)
      extends GraftError(13, s"internal error: $detail", causeOpt)
  final case class ServiceUnavailable(detail: String, causeOpt: Throwable = null)
      extends GraftError(17, s"service unavailable: $detail", causeOpt)
  final case class Unsupported(op: String)
      extends GraftError(13, s"unsupported operation: $op")
}
