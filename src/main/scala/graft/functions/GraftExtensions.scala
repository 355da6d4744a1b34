package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL surface for graft's custom expressions:
  * {{{
  *   spark.sql.extensions = graft.functions.GraftExtensions
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  * Keeps the custom-operator work inside Catalyst (codegen, null semantics,
  * constant folding) instead of a UDF boundary. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float vectors"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_cosine takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "graft_jaccard",
        "graft_jaccard(a, b) - Jaccard similarity of two string arrays (as sets)"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_jaccard takes exactly 2 arguments")
        JaccardSimilarity(children.head, children(1))
      }))
  }
}
