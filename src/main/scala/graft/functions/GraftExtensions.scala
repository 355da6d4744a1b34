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
    // optimizer-integrated index access: covering filters over routed
    // parquet sources are served from the persisted btree/bitmap indexes
    // (no-op until IndexRoute.register declares a route)
    ext.injectOptimizerRule(session =>
      graft.plans.IndexedScanRewrite(session))
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
    ext.injectFunction((
      new FunctionIdentifier("graft_bounded_lev"),
      new ExpressionInfo(classOf[BoundedLevenshtein].getName, "graft_bounded_lev",
        "graft_bounded_lev(a, b, k) - Levenshtein distance if <= k, else k+1 " +
          "(banded DP, early exit)"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "graft_bounded_lev takes exactly 3 arguments")
        BoundedLevenshtein(children.head, children(1), children(2))
      }))
    // Column-composition operators surfaced to SQL as raw Catalyst trees
    // built from the SAME built-in expression classes the Column forms
    // compose (a Column can't round-trip through a function builder — the
    // bridge yields unevaluable ColumnNode wrappers there) — so the SQL
    // surface stays 100% codegen'd built-ins.
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
    def L(v: Any): Expression = Literal(v)
    ext.injectFunction((
      new FunctionIdentifier("graft_redact_pii"),
      new ExpressionInfo(graft.ops.Curation.getClass.getName, "graft_redact_pii",
        "graft_redact_pii(text) - replace emails/IPv4s/phone numbers with typed tokens"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_redact_pii takes exactly 1 argument")
        import graft.ops.Curation._
        RegExpReplace(
          RegExpReplace(
            RegExpReplace(children.head, L(EmailPattern), L("<EMAIL>")),
            L(Ipv4Pattern), L("<IP>")),
          L(PhonePattern), L("<PHONE>"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_split"),
      new ExpressionInfo(graft.ops.Curation.getClass.getName, "graft_split",
        "graft_split(id) - deterministic train/val/test assignment (98/1/1) by hashed id"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_split takes exactly 1 argument")
        val hashed = Md5(Cast(Concat(Seq(
          L("split:"), Cast(children.head, StringType))), BinaryType))
        val bucket = Pmod(
          Cast(Conv(Substring(hashed, L(1), L(8)), L(16), L(10)), LongType),
          L(100L))
        CaseWhen(Seq(
          (LessThan(bucket, L(98L)), L("train")),
          (LessThan(bucket, L(99L)), L("val"))), L("test"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(graft.ops.ZOrder.getClass.getName, "graft_zvalue",
        "graft_zvalue(x, y) - Morton z-value interleaving the low 16 bits of x and y"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_zvalue takes exactly 2 arguments")
        val x = Cast(children.head, LongType)
        val y = Cast(children(1), LongType)
        val terms = (0 until 16).flatMap { b =>
          Seq(
            ShiftLeft(BitwiseAnd(ShiftRight(x, L(b)), L(1L)), L(2 * b)),
            ShiftLeft(BitwiseAnd(ShiftRight(y, L(b)), L(1L)), L(2 * b + 1)))
        }
        terms.reduceLeft[Expression]((a, t) => Add(a, t))
      }))
  }
}
