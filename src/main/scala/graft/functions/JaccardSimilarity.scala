package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaccard similarity of two `ARRAY<STRING>` columns (distinct
  * semantics). The composable `array_intersect`/`size` formulation walks
  * both arrays twice and materializes the intersection array; this
  * expression builds one hash set per side and counts in a single pass —
  * the hot inner loop of LSH near-dup verification.
  *
  * Inputs are treated as sets (duplicates ignored), matching
  * [[graft.ops.Dedup.jaccard]] on already-distinct shingle arrays.
  * Null if either input is null; two empty arrays → 0.0 (no shared mass).
  */
case class JaccardSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<STRING> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < xs.numElements()) {
      if (!xs.isNullAt(i)) setA.add(xs.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String]()
    var inter = 0L
    i = 0
    while (i < ys.numElements()) {
      if (!ys.isNullAt(i)) {
        val v = ys.getUTF8String(i)
        if (setB.add(v) && setA.contains(v)) inter += 1
      }
      i += 1
    }
    val union = setA.size.toLong + setB.size.toLong - inter
    if (union == 0L) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val setA = ctx.freshName("setA")
      val setB = ctx.freshName("setB")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val hs = "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>"
      s"""
         |$hs $setA = new $hs();
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) $setA.add($a.getUTF8String($i));
         |}
         |$hs $setB = new $hs();
         |long $inter = 0L;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if (!$b.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $v = $b.getUTF8String($i);
         |    if ($setB.add($v) && $setA.contains($v)) $inter++;
         |  }
         |}
         |long $union = (long) $setA.size() + (long) $setB.size() - $inter;
         |${ev.value} = ($union == 0L) ? 0.0 : (double) $inter / (double) $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {
  import org.apache.spark.sql.graft.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaccardSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
