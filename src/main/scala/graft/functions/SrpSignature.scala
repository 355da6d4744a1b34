package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Codegen'd signed-random-projection (SRP) signature of an `ARRAY<FLOAT>`
  * embedding: bit p is 1 iff the left-fold dot product of the vector with
  * hyperplane p's weight row is >= 0.
  *
  * The hyperplanes are a constructor-level constant (derived once on the
  * driver from md5 parity — [[graft.ops.Similarity.srpPlaneWeights]]), so
  * each row pays `planes * dims` fused multiply-adds inside whole-stage
  * codegen: no per-row hashing, no interpreted higher-order lambdas, no
  * intermediate arrays. The composable `transform`+`aggregate` formulation
  * ([[graft.ops.Similarity.srpSignatureBitsComposable]]) is kept as the
  * readable spec of the numerics; SimilaritySpec pins their equivalence.
  *
  * Numerics: per-plane accumulation is a left fold in double precision over
  * the vector's index order — the identical fold the DuckDB oracle runs via
  * `list_reduce(list_transform(...))`, so signatures match across engines
  * bit for bit. Vectors shorter than the weight rows fold over their own
  * length (missing dims contribute nothing); null input yields null.
  */
case class SrpSignature(child: Expression, weights: Seq[Seq[Double]])
  extends UnaryExpression {

  private lazy val planes = weights.length
  private lazy val dims = if (weights.isEmpty) 0 else weights.head.length
  private lazy val flat: Array[Double] = weights.flatten.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_srp_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(dims, vec.numElements())
    val bits = new Array[Int](planes)
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var d = 0
      val base = p * dims
      while (d < n) {
        acc += flat(base + d) * vec.getFloat(d).toDouble
        d += 1
      }
      bits(p) = if (acc >= 0.0) 1 else 0
      p += 1
    }
    new GenericArrayData(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("srpWeights", flat, "double[]")
    nullSafeCodeGen(ctx, ev, vec => {
      val bits = ctx.freshName("bits")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dims, $vec.numElements());
         |int[] $bits = new int[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $acc = 0.0;
         |  int $base = $p * $dims;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += $w[$base + $d] * (double) $vec.getFloat($d);
         |  }
         |  $bits[$p] = ($acc >= 0.0) ? 1 : 0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bits);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  import org.apache.spark.sql.graft.ColumnBridge

  def apply(vec: Column, weights: Seq[Seq[Double]]): Column =
    ColumnBridge.column(SrpSignature(ColumnBridge.expression(vec), weights))
}
