package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Shannon character entropy of a string — the heaviest
  * per-row CPU expression in the suite (q130's whole cost, half of
  * q137's), rewritten from the composable HOF formulation into ONE pass
  * per row.
  *
  * The HOF spec (`transform(array_distinct(chars), c ->
  * size(filter(chars, x == c)) ...)` — kept as
  * [[graft.ops.TextFunctions.charEntropyComposable]], the readable
  * reference OpsSpec pins this against) re-scans the whole char array
  * once per DISTINCT char: O(distinct × len) interpreted lambda calls
  * and a materialized char array per row. This expression counts
  * occurrences in a single O(len) hash pass and runs inside whole-stage
  * codegen as one static call — no interpreted lambda tree, no
  * intermediate Catalyst arrays.
  *
  * Numerics are replicated EXACTLY, term for term, so every charEntropy
  * gate hash (q130, q137) is unchanged:
  *  - the char inventory is the SAME `UTF8String.split("", -1)` the
  *    built-in `split(text, "")` evaluates (leading/trailing empty
  *    elements and all — they count as chars there, so they count here);
  *  - p = count.toDouble / n, term = (p * ln p) * −1.0 in double, each
  *    term cast to decimal(27,15) via Spark's own [[Decimal]]
  *    (HALF_UP at scale 15, the identical Cast path);
  *  - terms decimal-sum (exact, so the HOF's first-occurrence order and
  *    the hash-map order here cannot differ) and the total casts back
  *    to double.
  * Null in → null out; a zero-length split (unreachable for non-null
  * input, kept for parity with the `when(n === 0, ...)` guard) → 0.0.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.CharEntropy.compute($str);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  import org.apache.spark.sql.graft.ColumnBridge

  private val EmptyPattern = UTF8String.fromString("")

  /** One-pass entropy of `s` — static so generated code calls it
    * directly from inside the whole-stage loop. */
  def compute(s: UTF8String): Double = {
    val chars = s.split(EmptyPattern, -1)
    val n = chars.length
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[UTF8String, Integer](
      math.min(n * 2, 256))
    var i = 0
    while (i < n) {
      val c = chars(i)
      val prev = counts.get(c)
      counts.put(c, if (prev == null) 1 else prev.intValue() + 1)
      i += 1
    }
    var acc = java.math.BigDecimal.ZERO.setScale(15)
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next().intValue()
      val p = cnt.toDouble / n
      // StrictMath, not Math: Spark's Log expression evaluates
      // StrictMath.log, and the two can differ by 1 ulp — enough to
      // move a scale-15 HALF_UP rounding and break gate hashes
      val term = p * StrictMath.log(p) * -1.0
      val d = Decimal(term)
      d.changePrecision(27, 15)
      acc = acc.add(d.toJavaBigDecimal)
    }
    acc.doubleValue()
  }

  def apply(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))
}
