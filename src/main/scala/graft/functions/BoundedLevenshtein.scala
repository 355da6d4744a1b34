package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.TypeBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (Ukkonen) Levenshtein distance with an early exit at `bound`:
  * returns the exact distance when it is ≤ bound, else bound+1. The
  * fuzzy-matching verify step only ever asks "is the distance ≤ k?", and
  * for small k the banded DP is O(k·min(|a|,|b|)) instead of the full
  * O(|a|·|b|) matrix Spark's built-in `levenshtein` always fills — on a
  * 100 TB entity-resolution pass where most candidate pairs are misses
  * (rejected by the length gap or an early row minimum), this is the
  * difference between a verify step that scans bytes and one that does
  * quadratic work per pair.
  *
  * Exactness contract: `BoundedLevenshtein(a, b, k) <= k` ⇔
  * `levenshtein(a, b) <= k`, and the value is exact whenever it is ≤ k —
  * so a kept pair's reported distance equals the unbounded one and the
  * DuckDB oracle can replay it with plain `levenshtein`. Distances are
  * over UTF-16 code units (= characters for ASCII/BMP text, the record-
  * linkage domain).
  *
  * Tier-(b) custom operator: a Catalyst `Expression` whose codegen emits
  * a static call inside whole-stage codegen — no UDF boundary, null-safe
  * by construction.
  */
case class BoundedLevenshtein(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bounded_lev"

  // implicit casts give built-in ergonomics: bare NULL coerces to STRING,
  // byte/short bounds widen to INT; incompatible types still fail analysis
  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(StringType, StringType, IntegerType)

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    BoundedLevenshtein.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = graft.functions.BoundedLevenshtein.compute($a, $b, $k);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BoundedLevenshtein =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BoundedLevenshtein {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-API entry: `BoundedLevenshtein(col("a"), col("b"), lit(2))`. */
  def apply(a: Column, b: Column, k: Column): Column =
    ColumnBridge.column(BoundedLevenshtein(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(k)))

  /** Banded DP, two rows, early exit when a full row exceeds `bound`.
    * Values saturate at bound+1 so arithmetic can't overflow and every
    * cell > bound is interchangeable. Called from generated code. */
  def compute(au: UTF8String, bu: UTF8String, bound: Int): Int = {
    val a = au.toString
    val b = bu.toString
    val la = a.length
    val lb = b.length
    // clamp to max(|a|,|b|) — the distance can't exceed it, so the
    // result is unchanged, and inf = k + 1 can't overflow for
    // pathological bounds like graft_bounded_lev(a, b, 2147483647)
    val k = math.min(math.max(bound, 0), math.max(la, lb))
    val inf = k + 1
    if (math.abs(la - lb) > k) return inf
    if (la == 0) return lb // ≤ k by the gap check
    if (lb == 0) return la
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= la) {
      val from = math.max(1, i - k)
      val to = math.min(lb, i + k)
      cur(from - 1) = if (from == 1) math.min(i, inf) else inf
      if (to < lb) cur(to + 1) = inf
      var best = inf
      j = from
      while (j <= to) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var d = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < d) d = del
        val ins = cur(j - 1) + 1
        if (ins < d) d = ins
        if (d > inf) d = inf
        cur(j) = d
        if (d < best) best = d
        j += 1
      }
      if (best >= inf) return inf // no cell in the band can recover
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(lb), inf)
  }
}
