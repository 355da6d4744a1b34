package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared derived-bucket idiom for the two-phase distributed scans
  * (skyline sweep, exclusive prefix sum, z-order quantization).
  *
  * Boundaries are approx percentiles computed ONCE and collected to the
  * driver — n-1 doubles, the same sized result `repartitionByRange`'s own
  * sampling job collects — then baked into every consumer plan as
  * literals. That makes bucket ids deterministic BY CONSTRUCTION: they
  * can't drift between fan-out subtrees however the plan is recomputed,
  * with or without exchange reuse (percentile_approx itself merges partial
  * sketches in shuffle-fetch order, so evaluating it separately per
  * consumer could yield different boundary arrays near bucket edges). */
object Buckets {

  /** Ascending boundaries splitting `valCol` into ~n equal-count buckets.
    * One tiny aggregate job; empty input → no boundaries (one bucket). */
  def boundaries(df: DataFrame, valCol: String, n: Int,
      accuracy: Int = 10000): Seq[Double] = {
    val fracs = (1 until n).map(i => lit(i.toDouble / n))
    val row = df.agg(percentile_approx(
      col(valCol).cast("double"), array(fracs: _*), lit(accuracy)).as("__b")).head()
    if (row.isNullAt(0)) Seq.empty else row.getSeq[Double](0)
  }

  /** Bucket id of a value = how many boundaries it exceeds: monotone in
    * the value, ties share a bucket. Literal when-terms summed with a
    * BALANCED reduction — expression depth is O(log n), so Catalyst's
    * recursive transforms never stack-overflow on large boundary sets
    * (a left fold would nest n Adds). Pure codegen'd scalar work, no
    * broadcast join, no higher-order functions. */
  def bucketId(value: Column, bounds: Seq[Double]): Column = {
    require(bounds.length <= 4095,
      s"bucketId supports at most 4095 boundaries, got ${bounds.length}")
    if (bounds.isEmpty) lit(0)
    else balancedSum(bounds.map(b =>
      when(value.cast("double") > lit(b), 1).otherwise(0)))
  }

  private def balancedSum(terms: Seq[Column]): Column =
    if (terms.size == 1) terms.head
    else balancedSum(terms.grouped(2).map(_.reduce(_ + _)).toSeq)
}
