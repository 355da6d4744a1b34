package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: backward as-of join and
  * binned range join. Both follow the custom-operator preference order's
  * first tier — composition of existing operators (SURVEY.md §7.3) — because
  * the semantics ARE expressible, with plans that scale:
  *
  *  - as-of: union + keyed window = ONE shuffle on the join key and a
  *    per-key sort — the same cost as a sort-merge join, with none of the
  *    per-row subquery work a naive `max(t') WHERE t' <= t` correlated
  *    formulation would do.
  *  - range: explode intervals into fixed-width time bins and equi-join on
  *    (key, bin) — candidate pairs are bounded per bin instead of the
  *    per-key cross product a raw BETWEEN theta join degenerates to when a
  *    key has many rows on both sides.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the latest right row with
    * `rightTime <= leftTime` on the same key (left-join semantics — misses
    * yield nulls).
    *
    * Implementation: tag and union both sides, then per key in
    * (time, side) order carry the last-seen right values forward
    * (`last(..., ignoreNulls)` over an unbounded-preceding window). Right
    * rows sort before left rows at equal times, giving inclusive `<=`.
    *
    * @param rightCols right columns to carry (renamed as given)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTimeCol: String, rightTimeCol: String,
      rightCols: Map[String, String]): DataFrame = {
    // carry the matched right ROW atomically (one struct), not column by
    // column: per-column last(ignoreNulls) would skip a legitimately-null
    // field of the latest row and stitch values from different rows
    val leftTagged = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null))
    val rightTagged = right.select(
      col(keyCol), col(rightTimeCol).as("__t"), lit(0).as("__side"),
      struct(rightCols.map { case (in, out) => col(in).as(out) }.toSeq: _*).as("__r"))

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    rightCols.values.foldLeft(filled.filter(col("__side") === 1)) {
      (df, out) => df.withColumn(out, col(s"__r.$out"))
    }.drop("__t", "__side", "__r")
  }

  /** Binned range join: `points` rows matched into `intervals` rows sharing
    * `keyCol` with `ts ∈ [startCol, endCol]` (inclusive). Each interval is
    * exploded to the fixed-width bins it covers; points live in exactly one
    * bin, so the equi-join on (key, bin) finds every candidate exactly once
    * and the exact BETWEEN predicate then filters. `binWidthSec` trades
    * explode factor against bin population — pick ≳ the typical interval
    * length. */
  def rangeJoinBinned(
      intervals: DataFrame, points: DataFrame,
      keyCol: String, startCol: String, endCol: String, tsCol: String,
      binWidthSec: Long): DataFrame = {
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(
        (col(startCol).cast("long") / binWidthSec).cast("long"),
        (col(endCol).cast("long") / binWidthSec).cast("long"))))
    val binnedPoints = points.withColumn("__bin",
      (col(tsCol).cast("long") / binWidthSec).cast("long"))
    binnedIntervals.join(binnedPoints,
        Seq(keyCol, "__bin"))
      .filter(col(tsCol).cast("long").between(
        col(startCol).cast("long"), col(endCol).cast("long")))
      .drop("__bin")
  }
}
