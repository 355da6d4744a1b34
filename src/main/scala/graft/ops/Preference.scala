package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-data operators for reward-model / RLHF pipelines: pairwise
  * human (or judge) comparisons distilled into per-item strengths.
  */
object Preference {

  /** Bradley–Terry strength estimation via the classic MM update
    * (Hunter 2004), `iters` fixed rounds:
    *
    *   s_i ← (W_i + ½) / (Σ_j n_ij/(s_i + s_j) + 1/(s_i + 1))
    *
    * where W_i = wins of item i and n_ij = games between i and j. The
    * ½-win / unit-strength virtual opponent is the standard
    * regularization that keeps winless items finite and the update
    * well-defined on any comparison graph (without it, two adjacent
    * all-losing items divide by zero).
    *
    * Determinism: each round's denominator terms are rounded to 12 dp and
    * summed as decimal(27,15) (the q96 PageRank device), so the
    * iteration replays bit-for-bit on any engine regardless of
    * aggregation order.
    *
    * Scale: the state is one row per ITEM (model-sized); each round is
    * two item-keyed joins of the edge list plus one map-side-combinable
    * aggregation — PageRank's exact shuffle shape, keyed by item. No
    * driver-side state at all; `iters` bounds the plan depth, not the
    * data.
    *
    * @param comparisons one row per game, `winCol` beat `loseCol`
    * @return (item, wins, strength) — strength after `iters` rounds,
    *         rounded to 6 dp */
  def bradleyTerry(comparisons: DataFrame, winCol: String, loseCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"bradleyTerry: iters >= 1, got $iters")
    val items = comparisons.select(col(winCol).as("item"))
      .unionByName(comparisons.select(col(loseCol).as("item"))).distinct()
    val wins = items
      .join(comparisons.groupBy(col(winCol).as("item"))
        .agg(count(lit(1)).as("wins")), Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"))
    val games = comparisons.select(
        least(col(winCol), col(loseCol)).as("a"),
        greatest(col(winCol), col(loseCol)).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val edges = games.select(col("a").as("i"), col("b").as("j"), col("n"))
      .unionByName(games.select(col("b").as("i"), col("a").as("j"), col("n")))
    var s = items.select(col("item"), lit(1.0).as("s"))
    for (_ <- 1 to iters) {
      val den = edges
        .join(s.select(col("item").as("i"), col("s").as("__si")), Seq("i"))
        .join(s.select(col("item").as("j"), col("s").as("__sj")), Seq("j"))
        .groupBy(col("i").as("item"))
        .agg(sum(round(col("n") / (col("__si") + col("__sj")), 12)
          .cast("decimal(27,15)")).as("__den"))
      s = wins.join(s, Seq("item")).join(den, Seq("item"), "left")
        .select(col("item"),
          ((col("wins") + 0.5) /
            (coalesce(col("__den").cast("double"), lit(0.0)) +
              round(lit(1.0) / (col("s") + 1.0), 12))).as("s"))
    }
    wins.join(s, Seq("item"))
      .select(col("item"), col("wins"), round(col("s"), 6).as("strength"))
  }
}
