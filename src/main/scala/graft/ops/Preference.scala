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
    // The GraphOps iteration discipline (measured r17: without it this
    // loop's lineage TRIPLED per round — `s` is referenced three times
    // per iteration — and q166's physical plan held 244 input scans):
    // materialize the comparison frame once, the loop-invariant wins and
    // edge frames once each, and cut `s`'s lineage every round.
    val cmp = comparisons.localCheckpoint()
    val items = cmp.select(col(winCol).as("item"))
      .unionByName(cmp.select(col(loseCol).as("item"))).distinct()
    val wins = items
      .join(cmp.groupBy(col(winCol).as("item"))
        .agg(count(lit(1)).as("wins")), Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"))
      .localCheckpoint()
    val games = cmp.select(
        least(col(winCol), col(loseCol)).as("a"),
        greatest(col(winCol), col(loseCol)).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val edges = games.select(col("a").as("i"), col("b").as("j"), col("n"))
      .unionByName(games.select(col("b").as("i"), col("a").as("j"), col("n")))
      .localCheckpoint()
    // init rides the checkpointed wins frame (same item set — wins holds
    // exactly one row per item), so no separate items evaluation
    var s = wins.select(col("item"), lit(1.0).as("s"))
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
        .localCheckpoint()
    }
    wins.join(s, Seq("item"))
      .select(col("item"), col("wins"), round(col("s"), 6).as("strength"))
  }

  /** Per-item win rate with a Wilson score interval — the confidence
    * bound an RLHF/eval dashboard reports next to the raw rate, so an
    * item with 2/2 wins is not ranked above one with 90/100. The
    * interval is
    *
    *   (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
    *
    * (Wilson 1927), the standard small-n-safe binomial interval:
    * never escapes [0,1] and stays informative at n=1 where the Wald
    * interval collapses.
    *
    * Determinism: wins/games are exact integer counts and the interval
    * is per-row arithmetic on them — no ordered float reduction exists,
    * so the result is bit-stable on any engine by construction.
    *
    * Scale: one union + one item-keyed count aggregation (map-side
    * combined); the interval math is a codegen'd projection. One
    * shuffle total, keyed by item.
    *
    * @param comparisons one row per game, `winCol` beat `loseCol`
    * @return (item, games, wins, win_rate, ci_lo, ci_hi) — 6-dp rounded */
  def winRateWilson(comparisons: DataFrame, winCol: String, loseCol: String,
      z: Double = 1.96): DataFrame = {
    require(z > 0, s"winRateWilson: z > 0, got $z")
    val games = comparisons
      .select(col(winCol).as("item"), lit(1L).as("__w"))
      .unionByName(comparisons.select(col(loseCol).as("item"), lit(0L).as("__w")))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("games"), sum(col("__w")).as("wins"))
    val n = col("games").cast("double")
    val p = col("wins").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = p + z2 / (lit(2.0) * n)
    val margin = lit(z) * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))
    games.select(col("item"), col("games"), col("wins"),
      round(p, 6).as("win_rate"),
      round((center - margin) / denom, 6).as("ci_lo"),
      round((center + margin) / denom, 6).as("ci_hi"))
  }
}
