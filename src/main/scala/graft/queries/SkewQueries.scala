package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Gate coverage for skew-resilient aggregation and sketches. */
object SkewQueries {

  /** Salted exact distinct customers per order priority — must equal the
    * plain COUNT(DISTINCT) the oracle runs. */
  def q72SaltedDistinct(s: SparkSession, d: String): DataFrame =
    Skew.saltedCountDistinct(Tables.orders(s, d), "o_orderpriority", "o_custkey")
      .orderBy(col("o_orderpriority"))

  val q72Sql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_distinct
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Approximate sketches (HLL distinct, quantile sketch), pinned by the
    * ERROR-BOUND LAW rather than sketch internals: engines' sketches
    * differ bit-for-bit, but the published guarantees don't. Each group
    * emits the exact distinct count plus booleans asserting each sketch
    * landed inside its bound; the oracle computes the exact values and
    * asserts the booleans are TRUE — a sketch drifting out of bound
    * flips a cell and fails the hash, so the approx paths are hash-gated
    * without pinning internals.
    *
    * The quantile sketch is verified by its RANK guarantee, not against
    * an exact `percentile()` — that would buffer every group's values in
    * one aggregation state (the scale trap q74's docs warn about, and a
    * measured 10× slowdown at sf0.1): instead a second conditional-count
    * pass checks `|rank(approx_median) − n/2| ≤ n/1000 + 1`, which is the
    * published accuracy-10000 bound with slack, costs one
    * map-side-combinable aggregate, and needs no per-group value buffer
    * anywhere. */
  def q73ApproxSketches(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // deliberately LAZY (r17): an eager localCheckpoint of this 3-row
    // aggregate measured 4× SLOWER end-to-end — the single-job form lets
    // runtime exchange reuse share the distinct pipeline between the two
    // consumers while overlapping the ranked pass's stages
    val sk = li.groupBy(col("l_returnflag"))
      .agg(
        count_distinct(col("l_partkey")).as("exact_nd_part"),
        approx_count_distinct(col("l_partkey"), 0.02).as("__and"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("__amed"),
        count(lit(1)).as("n"))
    val ranked = li
      .join(broadcast(sk.select(col("l_returnflag"), col("__amed"))),
        Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("l_extendedprice") <= col("__amed"), 1L)
        .otherwise(0L)).as("__rk"))
    sk.join(ranked, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_nd_part"),
        (abs(col("__and") - col("exact_nd_part")) / col("exact_nd_part")
          <= 0.05).as("nd_within_bound"),
        (abs(col("__rk") - col("n") / 2.0) <= col("n") / 1000.0 + 1)
          .as("median_rank_ok"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }

  val q73Sql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_nd_part,
      |  true AS nd_within_bound,
      |  true AS median_rank_ok,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Skyline: Pareto-front of parts minimizing (p_size, p_retailprice).
    * Oracle = the naive NOT EXISTS dominance definition. */
  def q81Skyline(s: SparkSession, d: String): DataFrame =
    graft.ops.Skyline.skyline2Min(
        Tables.part(s, d).select(col("p_partkey"), col("p_size"),
          col("p_retailprice")),
        "p_size", "p_retailprice")
      .orderBy(col("p_size"), col("p_retailprice"), col("p_partkey"))

  val q81Sql: String =
    """SELECT p_partkey, p_size, p_retailprice FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_size <= a.p_size AND b.p_retailprice <= a.p_retailprice
      |    AND (b.p_size < a.p_size OR b.p_retailprice < a.p_retailprice))
      |ORDER BY p_size, p_retailprice, p_partkey""".stripMargin

  /** Heavy-key report over event types: the diagnostic that precedes
    * salting ([[Skew.skewReport]]). Synthetic skew injected by mapping
    * every third event to one hot type, so the report has something to
    * find; the oracle replays the share arithmetic. */
  def q116SkewReport(s: SparkSession, d: String): DataFrame =
    Skew.skewReport(
      Tables.events(s, d).select(
        when(col("event_id") % 3 === 0, lit("hot"))
          .otherwise(col("event_type")).as("etype")),
      "etype", k = 5)

  val q116Sql: String =
    """WITH keyed AS (
      |  SELECT CASE WHEN event_id % 3 = 0 THEN 'hot' ELSE event_type END AS etype
      |  FROM events),
      |counts AS (SELECT etype, count(*) AS n FROM keyed GROUP BY etype),
      |t AS (SELECT sum(n) AS total, count(*) AS nkeys FROM counts)
      |SELECT etype, n, round(CAST(n AS DOUBLE) / total, 6) AS share,
      |  round(1.0 / nkeys, 6) AS uniform_share
      |FROM counts CROSS JOIN t
      |ORDER BY n DESC, etype LIMIT 5""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_salted_distinct" -> (q72SaltedDistinct _),
    "q73_approx_sketches" -> (q73ApproxSketches _),
    "q116_skew_report" -> (q116SkewReport _),
    "q81_skyline" -> (q81Skyline _))

  val oracles: Map[String, String] = Map(
    "q72_salted_distinct" -> q72Sql,
    "q73_approx_sketches" -> q73Sql,
    "q116_skew_report" -> q116Sql,
    "q81_skyline" -> q81Sql)
}
