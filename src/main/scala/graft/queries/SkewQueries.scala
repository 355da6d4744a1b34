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

  /** Approximate sketches (HLL distinct, quantile sketch). Engines'
    * sketches differ, so no SQL oracle — the driver records rows-only and
    * OpsSpec bounds the error against exact values. */
  def q73ApproxSketches(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_nd_part"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_median_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_salted_distinct" -> (q72SaltedDistinct _),
    "q73_approx_sketches" -> (q73ApproxSketches _))

  val oracles: Map[String, String] = Map(
    "q72_salted_distinct" -> q72Sql)
}
