package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ZOrder

/** Gate coverage for the table-maintenance family. The z-value is pure
  * integer arithmetic, so the oracle replays the interleave bit-for-bit
  * as `sum_b ((x div 2^b) mod 2) * 2^(2b)` terms; the file-layout side of
  * maintenance (compaction, clustered writes) is covered by
  * MaintenanceSpec — file counts aren't SQL-expressible. */
object MaintenanceQueries {

  /** Morton z-values of (customer, order-day) for a sample of orders —
    * the clustering key a 2-D-pruned orders table sorts by. */
  def q55ZOrder(s: SparkSession, d: String): DataFrame = {
    // o_orderdate is parquet TIMESTAMP_NTZ; NTZ→LONG needs the TIMESTAMP
    // hop, which under the UTC session tz is exactly DuckDB's epoch()
    val days = expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536L)).as("zx"),
        pmod(days, lit(65536L)).as("zy"))
      .withColumn("z", ZOrder.zValue(col("zx"), col("zy"), 16))
      .orderBy(col("o_orderkey"))
  }

  val q55Sql: String = {
    val terms = (0 until 16).flatMap { b =>
      Seq(s"((zx // ${1L << b}) % 2) * ${1L << (2 * b)}",
        s"((zy // ${1L << b}) % 2) * ${1L << (2 * b + 1)}")
    }.mkString(" + ")
    s"""SELECT o_orderkey, zx, zy, CAST($terms AS BIGINT) AS z
      |FROM (SELECT o_orderkey,
      |        o_custkey % 65536 AS zx,
      |        CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 65536 AS zy
      |      FROM orders WHERE o_orderkey % 97 = 0)
      |ORDER BY o_orderkey""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_zorder" -> (q55ZOrder _))

  val oracles: Map[String, String] = Map(
    "q55_zorder" -> q55Sql)
}
